package graft

import graft.queries.Registry
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) + §5
  * (correctness protocol). Query implementations live under
  * `graft.queries` / `graft.operators`; this object only aggregates
  * the registry.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The corpus-cleaning pipeline composes quality scoring,
    * language ID, and dedup in one plan (SURVEY §2 M1).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("pipe_clean_corpus")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.fn).toMap

  /** DuckDB-runnable oracle SQL per query (same column names). */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
