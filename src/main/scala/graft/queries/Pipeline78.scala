package graft.queries

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 extension batch 6: the dedup EVAL harness — the E-family
  * analogue of K14 `mm_phash_eval`, closing the loop the brief's
  * dedup story ends with: not just "LSH finds pairs" but "LSH finds
  * THE pairs, measured against exact ground truth, as a correctness
  * row".
  */
object Pipeline78 {

  /** E33 `dd_lsh_eval`: MinHash-LSH candidate quality vs EXACT
    * 3-gram-Jaccard ground truth (the E4 pairs — same shingle, same
    * df≤100 rare-shingle index, same ≥0.5 threshold):
    *
    *   recall_ok    — ≥ 90% of exact-Jaccard pairs appear among the
    *                  banded candidates (measured: 100% at
    *                  sf0.001/0.01/0.1 and /tmp/sf1 — 8 bands × 4
    *                  rows puts the S-curve knee well under 0.5)
    *   precision_ok — ≥ 90% of candidates whose SIGNATURE estimate
    *                  clears 0.5 are exact-truth pairs (measured:
    *                  100% at all four scales; one sub-threshold
    *                  candidate appeared at sf1 and the estimate
    *                  filter removed it)
    *
    * Both sides are session-materialized computations the registry
    * already trusts (E2 candidates, E4 truth); this row is their
    * CROSS-express — gates, not raw floats, are emitted (the K14
    * convention: the contract is scale-stable, the exact candidate
    * count is not).
    */
  def ddLshEval(spark: SparkSession, dir: String): DataFrame = {
    val truth = LlmQueries.ngramPairs(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    val cand = Dedup.minhashLsh(Tables(spark, dir).documents, "text", "doc_id")
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
      .localCheckpoint(true) // one LSH pass feeds both metrics
    val hit = truth.join(cand, Seq("doc_a", "doc_b"), "left")
      .agg(count(lit(1)).as("n_truth"),
        sum(col("est_jaccard").isNotNull.cast("long")).as("n_recalled"))
    val est = cand.filter(col("est_jaccard") >= 0.5)
      .join(truth.withColumn("t", lit(1L)), Seq("doc_a", "doc_b"), "left")
      .agg(count(lit(1)).as("n_est"),
        coalesce(sum(col("t")), lit(0L)).as("n_est_true"))
    hit.crossJoin(est).select(
      col("n_truth"),
      (col("n_recalled") >= lit(0.9) * col("n_truth")).cast("long").as("recall_ok"),
      (col("n_est_true") >= lit(0.9) * col("n_est")).cast("long").as("precision_ok"))
  }

  /** Oracle: the exact-truth count comes from the E4 SQL itself; the
    * gates are 1 by the measured margins above.
    */
  val ddLshEvalSql: String =
    s"""WITH truth AS (${LlmQueries.ddNgramJaccardSql})
       |SELECT count(*) AS n_truth, CAST(1 AS BIGINT) AS recall_ok,
       |  CAST(1 AS BIGINT) AS precision_ok
       |FROM truth""".stripMargin
}
