package graft.operators

import graft.functions.CmsCountLong
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact heavy-hitter detection with a Count-Min-Sketch candidate
  * pass — find every key whose frequency is ≥ φ·N without a full
  * groupBy over the key universe.
  *
  * Plan shape (the two-pass scheme from the CMS literature):
  *   1. build a CMS over the key column — one mergeable aggregate,
  *      counters sized by (eps, confidence), independent of key
  *      cardinality;
  *   2. re-scan, keep only rows whose CMS estimate clears the
  *      threshold (map-side codegen probe — no exchange), and run
  *      the EXACT groupBy on the survivors.
  *
  * CMS never undercounts, so every true heavy key survives pass 2's
  * prefilter; the exact count then discards overcounted impostors —
  * the output is exactly `GROUP BY key HAVING count ≥ T`, which is
  * what the DuckDB oracle checks. At 100 TB with a billion-key
  * universe the exact groupBy only ever sees rows of ~1/φ candidate
  * keys (plus an eps·N-bounded fringe) instead of shuffling every
  * key group; eps should be chosen ≪ φ so the fringe stays thin.
  */
object HeavyHitters {

  /** Keys of `df.select(key)` with exact count ≥ ceil(phi · N).
    * Output: (key, n, frac) with frac rounded to 4 dp.
    */
  def exact(
      df: DataFrame,
      key: Column,
      phi: Double,
      eps: Double = 5e-4,
      confidence: Double = 0.99
  ): DataFrame = {
    val keyed = df.select(key.as("key"))
    val total = keyed.count()
    val threshold = math.ceil(phi * total).toLong
    val cms = keyed.stat.countMinSketch(col("key"), eps, confidence, 42)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      cms.writeTo(bos)
      bos.toByteArray
    }
    keyed
      .filter(CmsCountLong(col("key"), bytes) >= threshold)
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
      .withColumn("frac", round(col("n").cast("double") / total.toDouble, 4))
  }
}
