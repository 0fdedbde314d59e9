package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training-data
  * pipelines. Everything keys off arithmetic over a stable id — no
  * RNG state, so assignments are reproducible across runs, engines,
  * and cluster sizes, and a re-run of an incremental pipeline puts
  * every row in the same split it was in yesterday.
  */
object Sampling {

  /** Pseudo-random but deterministic bucket in [0, buckets) from a
    * stable id: splitmix64-style mix, closed-form (reproducible in
    * any engine with 64-bit integer arithmetic).
    */
  def idBucket(id: Column, buckets: Int): Column =
    pmod(
      // Multiplicative mix keeps neighboring ids uncorrelated; plain
      // `id % buckets` would stripe sequential ids. The id is reduced
      // mod P FIRST so the product stays below 2^63 (raw id·constant
      // overflows Long for ids ≳3.5e9 — an ANSI-mode crash and an
      // engine-divergence hazard otherwise).
      (pmod(id, lit(1000000007L)) * lit(2654435761L) + lit(1013904223L)) % lit(1000000007L),
      lit(buckets))

  /** Train/val/test assignment by id bucket percentage:
    * [0, trainPct) → train, [trainPct, trainPct+valPct) → val,
    * rest → test.
    */
  def splitAssign(id: Column, trainPct: Int, valPct: Int): Column = {
    val b = idBucket(id, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Deterministic stratified sample: keep ceil(fraction · n) rows
    * per stratum, chosen by bucket-then-id rank (stable under
    * re-partitioning). One shuffle on the stratum key.
    */
  def stratifiedSample(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      fraction: Double
  ): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(idBucket(col(idCol), 1000000), col(idCol))
    val n = Window.partitionBy(col(stratumCol))
    df.withColumn("_rk", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(n))
      .filter(col("_rk") <= ceil(col("_n") * fraction))
      .drop("_rk", "_n")
  }
}
