package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data profiling — the per-column quality report (row count, null
  * count, exact distinct count) every ingest pipeline runs before
  * trusting a new release (the reference validates fetched layers
  * before publish; source.py's completeness checks are the same
  * idea per-column).
  *
  * Scale shape: ONE aggregation pass, not one scan per column and
  * not an unpivot (which would shuffle #cols×N melted rows). The
  * multiple COUNT(DISTINCT)s compile to a single Expand + partial
  * hash aggregate: each partition reduces to its local distinct
  * values before anything crosses the wire, so shuffle width is the
  * sum of column cardinalities, independent of N. The final melt to
  * one-row-per-column happens on the single aggregate row.
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] = cols.flatMap(c => Seq(
      sum(col(c).isNull.cast("long")).as(s"__${c}_nulls"),
      countDistinct(col(c)).as(s"__${c}_distinct")))
    val row = df.agg(count(lit(1)).as("__n_rows"), aggs: _*)
    row.select(explode(array(cols.map(c =>
      struct(
        lit(c).as("column"),
        col("__n_rows").as("n_rows"),
        coalesce(col(s"__${c}_nulls"), lit(0L)).as("n_nulls"),
        col(s"__${c}_distinct").as("n_distinct"))): _*)).as("p"))
      .select(col("p.column"), col("p.n_rows"), col("p.n_nulls"), col("p.n_distinct"))
  }

  /** Mergeable distinct-count partials via DataSketches HLL — the
    * incremental twin of the exact profile: each slice of the lake
    * keeps one binary sketch per group, and a refresh UNIONS the
    * stored sketches with the delta's instead of rescanning history
    * (the same maintenance shape as the MV merge, but for DISTINCT,
    * which plain partials can't merge). HLL register-max is
    * associative and commutative, so the merged estimate is
    * EXACTLY the estimate of sketching everything at once —
    * asserted, not approximated, in the spec.
    */
  def distinctSketch(df: DataFrame, keyCol: String, valueCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(hll_sketch_agg(col(valueCol)).as("sketch"))

  /** Union per-slice sketches into the refreshed estimate. The key
    * column is explicit — inferring it positionally would silently
    * group by the sketch blob for a slice selected in a different
    * column order.
    */
  def mergeSketches(keyCol: String, slices: DataFrame*): DataFrame = {
    require(slices.nonEmpty, "mergeSketches needs at least one slice")
    slices.reduce(_ unionByName _)
      .groupBy(col(keyCol))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("approx_distinct"))
  }
}
