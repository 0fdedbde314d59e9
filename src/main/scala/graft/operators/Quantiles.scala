package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles without the value-count map.
  *
  * Spark's `percentile` aggregate materializes an in-memory
  * OpenHashMap of (value → count) per group: on a continuous double
  * column that is O(distinct values) executor heap — the classic OOM
  * at 100 TB. This helper computes the SAME type-7 / SQL interpolated
  * percentile through a per-group window sort instead: Tungsten
  * radix/Tim sort with disk spill, so memory stays bounded no matter
  * the cardinality. The trade-off is one sort shuffle on the group
  * key (a low-group-count sort is still a big per-task sort — for
  * rank-error-tolerant consumers prefer `approx_percentile`, see
  * q_quantile_approx / q_outlier_mad_approx).
  *
  * Semantics: for p ∈ [0,1] over n non-null values sorted ascending,
  * r = (n−1)·p, result = v[⌊r⌋]·(1−frac) + v[⌊r⌋+1]·frac with
  * frac = r − ⌊r⌋ — identical to Spark `percentile` and DuckDB
  * `quantile_cont` (both compute r in double, and the result is
  * continuous in r, so FP wobble stays ~1 ulp).
  */
object Quantiles {

  /** One row per group; one column per (name, p) pair. */
  def exactInterpolated(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      ps: Seq[(String, Double)]
  ): DataFrame = {
    require(ps.nonEmpty, "Quantiles.exactInterpolated: ps must be non-empty")
    ps.foreach { case (name, p) =>
      require(p >= 0.0 && p <= 1.0,
        s"Quantiles.exactInterpolated: p for '$name' must be in [0,1], got $p")
    }
    val wSort = Window.partitionBy(col(groupCol)).orderBy(col("_v"))
    val wAll = Window.partitionBy(col(groupCol))
    val ranked = df
      .select(col(groupCol), col(valueCol).cast("double").as("_v"))
      .where(col("_v").isNotNull)
      .withColumn("_rn", row_number().over(wSort).cast("double"))
      .withColumn("_n", count(lit(1)).over(wAll).cast("double"))
    val aggs: Seq[Column] = ps.map { case (name, p) =>
      val r = (col("_n") - 1) * lit(p)
      val lo = floor(r)
      val frac = r - lo
      // Each group row contributes to the sum only at the two ranks
      // bracketing r; everything else is null and drops out.
      val contrib = when(col("_rn") - 1 === lo, col("_v") * (lit(1.0) - frac))
        .when(col("_rn") - 1 === lo + 1, col("_v") * frac)
      sum(contrib).as(name)
    }
    ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }
}
