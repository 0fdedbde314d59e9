package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Total-order ranking without a global window.
  *
  * `ntile(k) OVER (ORDER BY …)` — the reference's decile assignment
  * (reference: cli.py sector scoring buckets) — puts EVERY row
  * through one WindowExec task: the plan that dies first at 100 TB.
  * This operator keeps the semantics exact and the sort parallel:
  *
  *   1. `orderBy` — Spark range-partitions the sort (sampled
  *      boundaries, each task sorts its slice);
  *   2. `zipWithIndex` — one lightweight count-per-partition job,
  *      then a map that adds each slice's offset: global positions
  *      with no row funnel (driver state = numPartitions longs);
  *   3. the SQL-standard ntile closed form over (position, n):
  *      first `n mod k` buckets get `ceil(n/k)` rows, the rest
  *      `floor(n/k)`.
  *
  * The extra `count()` is a column-pruned scan (Catalyst's
  * EliminateSorts drops the orderBy under it; parquet answers from
  * footer metadata). RDD zip is off the codegen path, but Spark has
  * no codegen for a global rank anyway — the win is removing the
  * single-task sort, not the map.
  */
object GlobalRank {

  /** Exact global POSITIONS 1..n over the total order `sortCols`,
    * appended as LongType column `out` — the same range-partitioned
    * sort + per-partition-offset zip as [[ntileExact]] without the
    * bucket arithmetic (used by D120 Spearman, whose rank vector IS
    * the statistic). Pass a unique tiebreaker in `sortCols` for
    * deterministic output.
    */
  def rankExact(df: DataFrame, sortCols: Seq[Column], out: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(sortCols: _*).rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = sorted
      .mapPartitionsWithIndex { (pi, it) =>
        var c = 0L; while (it.hasNext) { it.next(); c += 1 }
        Iterator((pi, c))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val zipped = sorted.mapPartitionsWithIndex { (pi, it) =>
      var i = offsets(pi)
      it.map { row => i += 1; Row.fromSeq(row.toSeq :+ i) }
    }
    spark.createDataFrame(zipped, df.schema.add(out, LongType, nullable = false))
  }

  /** Exact `ntile(k)` over the total order `sortCols`, appended as
    * LongType column `out`. Ties are broken by `sortCols` itself —
    * pass a unique tiebreaker column for deterministic output.
    */
  def ntileExact(df: DataFrame, sortCols: Seq[Column], k: Int, out: String): DataFrame = {
    require(k >= 1, s"ntile bucket count must be >= 1, got $k")
    val spark = df.sparkSession
    // Sort once, cache the sorted partitions, and derive BOTH `n`
    // and the per-partition offsets from that single evaluation: a
    // separate `df.count()` would re-read the source, and a source
    // that changed (or a non-deterministic input) between the two
    // jobs would desync `n` from the zipped rows — buckets past k or
    // wrong widths. Driver state stays numPartitions longs.
    val sorted = df.orderBy(sortCols: _*).rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = sorted
      .mapPartitionsWithIndex { (pi, it) =>
        var c = 0L; while (it.hasNext) { it.next(); c += 1 }
        Iterator((pi, c))
      }
      .collect().sortBy(_._1).map(_._2)
    val n = counts.sum
    val offsets = counts.scanLeft(0L)(_ + _)
    val q = n / k
    val r = n % k
    val cut = r * (q + 1) // positions below `cut` fall in the wide buckets
    val zipped = sorted.mapPartitionsWithIndex { (pi, it) =>
      var i = offsets(pi)
      it.map { row =>
        val bucket =
          if (i < cut) i / (q + 1) + 1
          else (i - cut) / math.max(q, 1L) + r + 1
        i += 1
        Row.fromSeq(row.toSeq :+ bucket)
      }
    }
    spark.createDataFrame(zipped, df.schema.add(out, LongType, nullable = false))
  }
}
