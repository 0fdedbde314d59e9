package graft.operators

import graft.functions.BloomContainsLong
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Runtime-filter (Bloom semi-join) pre-filtering — the classic
  * scale move for a selective dimension joined to a huge fact table
  * (reference joins its filtered layer frames to the big feature
  * scans, e.g. pipeline.py's clip-then-join flow): build a Bloom
  * filter over the BUILD side's join keys and drop probe rows that
  * cannot match BEFORE the join's exchange.
  *
  * Why not rely on Spark alone: AQE can inject a bloom runtime
  * filter for shuffle joins, but only under its own heuristics
  * (thresholds on build size / selectivity), and never into an
  * already-broadcast join's probe-side SCAN when the probe survives
  * other stages first. This operator makes the contract explicit
  * and deterministic: at 100 TB a 1% selective dimension cuts the
  * fact table's post-scan row stream ~100× before any exchange, for
  * ~1.2 bytes/key of filter state.
  *
  * Exactness: Bloom `false` is certain, so no true match is lost;
  * false positives (≤ fpp) are eliminated by the exact equi-join
  * that follows — the result is IDENTICAL to the plain join, which
  * is precisely what the DuckDB oracle checks.
  */
object RuntimeFilter {

  /** `big ⋈ small` on `bigKey = smallKey` (inner), with the big side
    * pre-filtered through a Bloom filter built from `small`'s keys.
    * Keys must be LONG (the codegen'd [[BloomContainsLong]] probe).
    *
    * The build is a distributed mergeable aggregation over the
    * (dimension-sized) build side; the sizing `count` and the filter
    * bytes are aggregate-sized driver state, same budget class as a
    * broadcast dim table.
    */
  def bloomJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      fpp: Double = 0.01
  ): DataFrame = {
    val keys = small.select(col(smallKey)).na.drop().distinct()
    val nKeys = keys.count()
    if (nKeys == 0L)
      // stat.bloomFilter NPEs on an empty build; an empty build side
      // joins to nothing, schema preserved.
      return big.join(small, big(bigKey) === small(smallKey)).limit(0)
    val bloom = keys.stat.bloomFilter(smallKey, nKeys, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    big
      .filter(BloomContainsLong(col(bigKey), bytes))
      .join(small, big(bigKey) === small(smallKey))
  }

  /** The probe column alone, for callers composing their own plan. */
  def bloomProbe(key: Column, small: DataFrame, smallKey: String, fpp: Double = 0.01): Option[Column] = {
    val keys = small.select(col(smallKey)).na.drop().distinct()
    val nKeys = keys.count()
    if (nKeys == 0L) None
    else {
      val bloom = keys.stat.bloomFilter(smallKey, nKeys, fpp)
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      Some(BloomContainsLong(key, bos.toByteArray))
    }
  }
}
