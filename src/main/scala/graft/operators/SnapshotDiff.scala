package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC-style snapshot diff — the incremental-update primitive behind
  * the reference's upsert publishing (publish.py truncate/append vs
  * upsert modes): given the PREVIOUS and CURRENT snapshot of a keyed
  * table, classify every key as added / removed / changed, skipping
  * the (overwhelmingly common) unchanged rows.
  *
  * Scale shape: each side is reduced to (key, content-hash) in a
  * map-only pass — the full-outer join then shuffles 24-byte rows on
  * the key instead of whole records, and the downstream writer only
  * touches the delta. This is the 100 TB path for refreshing a
  * published layer without rewriting it.
  */
object SnapshotDiff {

  /** Diff `cur` against `prev` on `keyCol`; rows are compared by
    * md5 over `contentCols` (joined with a \\u0001 separator so
    * column boundaries can't alias). Returns (keyCol, change) with
    * change ∈ {added, removed, changed}; unchanged keys are dropped.
    */
  def diff(
      prev: DataFrame,
      cur: DataFrame,
      keyCol: String,
      contentCols: Seq[String]
  ): DataFrame = {
    require(contentCols.nonEmpty, "SnapshotDiff.diff: contentCols must be non-empty")
    def hashed(d: DataFrame, hName: String) = d.select(
      col(keyCol).as("key"),
      md5(concat_ws("\u0001", contentCols.map(col): _*)).as(hName))
    hashed(prev, "h_prev")
      .join(hashed(cur, "h_cur"), Seq("key"), "full_outer")
      .withColumn("change",
        when(col("h_prev").isNull, "added")
          .when(col("h_cur").isNull, "removed")
          .when(col("h_prev") =!= col("h_cur"), "changed"))
      .filter(col("change").isNotNull)
      .select(col("key").as(keyCol), col("change"))
  }
}
