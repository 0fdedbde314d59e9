package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the most recent right row
  * (per key) at or before the left row's time.
  *
  * Implementation is the scale-friendly union+window formulation —
  * tag both sides, sort within key by (time, side) once, and carry
  * the last seen right payload forward with
  * `last(_, ignoreNulls)` — ONE shuffle on the key, no per-key
  * loops, no range self-join blowup. This is the composition
  * Spark's built-ins afford (preference (a) from the design notes);
  * a dedicated SparkPlan would only change constants.
  */
object AsOfJoin {

  /** @param left        probe side (one output row per left row)
    * @param right       reference side
    * @param leftKey     join key column on `left`
    * @param rightKey    join key column on `right`
    * @param leftTime    event-time column on `left`
    * @param rightTime   event-time column on `right`
    * @param payloadCols columns of `right` carried onto matches
    *                    (null when no right row precedes the left row)
    */
  def lastBefore(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String]
  ): DataFrame = {
    val l = left
      .withColumn("_k", col(leftKey))
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1)) // left sorts after a tied right row
    // Carry the payload as ONE struct (non-null on every right row)
    // so a legitimately-NULL payload FIELD in the most recent right
    // row is preserved — per-column last(ignoreNulls) would skip it
    // and stitch together values from different right rows.
    val r = right.select(
      col(rightKey).as("_k"),
      col(rightTime).as("_t"),
      lit(0).as("_side"),
      struct(payloadCols.map(col): _*).as("_p"))

    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = unioned.withColumn("_pc", last(col("_p"), ignoreNulls = true).over(w))
    payloadCols
      .foldLeft(carried) { (df, c) => df.withColumn(c, col(s"_pc.$c")) }
      .filter(col("_side") === 1)
      .drop("_k", "_t", "_side", "_p", "_pc")
  }
}
