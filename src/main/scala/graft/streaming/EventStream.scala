package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event row (the `events` table schema, post ts-conversion). */
final case class EventRow(ts: java.sql.Timestamp, user_id: Long, event_type: String, value: Double)

/** Per-user running aggregate emitted by the stateful op. */
final case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

/** Structured Streaming over the events schema — the streaming
  * twins of the batch operators (SURVEY §2 I; batch equivalents D5
  * windowed agg and D6 sessionization are the oracle-checked
  * versions).
  *
  * The same column transforms run on a batch frame or a
  * `readStream` frame; watermarks bound state for the 100 TB/day
  * firehose case.
  */
object EventStream {

  /** I1: tumbling event-time window aggregation with watermark. */
  def windowedAgg(events: DataFrame, windowDur: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"), col("sum_value"))

  /** I2: gap-based sessionization via `session_window` — merges
    * events closer than `gap` into one session per user; watermark
    * lets Spark emit and evict closed sessions.
    */
  def sessionWindows(events: DataFrame, gap: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("s"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("session_value"))
      .select(col("s.start").as("session_start"), col("s.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** I2b: arbitrary per-key state via flatMapGroupsWithState —
    * running totals per user, emitted on every update (the escape
    * hatch for session logic `session_window` can't express).
    */
  def runningTotals(events: Dataset[EventRow]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserTotals, UserTotals](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(userId, 0L, 0.0))
          var n = prev.n_events
          var total = prev.total_value
          rows.foreach { r => n += 1; total += r.value }
          val updated = UserTotals(userId, n, math.rint(total * 10000) / 10000)
          state.update(updated)
          Iterator.single(updated)
      }
  }
}
