package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event row (the `events` table schema, post ts-conversion). */
final case class EventRow(ts: java.sql.Timestamp, user_id: Long, event_type: String, value: Double)

/** Per-user running aggregate emitted by the stateful op. */
final case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

/** Anomaly-detector input: event identity plus the ×10⁶ fixed-point
  * value and epoch-µs event time (quantized upstream so every moment
  * below is exact integer math).
  */
final case class AnomEvent(user_id: Long, event_id: Long, ts_us: Long, fx: Long)

/** Per-user moment state carried across micro-batches: count, Σfx,
  * Σfx². Σfx² exceeds Long past ~10¹⁸ (fx up to ~5·10⁸ squared), so
  * it travels as a decimal string; n and Σfx stay in Long range.
  */
final case class AnomState(n: Long, sx: Long, sx2: String)

/** A flagged anomaly: the event plus how many PRIOR events sized the
  * baseline it broke (and its fixed-point value, for the oracle).
  */
final case class AnomFlag(user_id: Long, event_id: Long, n_prior: Long, fx: Long)

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

  /** I17: SLIDING event-time window aggregation — each event lands
    * in `windowDur / slide` overlapping windows (Spark expands the
    * assignment map-side before the stateful agg, so state size is
    * windows × keys, not events). The smoothing view a tumbling
    * window can't give: a burst on a bucket boundary splits across
    * two tumbling buckets but is intact in some sliding window.
    */
  def slidingAgg(events: DataFrame, windowDur: String, slide: String,
      watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur, slide).as("w"), col("event_type"))
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

  /** I16: streaming anomaly detection with ARBITRARY user state —
    * flags events more than 3 population σ from the user's PRIOR
    * mean (once ≥ 5 priors exist), the running moments carried
    * across micro-batches by flatMapGroupsWithState. All math is
    * exact integer over the ×10⁶ fixed-point values:
    * |x − Σx/n| > 3σ ⟺ (n·x − Σx)² > 9·(n·Σx² − (Σx)²), evaluated
    * in BigInt — the flag set is bit-deterministic under any
    * partitioning and any micro-batch split, which is what lets a
    * DuckDB window twin oracle a stateful stream.
    *
    * Scale shape: state is three numbers per user (no event
    * retention), each micro-batch exchanges once on user_id, and
    * per-key work is linear in that key's batch rows — the standard
    * keyed-state budget at firehose scale.
    */
  def anomalyZscore(events: Dataset[AnomEvent]): Dataset[AnomFlag] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AnomState, AnomFlag](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[AnomEvent], state: GroupState[AnomState]) =>
          val st = state.getOption.getOrElse(AnomState(0L, 0L, "0"))
          var n = st.n
          var sx = BigInt(st.sx)
          var sx2 = BigInt(st.sx2)
          val out = Seq.newBuilder[AnomFlag]
          // The group iterator arrives in DELIVERY order; impose the
          // (ts, event_id) total order so "prior" is well-defined.
          // Cross-batch order holds because staging delivers strictly
          // older event-time files in earlier micro-batches.
          rows.toArray.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            val x = BigInt(e.fx)
            if (n >= 5L) {
              val dx = BigInt(n) * x - sx
              val thr = BigInt(9) * (BigInt(n) * sx2 - sx * sx)
              if (dx * dx > thr) out += AnomFlag(userId, e.event_id, n, e.fx)
            }
            n += 1L; sx += x; sx2 += x * x
          }
          state.update(AnomState(n, sx.toLong, sx2.toString))
          out.result().iterator
      }
  }
}
