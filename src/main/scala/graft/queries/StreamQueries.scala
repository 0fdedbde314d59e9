package graft.queries

import graft.streaming.EventStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Paths}

/** Streaming queries registered as CORRECTNESS rows (SURVEY §2 I):
  * the windowed aggregation runs as a REAL Structured Streaming query
  * — file source → AvailableNow trigger → memory sink — and its sink
  * contents are the query result, oracle-checked against the batch
  * twin's SQL (D5). Streaming is thereby gated by the DuckDB hash
  * compare, not only by MemoryStream ScalaTests.
  */
object StreamQueries {

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.deleteIfExists(f))
      finally s.close()
    }

  /** Run `body` with `spark.sql.shuffle.partitions` temporarily
    * lowered for a streaming query. Stateful streaming fans out one
    * state-store instance per shuffle partition PER MICRO-BATCH
    * (each committing a checkpoint delta file); at local scale that
    * fixed fan-out dwarfs the data. The partition count is pinned
    * into the checkpoint at first start, so it is a per-query
    * sizing decision — a production deployment sizes it to state
    * volume (keys/partition), exactly as done here.
    */
  private def withStreamingShufflePartitions[A](spark: SparkSession, n: Int)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, prev)
  }

  /** Materialize the memory sink's rows and DROP its temp view —
    * these queries run repeatedly (bench min-of-two, verify), so
    * sink tables must not accumulate in the session for the rest of
    * its lifetime. The result rows are aggregate-sized.
    */
  private def drainMemorySink(spark: SparkSession, qName: String): DataFrame = {
    val sink = spark.table(qName)
    val rows = java.util.Arrays.asList(sink.collect(): _*)
    val out = spark.createDataFrame(rows, sink.schema)
    spark.catalog.dropTempView(qName)
    out
  }

  /** I1 end-to-end: tumbling 1-hour event-time windows over the
    * events table consumed INCREMENTALLY through the file streaming
    * source. AvailableNow processes the backlog in bounded batches
    * then terminates — the same code path a live `readStream` takes,
    * which is what makes this a faithful streaming correctness row.
    */
  def stWindowedAgg(spark: SparkSession, dir: String): DataFrame = {
    // File streaming sources list a DIRECTORY; the testdata tables
    // are single parquet files — stage a copy (driver-side, one tiny
    // file op; at production scale the source would already be a
    // directory of part files).
    val stage = Files.createTempDirectory("graft_stream_events_")
    Files.copy(Paths.get(s"$dir/events.parquet"), stage.resolve("events.parquet"))
    val batchSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val raw = spark.readStream.schema(batchSchema).parquet(stage.toString)
    // Same nanos→micros truncation Tables.events applies on the
    // batch side (the parquet ts arrives as an epoch-nano long under
    // nanosAsLong).
    val events = raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val out = EventStream.windowedAgg(events, "1 hour", "1 hour")
    // Complete mode: emit every window, including those still inside
    // the watermark — matching the batch twin exactly. (Append mode
    // would withhold the trailing windows; the append/eviction
    // behavior is covered by the MemoryStream ScalaTests.)
    val qName = "st_windowed_agg_" + java.util.UUID.randomUUID().toString.replace("-", "")
    withStreamingShufflePartitions(spark, 4) {
      val query = out.writeStream
        .format("memory")
        .queryName(qName)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
    }
    val result = drainMemorySink(spark, qName)
    deleteRecursively(stage)
    result
  }

  /** Oracle: identical to the batch twin D5 (q_events_window). */
  val stWindowedAggSql: String = Analytic.qEventsWindowSql

  /** I2 end-to-end: gap-based sessionization via `session_window`
    * through the file streaming source. Session windows only support
    * append/update output, and append only emits sessions the
    * WATERMARK has passed — so the stage directory gets a second
    * file holding one far-future sentinel event (user_id −1,
    * excluded from the result): batch 1 processes the real data,
    * batch 2 the sentinel (advancing max event time), and the final
    * no-data micro-batch's watermark then flushes every real
    * session. This is exactly how a production stream drains — event
    * time, not wall clock, closes sessions.
    */
  def stSessionAgg(spark: SparkSession, dir: String): DataFrame = {
    val stage = Files.createTempDirectory("graft_stream_sessions_")
    Files.copy(Paths.get(s"$dir/events.parquet"), stage.resolve("a_events.parquet"))
    val batch = spark.read.parquet(s"$dir/events.parquet")
    // Two sentinel batches (user −1, far-future ts): the first
    // advances max event time past all real data; the SECOND gives
    // the engine a further batch whose eviction pass runs with that
    // advanced watermark — flushing every real session. (The final
    // no-data micro-batch alone does not evict here.)
    val tenYearsNanos = 10L * 365 * 24 * 3600 * 1000L * 1000 * 1000
    val maxTs = batch.agg(max(col("ts"))).head().getLong(0)
    val baseTime = Files.getLastModifiedTime(stage.resolve("a_events.parquet")).toMillis
    // ONE sentinel write job; its part file is staged twice. Batch 2
    // (sentinel copy 1) advances max event time 10 years past the
    // real data; batch 3 (copy 2 — identical bytes, later mtime) then
    // runs its eviction pass under that advanced watermark, flushing
    // every real session. The sentinel's own session stays in state
    // (never emitted) — it is filtered out below anyway.
    val scratch = Files.createTempDirectory("graft_sentinel_")
    batch.limit(1)
      .withColumn("user_id", lit(-1L))
      .withColumn("ts", lit(maxTs + tenYearsNanos))
      .coalesce(1)
      .write.mode("overwrite").parquet(scratch.resolve("out").toString)
    val listing = Files.list(scratch.resolve("out"))
    val part =
      try listing.filter(_.getFileName.toString.endsWith(".parquet")).findFirst().get()
      finally listing.close()
    Seq(1, 2).foreach { i =>
      // The file source lists PLAIN files in the stage dir (a Spark
      // parquet "file" is a directory, which the source would skip) —
      // hoist the part file up as z_sentinel_<i>.parquet, with
      // strictly increasing mtimes so the source orders them last.
      val dest = stage.resolve(s"z_sentinel_$i.parquet")
      Files.copy(part, dest)
      Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(baseTime + i * 60000L))
    }
    deleteRecursively(scratch)

    val raw = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.toString)
    val events = raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val out = EventStream.sessionWindows(events, "30 minutes", "1 hour")
    val qName = "st_session_agg_" + java.util.UUID.randomUUID().toString.replace("-", "")
    withStreamingShufflePartitions(spark, 4) {
      val query = out.writeStream
        .format("memory")
        .queryName(qName)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
    }
    val result = drainMemorySink(spark, qName)
      .filter(col("user_id") =!= -1L)
      .select(col("user_id"),
        unix_micros(col("session_start")).as("session_start_us"),
        unix_micros(col("session_end")).as("session_end_us"),
        col("n_events"), col("session_value"))
    deleteRecursively(stage)
    result
  }

  /** Lag-based gap islands in integer microseconds — strictly
    * `> gap` starts a new session: `session_window` still merges an
    * event landing exactly on the previous session's end.
    */
  val stSessionAggSql: String =
    """WITH ordered AS (
      |  SELECT user_id, ts, event_id, value,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |flags AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN prev_ts IS NULL
      |           OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS new_s
      |  FROM ordered),
      |sess AS (
      |  SELECT user_id, ts, value,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flags)
      |SELECT user_id,
      |  epoch_us(min(ts)) AS session_start_us,
      |  epoch_us(max(ts)) + 1800000000 AS session_end_us,
      |  count(*) AS n_events,
      |  round(sum(value), 4) + 0 AS session_value
      |FROM sess GROUP BY user_id, sid""".stripMargin
}
