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
    val query = out.writeStream
      .format("memory")
      .queryName(qName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    val result = spark.table(qName)
    // The memory sink holds the (small) aggregated windows on the
    // driver; the staged copy is no longer needed.
    Files.deleteIfExists(stage.resolve("events.parquet"))
    Files.deleteIfExists(stage)
    result
  }

  /** Oracle: identical to the batch twin D5 (q_events_window). */
  val stWindowedAggSql: String = Analytic.qEventsWindowSql
}
