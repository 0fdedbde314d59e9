package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class StreamMetricsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("listener captures per-batch input rows and trigger latency, then unregisters") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val ((qName, batches), m) = StreamMetrics.withMetrics(spark) { m =>
      val q = EventStream.windowedAgg(mem.toDF(), "1 hour", "10 minutes")
        .writeStream.format("memory").queryName("met_out")
        .outputMode("complete").start()
      try {
        mem.addData(EventRow(ts(0), 1L, "click", 10.0), EventRow(ts(5), 1L, "view", 2.0))
        q.processAllAvailable()
        mem.addData(EventRow(ts(30), 2L, "click", 4.0))
        q.processAllAvailable()
        // Progress events are delivered on the listener bus
        // asynchronously — spin briefly until both batches landed.
        val deadline = System.nanoTime() + 10000000000L
        while (m.snapshot().map(_.inputRows).sum < 3 && System.nanoTime() < deadline)
          Thread.sleep(50)
        ("met_out", m.snapshot())
      } finally q.stop()
    }
    val mine = batches.filter(_.queryName == qName)
    assert(mine.map(_.inputRows).sum == 3, s"expected 3 input rows, got $mine")
    // batch ids strictly increase per query
    assert(mine.map(_.batchId) == mine.map(_.batchId).sorted)
    assert(mine.forall(_.triggerMs >= 0))
    // windowed agg keeps state — the engine must report state rows
    assert(mine.exists(_.stateRows > 0))
    // report() round-trips the snapshot
    assert(m.report(spark).count() == batches.size.toLong)
    // removed: a later query must not land in this listener
    val mem2 = MemoryStream[EventRow]
    val q2 = EventStream.windowedAgg(mem2.toDF(), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("met_out2")
      .outputMode("complete").start()
    try {
      mem2.addData(EventRow(ts(1), 3L, "click", 1.0))
      q2.processAllAvailable()
      spark.streams.awaitAnyTermination(100)
    } catch { case _: Throwable => () } finally q2.stop()
    assert(!m.snapshot().exists(_.queryName == "met_out2"),
      "listener captured events after removal")
    spark.catalog.dropTempView("met_out")
    spark.catalog.dropTempView("met_out2")
  }
}
