package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts rows, nulls, and exact distincts per column") {
    val df = Seq(
      (1L, Some("a"), Some(1.0)),
      (2L, None, Some(2.0)),
      (3L, Some("a"), None),
      (4L, Some("b"), Some(2.0))
    ).toDF("id", "s", "v")
    val p = Profiler.profile(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(p("id") == ((4L, 0L, 4L)))
    assert(p("s") == ((4L, 1L, 2L)))  // null not counted as a distinct value
    assert(p("v") == ((4L, 1L, 2L)))
  }

  test("profile of an empty frame reports zeros") {
    val df = Seq.empty[(Long, String)].toDF("id", "s")
    val p = Profiler.profile(df, Seq("id", "s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(p("id") == ((0L, 0L, 0L)) && p("s") == ((0L, 0L, 0L)))
  }

  test("profile is a single-pass plan: one scan, no unpivot row blowup") {
    val df = tables.events
    val plan = Profiler.profile(df, Seq("event_id", "event_type"))
      .queryExecution.executedPlan.toString
    // One Expand feeding partial aggregates — not a per-column scan.
    assert("Scan parquet".r.findAllIn(plan).length == 1, plan)
  }

  test("HLL sketch merge equals sketching everything at once, within 5% of exact") {
    val e = tables.events
    val cut = 1705276800000000L
    val first = e.filter(unix_micros(col("ts")) < cut)
    val second = e.filter(unix_micros(col("ts")) >= cut)
    val merged = Profiler.mergeSketches("event_type",
      Profiler.distinctSketch(first, "event_type", "user_id"),
      Profiler.distinctSketch(second, "event_type", "user_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Profiler.mergeSketches("event_type", Profiler.distinctSketch(e, "event_type", "user_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == direct) // register-max associativity: EXACT equality
    val exact = e.groupBy("event_type").agg(countDistinct("user_id").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, d) =>
      assert(math.abs(merged(k) - d).toDouble / d < 0.05, s"$k merged=${merged(k)} exact=$d")
    }
  }
}
