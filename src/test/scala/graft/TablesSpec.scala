package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** The ts-encoding dispatch (Tables.normalizeTs / tsMicrosExpr /
  * tsBoundLit) pinned over all three physical encodings the driver's
  * generator has shipped. The LongType arm additionally pins EXACT
  * integral division: epoch nanos exceed double's 2^53 integer
  * precision, so a floating-point `/ 1000` truncates to M-1 for
  * about half of all micro-aligned values — the review finding this
  * spec closes.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // a micro-aligned nano timestamp where double division is lossy:
  // double(1706140800000016000)/1000 lands just below the true
  // quotient, so float-divide-then-truncate yields ...015999
  private val trickyNanos = 1706140800000016000L
  private val trickyUs = 1706140800000016L

  test("tsMicrosExpr is exact on nano-longs beyond double precision") {
    val df = Seq(trickyNanos, 7258118400000000000L, 0L, 999L).toDF("ts")
    val out = df.select(Tables.tsMicrosExpr(LongType, col("ts")).as("us"))
      .as[Long].collect().toSeq
    assert(out == Seq(trickyUs, 7258118400000000L, 0L, 0L))
    // the floating-point formulation this replaces IS lossy here —
    // proves the test would catch a regression
    val lossy = df.select((col("ts") / 1000L).cast(LongType).as("us"))
      .as[Long].collect().toSeq
    assert(lossy.head != trickyUs)
  }

  test("tsMicrosExpr and normalizeTs agree across all three encodings") {
    val us = trickyUs
    val long = Seq(us * 1000L).toDF("ts")
    val ntz = Seq(us).toDF("us").select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    val tst = Seq(us).toDF("us").select(timestamp_micros(col("us")).as("ts"))
    for (df <- Seq(long, ntz, tst)) {
      val dt = df.schema("ts").dataType
      assert(df.select(Tables.tsMicrosExpr(dt, col("ts"))).head().getLong(0) == us, s"$dt")
      val norm = Tables.normalizeTs(df)
      assert(norm.schema("ts").dataType == TimestampType, s"$dt")
      assert(norm.select(unix_micros(col("ts"))).head().getLong(0) == us, s"$dt")
    }
  }

  test("tsBoundLit predicates match tsMicrosExpr semantics per encoding") {
    val us = trickyUs
    val long = Seq(us * 1000L - 1000L, us * 1000L, us * 1000L + 1000L).toDF("ts")
    val ntz = Seq(us - 1L, us, us + 1L).toDF("u")
      .select(timestamp_micros(col("u")).cast(TimestampNTZType).as("ts"))
    val tst = Seq(us - 1L, us, us + 1L).toDF("u")
      .select(timestamp_micros(col("u")).as("ts"))
    for (df <- Seq(long, ntz, tst)) {
      val dt = df.schema("ts").dataType
      val n = df.filter(col("ts") >= Tables.tsBoundLit(dt, us)).count()
      assert(n == 2, s"$dt: expected 2 rows at-or-after the bound, got $n")
    }
  }
}
