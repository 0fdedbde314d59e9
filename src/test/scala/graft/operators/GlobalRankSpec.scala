package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ntileExact must agree with Spark's own window ntile (the
  * semantics oracle) on every shape: n divisible by k, n % k != 0
  * (wide buckets first), n < k (one row per bucket), and skewed
  * duplicate keys with a tiebreaker.
  */
class GlobalRankSpec extends SparkSpec {

  private def compare(values: Seq[Long], k: Int): Unit = {
    import spark.implicits._
    val df = values.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val got = GlobalRank
      .ntileExact(df, Seq(col("v"), col("id")), k, "b")
      .select("id", "b")
    val want = df.select(
      col("id"),
      ntile(k).over(Window.orderBy(col("v"), col("id"))).cast("long").as("b"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      s"ntileExact != window ntile for n=${values.size}, k=$k")
  }

  test("matches window ntile when n is divisible by k") {
    compare((1L to 20L).reverse, 4)
  }

  test("matches window ntile when n % k != 0 (wide buckets first)") {
    compare((1L to 23L), 5)
  }

  test("matches window ntile when n < k") {
    compare(Seq(5L, 3L, 9L), 10)
  }

  test("matches window ntile under heavy ties with tiebreaker") {
    compare(Seq.fill(17)(7L) ++ Seq.fill(6)(2L), 4)
  }

  test("no global window in the plan") {
    import spark.implicits._
    val df = (1L to 10L).toDF("v").withColumn("id", col("v"))
    val out = GlobalRank.ntileExact(df, Seq(col("v")), 3, "b")
    assert(graft.PlanCheck.unpartitionedWindows(out).isEmpty)
  }
}
