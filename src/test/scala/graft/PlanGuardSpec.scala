package graft

import graft.queries.Registry
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regression guard: no registry query may grow a window with an
  * empty partition spec (a single-task global sort at scale) beyond
  * the audited allowlist below. VERDICT r5 finding #4: the two
  * intentionally bounded sim_hybrid_rrf windows were correct by
  * design, but nothing PREVENTED a future unbounded global window
  * from landing silently — this spec does.
  */
class PlanGuardSpec extends SparkSpec {

  /** name -> (max allowed unpartitioned windows, why they're safe).
    * Every entry must cite the boundedness argument: an allowlisted
    * window's input must be limited BEFORE the window runs.
    */
  private val allow: Map[String, (Int, String)] = Map(
    "sim_hybrid_rrf" -> ((2,
      "both windows rank candidate lists already heap-limited to " +
        "<=50 rows (Pipeline3 lex/vec subtrees); constant-size at any corpus scale"))
  )

  test("guard trips on an intentionally unpartitioned window fixture") {
    val bad = spark.range(8).toDF("id")
      .withColumn("rk", row_number().over(Window.orderBy(col("id"))))
    assert(PlanCheck.unpartitionedWindows(bad).nonEmpty)
  }

  test("a partitioned window does not trip the guard") {
    val ok = spark.range(8).toDF("id")
      .withColumn("rk",
        row_number().over(Window.partitionBy(col("id") % 2).orderBy(col("id"))))
    assert(PlanCheck.unpartitionedWindows(ok).isEmpty)
  }

  test("no registry query has an unallowlisted global window") {
    // st_* queries execute their streaming harness on construction
    // (memory-sink correctness shape) and cannot host a batch global
    // window; they are exercised by StreamQueriesSpec instead.
    val batch = Registry.all.filterNot(_.name.startsWith("st_"))
    val offenders = batch.flatMap { q =>
      val wins = PlanCheck.unpartitionedWindows(q.fn(spark, sfDir))
      val cap = allow.get(q.name).map(_._1).getOrElse(0)
      if (wins.size > cap) Some(s"${q.name}: ${wins.size} global window(s) [${wins.mkString(" | ")}]")
      else None
    }
    assert(offenders.isEmpty, s"unaudited global windows:\n${offenders.mkString("\n")}")
  }
}
