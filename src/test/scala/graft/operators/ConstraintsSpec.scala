package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  test("null predicate results count as violations (3VL must not pass the gate)") {
    val df = Seq(Some(1.0), Some(-2.0), None).toDF("v")
    val out = Constraints.check(df, Seq("v_non_negative" -> (col("v") >= 0)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // -2.0 violates outright; the NULL comparison is unknown -> violation.
    assert(out("v_non_negative") == 2L)
  }

  test("empty frame yields zero violations, one row per rule") {
    val df = Seq.empty[Double].toDF("v")
    val out = Constraints.check(df,
      Seq("a" -> (col("v") >= 0), "b" -> col("v").isNotNull))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 0L, "b" -> 0L))
  }

  test("referential counts orphan keys") {
    val facts = Seq((1L, "x"), (2L, "y"), (99L, "z")).toDF("k", "p")
    val dim = Seq(1L, 2L, 3L).toDF("dk")
    val out = Constraints.referential(facts, "k", dim, "dk", "fk").head()
    assert(out.getString(0) == "fk" && out.getLong(1) == 1L)
  }

  test("column rules fold into a single scan") {
    val plan = Constraints.check(tables.events, Seq(
      "a" -> col("event_id").isNotNull, "b" -> (col("value") >= 0)))
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).length == 1, plan)
  }
}
