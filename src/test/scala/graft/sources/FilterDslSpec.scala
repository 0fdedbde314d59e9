package graft.sources

import graft.SparkSpec

class FilterDslSpec extends SparkSpec {

  test("equality filter on plain column") {
    val out = FilterDsl(tables.documents, "lang = 'en'")
    assert(out.count() > 0)
    assert(out.select("lang").distinct().collect().map(_.getString(0)).toSeq == Seq("en"))
  }

  test("IN filter on plain column") {
    val out = FilterDsl(tables.events, "event_type IN ('click', 'view')")
    val kinds = out.select("event_type").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("click", "view"))
  }

  test("nested path on string column resolves via JSON extraction") {
    val out = FilterDsl(tables.events, "props.k = '12'")
    assert(out.count() > 0)
  }

  test("IN values containing commas survive parsing (regression)") {
    import spark.implicits._
    val df = Seq("food, drink", "retail", "other").toDF("cat")
    val out = FilterDsl(df, "cat IN ('food, drink', 'retail')")
      .collect().map(_.getString(0)).toSet
    assert(out == Set("food, drink", "retail"))
  }

  test("blank filter returns frame unchanged") {
    assert(FilterDsl(tables.nation, "  ").count() == tables.nation.count())
  }

  test("unsupported filter raises") {
    intercept[IllegalArgumentException] {
      FilterDsl(tables.nation, "n_name LIKE 'A%'")
    }
  }

  test("predicate pushes down to the parquet scan") {
    val plan = FilterDsl(tables.documents, "lang = 'en'")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("lang"))
  }
}
