package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NormalizeSpec extends SparkSpec {

  test("sanitizeName: reserved keyword, separators, 30-char cap") {
    assert(Normalize.sanitizeName("select") == "select_field")
    assert(Normalize.sanitizeName("order status") == "order_status")
    assert(Normalize.sanitizeName("a" * 40) == "a" * 30)
    assert(Normalize.sanitizeName("ok_name") == "ok_name")
  }

  test("sanitizeFieldNames never yields duplicate columns (regression: rename-all corruption)") {
    val df = tables.nation.select(
      col("n_nationkey").as("select"),
      col("n_name").as("select_field"),
      col("n_regionkey").as("a" * 35))
    val out = Normalize.sanitizeFieldNames(df)
    assert(out.columns.distinct.length == out.columns.length)
    assert(out.columns.contains("select_field") && out.columns.contains("select_field_2"))
    assert(out.count() == tables.nation.count()) // frame still usable
  }

  test("clipStrings clips only string columns") {
    val df = tables.documents.select(col("doc_id"), col("text"))
    val out = Normalize.clipStrings(df, 10)
    assert(out.agg(max(length(col("text")))).head().getInt(0) <= 10)
    assert(out.schema("doc_id").dataType.typeName == "long")
  }

  test("safeNumeric nulls on garbage instead of failing") {
    val df = tables.documents
      .select(Normalize.safeNumeric(col("lang"), "int").as("bad"),
        Normalize.safeNumeric(lit("42"), "int").as("good"))
    val r = df.head()
    assert(r.isNullAt(0) && r.getInt(1) == 42)
  }

  test("orderColumnsForPublish puts preferred first") {
    val df = tables.part.select(
      col("p_type").as("road_type"), col("p_partkey").as("id"), col("p_name").as("zz"))
    assert(Normalize.orderColumnsForPublish(df).columns.toSeq == Seq("id", "road_type", "zz"))
  }

  test("dropInvalid enforces non-empty and magnitude") {
    val out = Normalize.dropInvalid(
      tables.events.select(col("event_id"), col("event_type"), col("value")),
      Seq("event_type"), Some(("value", 100.0)))
    assert(out.filter(col("value") <= 100.0).count() == 0)
  }

  test("addMetadata adds provenance columns") {
    val out = Normalize.addMetadata(tables.nation, "AFG", "Afghanistan", None, "2026-01-01")
    assert(out.columns.contains("country_iso3") && !out.columns.contains("data_sector"))
  }
}
