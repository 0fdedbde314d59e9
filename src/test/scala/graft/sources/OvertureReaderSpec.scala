package graft.sources

import graft.SparkSpec

class OvertureReaderSpec extends SparkSpec {

  test("column spec supports plain, aliased, and nested entries") {
    val df = OvertureReader.read(
      tables,
      ReadRequest("events", columns = Seq("event_id", "event_type as etype", "props.k as k")))
    assert(df.columns.toSeq == Seq("event_id", "etype", "k"))
  }

  test("bbox filter keeps only in-range rows") {
    val df = OvertureReader.read(
      tables,
      ReadRequest("events",
        columns = Seq("event_id", "value", "user_id"),
        bbox = Some(BBoxFilter("value", "user_id", BBox(0, 0, 100, 50)))))
    val rows = df.collect()
    assert(rows.forall { r =>
      val v = r.getDouble(1); val u = r.getLong(2)
      v >= 0 && v <= 100 && u >= 0 && u <= 50
    })
  }

  test("deterministic limit is stable across runs") {
    val req = ReadRequest("orders",
      columns = Seq("o_orderkey"),
      limit = Some(LimitSpec(10, Seq("o_orderkey"))))
    val a = OvertureReader.read(tables, req).collect().map(_.getLong(0)).toSeq
    val b = OvertureReader.read(tables, req).collect().map(_.getLong(0)).toSeq
    assert(a == b && a.size == 10 && a == a.sorted)
  }

  test("multilayer union tags layers and aligns schemas") {
    val df = OvertureReader.readMultilayer(
      tables,
      Seq(
        "place" -> ReadRequest("customer", columns = Seq("c_custkey as id", "c_name as name", "c_acctbal as bal")),
        "building" -> ReadRequest("supplier", columns = Seq("s_suppkey as id", "s_name as name"))))
    assert(df.columns.contains("source_type") && df.columns.contains("bal"))
    val tags = df.select("source_type").distinct().collect().map(_.getString(0)).toSet
    assert(tags == Set("place", "building"))
    // building layer has no bal column -> null-filled
    assert(df.filter("source_type = 'building' AND bal IS NOT NULL").count() == 0)
  }

  test("geometry split covers all rows with a family") {
    val df = OvertureReader.geometrySplit(
      tables.events, "event_type",
      Map("points" -> Seq("click", "view"), "lines" -> Seq("purchase")))
    assert(df.filter("geometry_family IS NULL").count() == 0)
    assert(df.filter("geometry_family = 'other'").count() > 0)
  }

  test("clipToRegion behaves as containment semi-join") {
    val clipped = OvertureReader.clipToRegion(tables, tables.customer, "c_nationkey", "ASIA")
    assert(clipped.count() > 0 && clipped.count() < tables.customer.count())
    assert(clipped.columns.toSeq == tables.customer.columns.toSeq)
  }

  test("readFormat round-trips tables through csv and json") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fmt").toString
    val src = tables.nation
    src.write.option("header", "true").csv(s"$dir/n.csv")
    src.write.json(s"$dir/n.json")
    val fromCsv = OvertureReader.readFormat(spark, s"$dir/n.csv", "csv")
    val fromJson = OvertureReader.readFormat(spark, s"$dir/n.json", "json")
    assert(fromCsv.count() == 25 && fromJson.count() == 25)
    assert(fromCsv.select("n_name").collect().map(_.getString(0)).toSet ==
      src.select("n_name").collect().map(_.getString(0)).toSet)
    intercept[IllegalArgumentException] {
      OvertureReader.readFormat(spark, dir, "orc-nope")
    }
  }

  test("projection prunes the parquet read schema") {
    val df = OvertureReader.read(tables, ReadRequest("lineitem", columns = Seq("l_orderkey")))
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema") && !scan.contains("l_comment"))
    assert(scan.contains("struct<l_orderkey:bigint>"))
  }
}
