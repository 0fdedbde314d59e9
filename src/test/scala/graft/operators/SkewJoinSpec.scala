package graft.operators

import graft.SparkSpec
import graft.`export`.FeatureService
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain join") {
    val plain = tables.events
      .join(tables.customer, col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SkewJoin
      .saltedJoin(
        tables.events.withColumnRenamed("user_id", "k"),
        tables.customer.withColumnRenamed("c_custkey", "k"),
        "k", saltFactor = 8)
      .groupBy("c_mktsegment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("bucketed layers join without a shuffle") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    val a = tables.orders.select("o_orderkey", "o_custkey", "o_totalprice")
    val b = tables.lineitem.select("l_orderkey", "l_quantity")
    FeatureService.publishBucketed(a, dir, "orders_b", "orders_b", "o_orderkey", 4)
    FeatureService.publishBucketed(
      b.withColumnRenamed("l_orderkey", "o_orderkey"), dir, "lineitem_b", "lineitem_b", "o_orderkey", 4)
    val joined = spark.table("orders_b")
      .hint("MERGE")
      .join(spark.table("lineitem_b"), "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"bucketed join should be shuffle-free:\n${plan.take(2000)}")
    assert(joined.count() > 0)
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }

  test("writeRangeSorted round-trips and bounds files by range") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sorted").toString + "/out"
    FeatureService.writeRangeSorted(tables.orders, dir, "o_orderkey", 4)
    val back = spark.read.parquet(dir)
    assert(back.count() == tables.orders.count())
    // range predicate scans should skip most files via min/max stats:
    // verify the data is globally range-partitioned by checking file-level
    // disjointness through per-file min/max of the sort key.
    val perFile = back
      .select(col("o_orderkey"), input_file_name().as("f"))
      .groupBy("f").agg(min("o_orderkey").as("lo"), max("o_orderkey").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    perFile.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }
}
