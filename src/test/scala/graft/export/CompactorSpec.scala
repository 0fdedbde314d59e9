package graft.export

import graft.SparkSpec
import java.nio.file.Files

class CompactorSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(name).resolve("d").toString

  test("compact shrinks a many-small-files dir to the byte-planned count, content-identical") {
    import spark.implicits._
    val in = tmp("compact-in")
    val out = tmp("compact-out")
    val df = (1 to 5000).map(i => (i.toLong, s"row$i")).toDF("id", "s")
    df.repartition(40).write.parquet(in)
    assert(Compactor.dataFileCount(spark, in) == 40)
    val total = Compactor.dataBytes(spark, in)
    assert(total > 0)
    // Target half the total → plan = 2 files.
    val (planned, inFiles) = Compactor.compact(spark, in, out, targetBytes = (total + 1) / 2)
    assert(planned == 2 && inFiles == 40)
    assert(Compactor.dataFileCount(spark, out) == 2)
    val back = spark.read.parquet(out)
    assert(back.count() == 5000)
    assert(back.except(df).isEmpty && df.except(back).isEmpty)
  }

  test("shrink path is narrow — no exchange in the compaction plan") {
    import spark.implicits._
    val in = tmp("compact-narrow")
    (1 to 100).toDF("id").repartition(10).write.parquet(in)
    val df = spark.read.parquet(in).coalesce(1)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"coalesce shrink must not shuffle:\n$plan")
  }

  test("plan grows past input file count via repartition when files are oversized") {
    import spark.implicits._
    val in = tmp("compact-grow")
    val out = tmp("compact-grow-out")
    (1 to 2000).map(i => (i, "x" * 50)).toDF("id", "s").coalesce(1).write.parquet(in)
    val total = Compactor.dataBytes(spark, in)
    val (planned, inFiles) = Compactor.compact(spark, in, out, targetBytes = math.max(1, total / 4))
    assert(inFiles == 1 && planned >= 4)
    assert(Compactor.dataFileCount(spark, out) == planned)
    assert(spark.read.parquet(out).count() == 2000)
  }

  test("planFileCount: ceil division, floor of 1, rejects non-positive target and Int overflow") {
    assert(Compactor.planFileCount(0L, 100L) == 1)
    assert(Compactor.planFileCount(100L, 100L) == 1)
    assert(Compactor.planFileCount(101L, 100L) == 2)
    intercept[IllegalArgumentException](Compactor.planFileCount(10L, 0L))
    // A plan past Int range must error, not wrap through .toInt.
    intercept[IllegalArgumentException](Compactor.planFileCount(Long.MaxValue / 2, 1L))
  }

  test("Hive-partitioned input is refused, not flattened") {
    import spark.implicits._
    val in = tmp("compact-part")
    val out = tmp("compact-part-out")
    (1 to 100).map(i => (i, i % 3)).toDF("id", "k")
      .write.partitionBy("k").parquet(in)
    val err = intercept[IllegalArgumentException](Compactor.compact(spark, in, out))
    assert(err.getMessage.contains("partition"))
  }

  test("in-place compaction is refused") {
    val in = tmp("compact-same")
    import spark.implicits._
    (1 to 10).toDF("id").write.parquet(in)
    intercept[IllegalArgumentException](Compactor.compact(spark, in, in))
  }
}
