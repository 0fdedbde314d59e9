package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  test("splitAssign is stable and roughly proportioned") {
    val a = tables.documents
      .select(col("doc_id"), Sampling.splitAssign(col("doc_id"), 80, 10).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = tables.documents
      .repartition(7) // different physical layout, same assignment
      .select(col("doc_id"), Sampling.splitAssign(col("doc_id"), 80, 10).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    val frac = a.values.count(_ == "train").toDouble / a.size
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
  }

  test("splitAssign survives huge ids under ANSI mode (regression: long overflow)") {
    import spark.implicits._
    val big = Seq(4000000000L, Long.MaxValue / 2, 7L).toDF("id")
    val out = big.select(Sampling.splitAssign(col("id"), 80, 10)).collect().map(_.getString(0))
    assert(out.forall(Set("train", "val", "test")))
  }

  test("stratifiedSample keeps ~fraction per stratum, deterministically") {
    val base = tables.documents.select(col("doc_id"), col("lang"))
    val s1 = Sampling.stratifiedSample(base, "lang", "doc_id", 0.1)
      .collect().map(_.getLong(0)).toSet
    val s2 = Sampling.stratifiedSample(base.repartition(5), "lang", "doc_id", 0.1)
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2)
    val perLang = base.collect().groupBy(_.getString(1)).view.mapValues(_.length)
    perLang.foreach { case (lang, n) =>
      val kept = Sampling.stratifiedSample(base, "lang", "doc_id", 0.1)
        .filter(col("lang") === lang).count()
      assert(kept == math.ceil(n * 0.1).toLong, s"$lang kept=$kept n=$n")
    }
  }
}
