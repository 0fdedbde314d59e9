package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degenerate-input behavior: every operator must return an EMPTY
  * (or single-row) result on empty/singleton inputs, never throw —
  * at 100 TB some partition, some source, some day IS empty, and an
  * operator that crashes on it takes the whole pipeline down.
  */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private val oneDoc = Seq((1L, "just one lonely document here")).toDF("doc_id", "text")

  test("dedup family: empty corpus in, empty result out") {
    assert(Dedup.exact(emptyDocs, "text", "doc_id").count() == 0)
    assert(Dedup.minhashLsh(emptyDocs, "text", "doc_id").count() == 0)
    assert(Dedup.ngramJaccard(emptyDocs, "text", "doc_id", 3, 0.5, 100).count() == 0)
    assert(Dedup.containmentPairs(emptyDocs, "text", "doc_id", 3, 0.8, 100).count() == 0)
  }

  test("dedup family: singleton corpus yields no pairs and survives CC") {
    assert(Dedup.minhashLsh(oneDoc, "text", "doc_id").count() == 0)
    assert(Dedup.ngramJaccard(oneDoc, "text", "doc_id", 3, 0.5, 100).count() == 0)
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponents(pairs, "doc_a", "doc_b").count() == 0)
  }

  test("decontaminate: empty eval set flags nothing; empty train flags nothing") {
    assert(Dedup.decontaminate(oneDoc, emptyDocs, "text", "doc_id", 5).count() == 0)
    assert(Dedup.decontaminate(emptyDocs, oneDoc, "text", "doc_id", 5).count() == 0)
    assert(Dedup.decontaminateBloom(oneDoc, emptyDocs, "text", "doc_id", 5).count() == 0)
    assert(Dedup.decontaminateBloom(emptyDocs, oneDoc, "text", "doc_id", 5).count() == 0)
  }

  test("quantiles: empty frame gives empty result, singleton gives the value itself") {
    val empty = Seq.empty[(String, Double)].toDF("g", "v")
    assert(Quantiles.exactInterpolated(empty, "g", "v", Seq("p50" -> 0.5)).count() == 0)
    val one = Seq(("a", 42.0)).toDF("g", "v")
    val r = Quantiles.exactInterpolated(one, "g", "v",
      Seq("p50" -> 0.5, "p99" -> 0.99)).head()
    assert(r.getString(0) == "a" && r.getDouble(1) == 42.0 && r.getDouble(2) == 42.0)
    // all-null values: the group disappears rather than yielding NaN
    val nulls = Seq(("a", Option.empty[Double]), ("b", Some(1.0)))
      .toDF("g", "v")
    val out = Quantiles.exactInterpolated(nulls, "g", "v", Seq("p50" -> 0.5))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(out == Map("b" -> 1.0))
  }

  test("similarity: empty embeddings produce empty top-k / centroids") {
    val empty = Seq.empty[(Long, Array[Float], String)].toDF("vec_id", "embedding", "label")
    assert(Similarity.cosineTopK(empty, empty, "vec_id", "embedding", 5).count() == 0)
    assert(Similarity.centroids(empty, "label", "embedding").count() == 0)
  }

  test("snapshot diff: both sides empty, one side empty") {
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    val some = Seq((1L, "x")).toDF("id", "text")
    assert(SnapshotDiff.diff(empty, empty, "id", Seq("text")).count() == 0)
    val added = SnapshotDiff.diff(empty, some, "id", Seq("text")).collect()
    assert(added.length == 1 && added.head.getString(1) == "added")
    val removed = SnapshotDiff.diff(some, empty, "id", Seq("text")).collect()
    assert(removed.length == 1 && removed.head.getString(1) == "removed")
  }

  test("joins: empty probe/build sides give empty (or all-null-payload) output") {
    val facts = Seq((1L, 5.0)).toDF("id", "v")
    val noFacts = Seq.empty[(Long, Double)].toDF("id", "v")
    val ranges = Seq((10L, 0.0, 10.0)).toDF("rid", "lo", "hi")
    val noRanges = Seq.empty[(Long, Double, Double)].toDF("rid", "lo", "hi")
    assert(RangeJoin.binned(noFacts, col("v"), ranges, col("lo"), col("hi")).count() == 0)
    assert(RangeJoin.binned(facts, col("v"), noRanges, col("lo"), col("hi")).count() == 0)

    val quotes = Seq((1L, 100L, 9.99)).toDF("k", "t", "px")
    val noQuotes = Seq.empty[(Long, Long, Double)].toDF("k", "t", "px")
    val trades = Seq((1L, 150L)).toDF("k", "t")
    // as-of with an empty reference side: probe rows survive with a
    // null payload (left-join semantics), never disappear
    val asof = AsOfJoin.lastBefore(trades, noQuotes, "k", "k", "t", "t", Seq("px"))
    assert(asof.count() == 1 && asof.head().isNullAt(asof.head().fieldIndex("px")))

    val dim = Seq((1L, "d")).toDF("id", "name")
    val noDim = Seq.empty[(Long, String)].toDF("id", "name")
    assert(SkewJoin.saltedJoin(facts.withColumnRenamed("v", "x"), noDim, "id", 4).count() == 0)
    assert(SkewJoin.saltedJoin(noFacts.withColumnRenamed("v", "x"), dim, "id", 4).count() == 0)
  }

  test("text ops: empty-string and whitespace-only docs flow through") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "one real doc")).toDF("doc_id", "text")
    val counted = df.select(col("doc_id"), TextOps.tokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counted(3L) == 3L)
    // n-gram hashing of degenerate docs: empty array, no crash
    val sh = df.select(size(graft.functions.NgramXxHashes(col("text"), 5)).as("n"))
      .collect().map(_.getInt(0))
    assert(sh.take(2).forall(_ == 0))
  }
}
