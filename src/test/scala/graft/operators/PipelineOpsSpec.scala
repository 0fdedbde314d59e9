package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  // --- RangeJoin ---

  test("binned range join matches the naive inequality join") {
    val facts = tables.lineitem.select(col("l_orderkey"), col("l_quantity"))
    val ranges = Seq((1L, 0.0, 7.0), (2L, 5.0, 9.5), (3L, 40.0, 50.0))
      .toDF("range_id", "lo", "hi")
    val binned = RangeJoin
      .binned(facts, col("l_quantity"), ranges, col("lo"), col("hi"), binWidth = 2.0)
      .groupBy("range_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = facts
      .join(ranges, col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
      .groupBy("range_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(binned == naive)
    assert(naive.values.sum > 0)
  }

  test("binned range join is half-open: lo included, hi excluded, boundary cells covered") {
    val facts = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    // hi=4.0 sits exactly on a cell boundary at binWidth=2 — the value
    // 3.0 lives in hi's cell and must still match.
    val ranges = Seq((10L, 2.0, 4.0)).toDF("range_id", "lo", "hi")
    val got = RangeJoin.binned(facts, col("v"), ranges, col("lo"), col("hi"), binWidth = 2.0)
      .select("v").collect().map(_.getDouble(0)).sorted
    assert(got.toSeq == Seq(2.0, 3.0))
  }

  // --- TextOps.repetitionMetrics ---

  test("repetitionMetrics computes top-word/bigram/dup-trigram fractions") {
    val docs = Seq(
      (1L, "a a a a"),         // top word 4/4, bigrams all "a a", trigrams all dup
      (2L, "a b c d e f g"),   // all distinct, long enough that every
                               // fraction sits under its threshold
                               // (top word 1/7, top bigram 1/6 < 0.18)
      (3L, "x y")              // too short for trigrams
    ).toDF("doc_id", "text")
    val m = TextOps.repetitionMetrics(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getDouble(1) == 1.0)               // top_word_frac
    assert(m(1L).getDouble(2) == 1.0)               // top_bigram_frac
    assert(m(1L).getDouble(3) == 0.5)               // 2 trigrams, 1 distinct
    assert(m(1L).getBoolean(4))                     // repetitive
    assert(m(2L).getDouble(1) == 0.1429)
    assert(m(2L).getDouble(3) == 0.0)
    assert(!m(2L).getBoolean(4))
    assert(m(3L).getDouble(3) == 0.0)               // no trigrams → coalesced 0
  }

  // --- TextOps.chunk ---

  test("chunk covers every token with the requested stride and overlap") {
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val rows = TextOps.chunk(docs, "text", "doc_id", chunkSize = 4, overlap = 1)
      .orderBy("chunk_idx").collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L))
    assert(rows.map(_.getString(3)).toSeq == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(rows.map(_.getLong(2)).toSeq == Seq(4L, 4L, 4L))
  }

  test("chunk emits one chunk for short docs and a partial tail chunk") {
    val docs = Seq((1L, "a b"), (2L, "a b c d e")).toDF("doc_id", "text")
    val byDoc = TextOps.chunk(docs, "text", "doc_id", chunkSize = 4, overlap = 1)
      .collect().groupBy(_.getLong(0))
    assert(byDoc(1L).length == 1 && byDoc(1L).head.getLong(2) == 2L)
    val tail = byDoc(2L).maxBy(_.getLong(1))
    assert(byDoc(2L).length == 2 && tail.getString(3) == "d e")
  }

  // --- TextOps.unigramLogprob ---

  test("unigramLogprob is the mean corpus-unigram ln-probability") {
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    // corpus: a=3, b=1, c=1, total=5
    val m = TextOps.unigramLogprob(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exp1 = (2 * math.log(3 / 5.0) + math.log(1 / 5.0)) / 3
    val exp2 = (math.log(3 / 5.0) + math.log(1 / 5.0)) / 2
    assert(math.abs(m(1L) - exp1) < 1e-3)
    assert(math.abs(m(2L) - exp2) < 1e-3)
  }

  test("bigramLogprob is the mean corpus-bigram conditional ln-probability") {
    // corpus bigrams: "a b" x2, "b a" x1, "b c" x1.
    // c(a ·)=2, c(b ·)=2 → P(b|a)=1, P(a|b)=1/2, P(c|b)=1/2.
    val docs = Seq((1L, "a b a b c"), (2L, "x")).toDF("doc_id", "text")
    val rows = TextOps.bigramLogprob(docs, "text", "doc_id").collect()
    assert(rows.length == 1) // single-token doc has no bigrams
    val r = rows.head
    val exp = (math.log(1.0) + math.log(0.5) + math.log(1.0) + math.log(0.5)) / 4
    assert(r.getLong(0) == 1L && r.getLong(2) == 4L)
    assert(math.abs(r.getDouble(1) - exp) < 1e-3)
  }

  // --- Sampling.packSequences ---

  test("packSequences assigns packs by running token sum and flags straddlers") {
    val docs = Seq(
      ("s", 1L, 100L), ("s", 2L, 100L), ("s", 3L, 100L), // cum 100/200/300
      ("t", 9L, 600L)                                    // own shard, oversized doc
    ).toDF("shard", "id", "n")
    val rows = Sampling.packSequences(docs, "shard", "id", "n", budget = 256)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(3), r.getBoolean(4))).toMap
    assert(rows(("s", 1L)) == ((0L, false)))
    assert(rows(("s", 2L)) == ((0L, false)))   // starts at 200 < 256
    assert(rows(("s", 3L)) == ((0L, true)))    // starts in pack 0, ends in pack 1
    assert(rows(("t", 9L)) == ((0L, true)))    // spans >2 packs, still a straddler
  }

  // --- Sampling.temperatureKeep ---

  test("temperatureKeep flattens source skew toward mass^alpha") {
    val masses = Map("big" -> 1000000L, "small" -> 1000L)
    val df = (1L to 4000L).map(i => (i, if (i <= 2000) "big" else "small"))
      .toDF("id", "source")
    val kept = df.filter(Sampling.temperatureKeep(col("id"), col("source"), masses, 0.5))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // light source keeps rate 1.0 exactly; heavy is cut to
    // (1e6/1e3)^(0.5-1) ≈ 0.0316 of its rows.
    assert(kept("small") == 2000L)
    assert(kept.getOrElse("big", 0L) < 200L && kept.getOrElse("big", 0L) > 10L)
    // alpha=1 is mass-proportional: nobody is dropped.
    val all = df.filter(Sampling.temperatureKeep(col("id"), col("source"), masses, 1.0)).count()
    assert(all == 4000L)
  }

  // --- Dedup.decontaminate ---

  test("decontaminate flags exactly the train docs sharing an n-gram with eval") {
    val evalDocs = Seq((100L, "the quick brown fox jumps over lazy dogs")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "prefix words the quick brown fox jumps tail"), // shares 5-grams
      (2L, "completely different content with no overlap at all"),
      (3L, "the quick brown fox jumps over lazy dogs verbatim copy")
    ).toDF("doc_id", "text")
    val hits = Dedup.decontaminate(train, evalDocs, "text", "doc_id", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1: tokens 3..8 give two 5-gram windows matching eval's
    // "the quick brown fox jumps" (only the first is shared).
    assert(hits.keySet == Set(1L, 3L))
    assert(hits(1L) == 1L)
    assert(hits(3L) >= 4L) // verbatim prefix shares many shingles
  }

  // --- Sampling.capPerGroup ---

  test("capPerGroup keeps the k best-scored rows per group with deterministic ties") {
    val df = Seq(
      ("a", 1L, 0.9), ("a", 2L, 0.5), ("a", 3L, 0.5), ("a", 4L, 0.1),
      ("b", 5L, 0.2)
    ).toDF("g", "id", "score")
    val kept = Sampling.capPerGroup(df, "g", "score", "id", 2)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    // a keeps 0.9 (rank 1) and the TIE at 0.5 won by lower id=2.
    assert(kept == Map(1L -> 1L, 2L -> 2L, 5L -> 1L))
  }

  // --- Geo.mortonKey ---

  test("mortonKey interleaves bits and preserves quadrant locality") {
    val pts = Seq(
      (1L, 0.0, 0.0),     // origin → key 0
      (2L, 499.99, 99.99),// far corner → near max 32-bit key
      (3L, -5.0, 120.0)   // out of frame → clamped, no crash
    ).toDF("id", "x", "y")
    val keys = pts.select(col("id"), Geo.mortonKey(col("x"), col("y"), 0, 0, 500, 100).as("z"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keys(1L) == 0L)
    assert(keys(2L) > (3L << 30)) // top quadrant: both high bits set
    assert(keys(3L) >= 0L && keys(3L) <= 0xFFFFFFFFL)
    // bit interleave sanity: quantized (1, 0) → key 1; (0, 1) → key 2.
    val unit = Seq((1L, 500.0 / 65535 * 1.0001, 0.0), (2L, 0.0, 100.0 / 65535 * 1.0001))
      .toDF("id", "x", "y")
      .select(col("id"), Geo.mortonKey(col("x"), col("y"), 0, 0, 500, 100).as("z"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(unit == Map(1L -> 1L, 2L -> 2L))
  }

  private def dataShuffles(df: org.apache.spark.sql.DataFrame): Int = {
    val plan = df.queryExecution.executedPlan.toString
    "Exchange".r.findAllIn(plan).length -
      "ReusedExchange".r.findAllIn(plan).length -
      "BroadcastExchange".r.findAllIn(plan).length
  }

  test("plan regression: zorder key is map-only, decontaminate broadcasts eval + one agg shuffle") {
    val pts = tables.events.select(col("event_id"), col("value").as("x"),
      (col("value") / 5).as("y"))
    val zorder = pts.select(Geo.mortonKey(col("x"), col("y"), 0, 0, 500, 100).as("z"))
    assert(dataShuffles(zorder) == 0, "morton key must not shuffle")

    val docs = tables.documents
    val decon = Dedup.decontaminate(
      docs.filter(col("doc_id") % 97 =!= 0), docs.filter(col("doc_id") % 97 === 0),
      "text", "doc_id", 5)
    val plan = decon.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastQueryStage"),
      s"eval shingles must broadcast:\n$plan")
    // Two exchanges total: the eval-side distinct (benchmark-sized,
    // feeds the broadcast) and the final per-doc agg. The 100 TB
    // train scan itself must reach the broadcast join unshuffled.
    assert(dataShuffles(decon) <= 2, s"unexpected extra shuffle:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"train join must be broadcast, not SMJ:\n$plan")
  }

  test("bloom decontamination: superset of exact, bounded inflation, no join in the scan") {
    val docs = tables.documents
    val train = docs.filter(col("doc_id") % 97 =!= 0)
    val eval = docs.filter(col("doc_id") % 97 === 0)
    val exact = Dedup.decontaminate(train, eval, "text", "doc_id", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloomed = Dedup.decontaminateBloom(train, eval, "text", "doc_id", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // One-sided error: every truly contaminated doc must surface with
    // AT LEAST its exact shared-shingle count (false negatives are
    // impossible by construction).
    exact.foreach { case (doc, n) =>
      assert(bloomed.contains(doc), s"doc $doc lost by bloom filter")
      assert(bloomed(doc) >= n, s"doc $doc undercounted: ${bloomed(doc)} < $n")
    }
    // False positives stay bounded: at 1% FPR over ~shingle-count
    // probes, flagged mass must not blow up (generous 3× slack on the
    // binomial tail).
    val exactMass = exact.values.sum.toDouble
    val bloomMass = bloomed.values.sum.toDouble
    val probes = train
      .select(explode(graft.functions.NgramXxHashes(col("text"), 5)).as("sh"))
      .count().toDouble
    assert(bloomMass - exactMass <= 3.0 * 0.01 * probes + 50,
      s"bloom inflation too high: $bloomMass vs $exactMass over $probes probes")

    // Scale shape: the flagged scan is a pure filter — no join, no
    // broadcast of the eval set, exactly one exchange (the final agg).
    val plan = Dedup.decontaminateBloom(train, eval, "text", "doc_id", 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"bloom path must not join:\n$plan")
    assert(dataShuffles(Dedup.decontaminateBloom(train, eval, "text", "doc_id", 5)) <= 1,
      s"bloom scan must only shuffle for the final agg:\n$plan")
  }

  test("BloomContainsLong: members always hit, non-member FPR near the configured rate") {
    import org.apache.spark.util.sketch.BloomFilter
    val members = (1L to 5000L).map(_ * 7919L)
    val bf = BloomFilter.create(members.size.toLong, 0.01)
    members.foreach(bf.putLong)
    val bytes = { val b = new java.io.ByteArrayOutputStream(); bf.writeTo(b); b.toByteArray }

    val df = members.toDF("v")
      .select(graft.functions.BloomContainsLong(col("v"), bytes).as("hit"))
    assert(df.collect().forall(_.getBoolean(0)), "bloom must never miss a member")

    val nonMembers = (1L to 20000L).map(_ * 7919L + 3L)
    val fps = nonMembers.toDF("v")
      .select(graft.functions.BloomContainsLong(col("v"), bytes).as("hit"))
      .filter(col("hit")).count()
    assert(fps.toDouble / nonMembers.size <= 0.05,
      s"false-positive rate ${fps.toDouble / nonMembers.size} far above configured 0.01")
  }

  // --- SnapshotDiff ---

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    val prev = Seq((1L, "same"), (2L, "old"), (3L, "gone")).toDF("id", "text")
    val cur = Seq((1L, "same"), (2L, "new"), (4L, "fresh")).toDF("id", "text")
    val got = SnapshotDiff.diff(prev, cur, "id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("snapshotDiff multi-column hash does not alias across column boundaries") {
    // ("ab", "c") vs ("a", "bc") concatenate identically without a
    // separator — must be reported as changed.
    val prev = Seq((1L, "ab", "c")).toDF("id", "t1", "t2")
    val cur = Seq((1L, "a", "bc")).toDF("id", "t1", "t2")
    val got = SnapshotDiff.diff(prev, cur, "id", Seq("t1", "t2")).collect()
    assert(got.length == 1 && got.head.getString(1) == "changed")
  }

  // --- Multimodal.featureNearDup ---

  test("featureNearDup pairs same-block media within the intensity epsilon") {
    val feats = Seq(
      (1L, 4, 4, 1, 97.0),   // block (4,4,1)
      (2L, 4, 4, 1, 97.25),  // same block, delta 0.25 -> pairs with 1
      (3L, 4, 4, 1, 122.0),  // same block, outside eps
      (4L, 2, 2, 1, 97.0)    // different block
    ).toDF("media_id", "width", "height", "n_frames", "mean_intensity")
    val pairs = Multimodal.featureNearDup(feats, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("temperatureKeep decisions are stable under repartitioning") {
    val masses = Map("a" -> 500L, "b" -> 50L)
    val df = (1L to 500L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "source")
    val k1 = df.filter(Sampling.temperatureKeep(col("id"), col("source"), masses, 0.7))
      .collect().map(_.getLong(0)).toSet
    val k2 = df.repartition(7)
      .filter(Sampling.temperatureKeep(col("id"), col("source"), masses, 0.7))
      .collect().map(_.getLong(0)).toSet
    assert(k1 == k2 && k1.nonEmpty)
  }
}
