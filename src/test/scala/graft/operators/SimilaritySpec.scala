package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f), Array(0.0f, 1.0f)))
      .toDF("a", "b", "c")
    val r = df.select(
      Similarity.cosine(col("a"), col("b")),
      Similarity.cosine(col("a"), col("c"))).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12 && math.abs(r.getDouble(1)) < 1e-12)
  }

  test("cosineTopK returns k ranked neighbors per query") {
    val base = tables.embeddings
    val queries = base.filter(col("vec_id") < 3)
    val out = Similarity.cosineTopK(base, queries, "vec_id", "embedding", k = 4).collect()
    assert(out.length == 12)
    val byQuery = out.groupBy(_.getLong(0))
    byQuery.values.foreach { rows =>
      val scores = rows.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(scores.zip(scores.tail).forall { case (hi, lo) => hi >= lo })
    }
  }

  test("lshAnn achieves reasonable recall against brute force") {
    val base = tables.embeddings
    val queries = base.filter(col("vec_id") < 10)
    val exact = Similarity.cosineTopK(base, queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshAnn(base, queries, "vec_id", "embedding", 64, planes = 4, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = Similarity.lshAnn(base, queries, "vec_id", "embedding", 64, planes = 4, k = 5, tables = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // single-table 4-plane LSH on random embeddings: expect partial recall
    assert(recall > 0.1, s"recall=$recall")
    // every approx result must be a genuine in-bucket cosine (sanity: subset scored correctly)
    assert(approx.nonEmpty)
    // multi-table LSH: more independent collision chances -> recall
    // must not drop, and on this dataset strictly improves
    val multiRecall = (exact & multi).size.toDouble / exact.size
    assert(multiRecall >= recall, s"multi=$multiRecall single=$recall")
    assert(multiRecall > recall, s"expected strict improvement, multi=$multiRecall single=$recall")
  }

  test("kmeans separates two obvious clusters and assigns every vector") {
    // Two tight groups on opposite axes; seeds (ids 0,1) land one in
    // each group, so one Lloyd round must separate them perfectly.
    val rows = (0 until 10).map { i =>
      val v = if (i % 2 == 0) Array(1.0f, 0.05f * i) else Array(0.05f * i, 1.0f)
      (i.toLong, v)
    }
    val df = rows.toDF("id", "vec")
    val out = Similarity.kmeans(df, "id", "vec", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 10)
    val evens = (0 until 10 by 2).map(i => out(i.toLong)).toSet
    val odds = (1 until 10 by 2).map(i => out(i.toLong)).toSet
    assert(evens.size == 1 && odds.size == 1 && evens != odds)
  }

  test("kmeans is deterministic across repartitioning") {
    val base = tables.embeddings
    val a = Similarity.kmeans(base, "vec_id", "embedding", k = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val b = Similarity.kmeans(base.repartition(7), "vec_id", "embedding", k = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(a.sameElements(b))
    assert(a.map(_._2).distinct.length == 4) // all clusters populated
  }

  test("semanticPairsHier: exact-precision pairs, recall vs flat, deterministic") {
    val emb = tables.embeddings
    val n = emb.count()
    // Brute-force truth: every pair ≥ threshold.
    val thr = 0.35
    val truth = emb.as("a").join(emb.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .withColumn("c", round(Similarity.cosine(col("a.embedding"), col("b.embedding")), 4))
      .filter(col("c") >= thr)
      .select(col("a.vec_id"), col("b.vec_id"), col("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val target = 64
    val hier = Similarity
      .semanticPairsHier(emb, "vec_id", "embedding", iters = 2, threshold = thr, targetClusterSize = target)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // Exact precision: every emitted pair is a true pair with the
    // exact brute-force cosine (blocking can lose pairs, never alter
    // or invent scores).
    hier.foreach { case (pair, c) =>
      assert(truth.get(pair).contains(c), s"pair $pair score $c not in truth")
    }
    // Recall comparable to the flat SemDeDup blocking at the same
    // target cell size (both lose cross-cell pairs by design).
    val flat = Similarity
      .semanticPairsAuto(emb, "vec_id", "embedding", iters = 2, threshold = thr, targetClusterSize = target)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hRecall = hier.keySet.count(truth.contains).toDouble / math.max(1, truth.size)
    val fRecall = flat.count(truth.contains).toDouble / math.max(1, truth.size)
    assert(truth.nonEmpty && hier.nonEmpty, s"degenerate fixture: truth=${truth.size}")
    assert(hRecall >= fRecall * 0.5,
      s"hier recall $hRecall collapsed vs flat $fRecall")
    // Deterministic across repartitioning (same conventions as flat).
    val again = Similarity
      .semanticPairsHier(emb.repartition(7), "vec_id", "embedding", iters = 2,
        threshold = thr, targetClusterSize = target)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(again == hier)
    assert(n > 0)
  }

  test("centroids: one row per label, dim = vector width") {
    val out = Similarity.centroids(tables.embeddings, "label", "embedding").collect()
    assert(out.length == 10)
    assert(out.forall(_.getLong(2) == 64L))
    assert(out.forall(_.getDouble(1) >= 0.0))
  }

  test("ivfAnnTrained: nprobe=k degrades to exact brute force; recall grows with nprobe") {
    val base = tables.embeddings
    val queries = base.filter(col("vec_id") < 5)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("base_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.cosineTopK(base, queries, "vec_id", "embedding", k = 5))
    // probing every trained cell = a full scan: must equal brute force
    val full = pairs(Similarity.ivfAnnTrained(base, queries, "vec_id", "embedding",
      k = 8, iters = 2, nprobe = 8, topK = 5))
    assert(full == exact, "nprobe=k trained IVF must reproduce the exact top-k")
    val r1 = (pairs(Similarity.ivfAnnTrained(base, queries, "vec_id", "embedding",
      k = 8, iters = 2, nprobe = 1, topK = 5)) intersect exact).size
    val r4 = (pairs(Similarity.ivfAnnTrained(base, queries, "vec_id", "embedding",
      k = 8, iters = 2, nprobe = 4, topK = 5)) intersect exact).size
    assert(r1 <= r4, s"recall must be monotone in nprobe ($r1 > $r4)")
    assert(r4 > 0, "degenerate fixture: nprobe=4 recalled nothing")
  }
}
