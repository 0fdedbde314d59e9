package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private val quotes = Seq( // (key, time, price)
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
    ("B", 15L, 10.0)
  ).toDF("qk", "qt", "price")

  private val trades = Seq( // (key, time)
    ("A", 5L), ("A", 20L), ("A", 25L), ("B", 14L), ("C", 100L)
  ).toDF("tk", "tt")

  test("lastBefore picks the most recent right row at or before left time") {
    val out = AsOfJoin.lastBefore(trades, quotes, "tk", "qk", "tt", "qt", Seq("price"))
      .collect().map(r => (r.getString(0), r.getLong(1), Option(r.get(2)))).toSet
    assert(out == Set(
      ("A", 5L, None),          // before any quote
      ("A", 20L, Some(2.0)),    // tie: quote at same ts counts
      ("A", 25L, Some(2.0)),
      ("B", 14L, None),
      ("C", 100L, None)))       // key with no quotes at all
  }

  test("null payload FIELD in the matching right row is preserved (regression: per-column stitching)") {
    val rights = Seq(
      ("A", 1L, Option("a"), Option("x")),
      ("A", 5L, None, Option("y"))).toDF("qk", "qt", "colA", "colB")
    val lefts = Seq(("A", 6L)).toDF("tk", "tt")
    val r = AsOfJoin.lastBefore(lefts, rights, "tk", "qk", "tt", "qt", Seq("colA", "colB")).head()
    // must take BOTH fields from the t=5 row: colA NULL, colB "y"
    assert(r.isNullAt(2) && r.getString(3) == "y")
  }

  test("connectedComponents labels reachable nodes with min id") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (7L, 3L)).toDF("a", "b")
    val out = Dedup.connectedComponents(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("connectedComponents converges on a chain longer than one hop") {
    val chain = (1L to 12L).sliding(2).map(s => (s.head, s.last)).toSeq.toDF("a", "b")
    val out = Dedup.connectedComponents(chain, "a", "b")
      .collect().map(r => r.getLong(1)).toSet
    assert(out == Set(1L))
  }

  test("connectedComponents is logarithmic, not diameter-bound, on an adversarial chain") {
    // A 256-node path has diameter 255: min-label propagation needs
    // ~255 rounds; large-star/small-star must finish in O(log n).
    val n = 256L
    val chain = (1L until n).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(chain, "a", "b", maxIter = 20)
    val comps = labels.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(comps.length == n.toInt && comps.forall(_._2 == 1L))
    assert(rounds <= 10, s"expected O(log n) rounds, took $rounds")
  }
}
