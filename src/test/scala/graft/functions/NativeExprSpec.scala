package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins each native codegen expression to the declarative HOF
  * formulation it replaces — the native path must be a pure
  * performance substitution, never a semantic fork.
  */
class NativeExprSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, ""),
    (3L, "one"),
    (4L, "  Tabs\tand\nNEWLINES  mixed \t spacing today "),
    (5L, "répétition unicode çà et là répétition unicode çà encore")
  ).toDF("id", "text")

  test("WordBigrams matches the HOF transform-over-slices formulation") {
    val toks = split(lower(trim(col("text"))), "\\s+")
    val hofArr = when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", slice(toks, i, lit(2)))))
    val hof = docs.select($"id", hofArr.as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val native = docs.select($"id", WordBigrams(col("text")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(hof == native)
  }

  test("CosineSim matches the HOF fold formulation bit-for-bit") {
    import graft.operators.Similarity
    val vecs = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)),
      (Array(0.1f, -0.7f, 0.33f), Array(0.9f, 0.02f, -0.5f)),
      (Array(1.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f))
    ).toDF("a", "b")
    val out = vecs.select(
      Similarity.cosineHof($"a", $"b").as("hof"),
      Similarity.cosine($"a", $"b").as("native")).collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1))) // exact, not approx
  }

  test("WkbFromXY round-trips through WkbPointXY") {
    val pts = Seq((1.5, -2.25), (0.0, 0.0), (-179.9, 89.9)).toDF("x", "y")
    val rt = pts
      .select(Wkb.wkbPointXY(Wkb.wkbFromXY($"x", $"y")).as("p"), $"x", $"y")
      .select($"p.x" === $"x" && $"p.y" === $"y")
      .collect()
    assert(rt.forall(_.getBoolean(0)))
  }
}
