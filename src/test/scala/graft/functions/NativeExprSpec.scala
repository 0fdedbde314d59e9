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

  private def coordsDf = Seq(
    (1L, Seq((0.0, 0.0), (3.0, 0.0), (3.0, 4.0))),
    (2L, Seq((1.5, -2.25), (1.5, -2.25), (7.0, 8.0), (9.0, -1.0))),
    (3L, Seq((-179.9, 89.9), (179.9, -89.9)))
  ).toDF("id", "raw")
    .select($"id", transform($"raw", p =>
      struct(p.getField("_1").as("x"), p.getField("_2").as("y"))).as("pts"))

  test("WkbLineFromCoords → WkbCoords round-trips; header count matches") {
    val rt = coordsDf.select(
      $"id", $"pts",
      Wkb.wkbCoords(Wkb.wkbLineFromCoords($"pts")).as("back"),
      Wkb.wkbNumPoints(Wkb.wkbLineFromCoords($"pts")).as("np"),
      Wkb.wkbGeometryType(Wkb.wkbLineFromCoords($"pts")).as("gt"),
      size($"pts").as("n")).collect()
    rt.foreach { r =>
      assert(r.getSeq[Any](1) == r.getSeq[Any](2), s"row ${r.getLong(0)}")
      assert(r.getInt(3) == r.getInt(5) && r.getInt(4) == 2)
    }
  }

  test("WkbPolygonFromCoords closes an open ring exactly once") {
    val rt = coordsDf.filter($"id" === 1L).select(
      Wkb.wkbCoords(Wkb.wkbPolygonFromCoords($"pts")).as("back"),
      Wkb.wkbNumPoints(Wkb.wkbPolygonFromCoords($"pts")).as("np"),
      Wkb.wkbGeometryType(Wkb.wkbPolygonFromCoords($"pts")).as("gt"),
      // encoding the already-closed decode output must NOT append again
      Wkb.wkbNumPoints(Wkb.wkbPolygonFromCoords(
        Wkb.wkbCoords(Wkb.wkbPolygonFromCoords($"pts")))).as("np2")).head()
    val back = rt.getSeq[org.apache.spark.sql.Row](0)
    assert(back.length == 4 && back.head == back.last)
    assert(rt.getInt(1) == 4 && rt.getInt(2) == 3 && rt.getInt(3) == 4)
  }

  test("WkbCoords honors the big-endian byte-order marker") {
    // Hand-build a BE LineString: 00 | 00000002 | 00000002 | 2 pts
    val buf = java.nio.ByteBuffer.allocate(9 + 32).order(java.nio.ByteOrder.BIG_ENDIAN)
    buf.put(0.toByte).putInt(2).putInt(2)
      .putDouble(1.0).putDouble(2.0).putDouble(-3.5).putDouble(4.25)
    val df = Seq(Tuple1(buf.array())).toDF("g")
    val out = df.select(Wkb.wkbCoords($"g").as("c"), Wkb.wkbNumPoints($"g").as("np")).head()
    val c = out.getSeq[org.apache.spark.sql.Row](0)
    assert(out.getInt(1) == 2 && c.map(r => (r.getDouble(0), r.getDouble(1))) ==
      Seq((1.0, 2.0), (-3.5, 4.25)))
  }

  test("WkbCoords / WkbNumPoints null (not throw) on malformed or unsupported blobs") {
    val blobs = Seq(
      Array[Byte](),                       // empty
      Array[Byte](1, 2, 0, 0),             // truncated header
      Array[Byte](1, 7, 0, 0, 0, 9, 9),    // GeometryCollection: unsupported
      { // LineString header claiming more points than the buffer holds
        val b = java.nio.ByteBuffer.allocate(9).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put(1.toByte).putInt(2).putInt(1000); b.array()
      })
    val df = blobs.map(Tuple1(_)).toDF("g")
    val out = df.select(Wkb.wkbCoords($"g"), Wkb.wkbNumPoints($"g")).collect()
    out.foreach(r => assert(r.isNullAt(0) && r.isNullAt(1)))
  }
}
