package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GeoSpec extends SparkSpec {
  import spark.implicits._

  test("haversine matches known distance (Paris-London ~343.5 km)") {
    val df = Seq((2.3522, 48.8566, -0.1276, 51.5072)).toDF("lon1", "lat1", "lon2", "lat2")
    val km = df.select(Geo.haversineKm(col("lon1"), col("lat1"), col("lon2"), col("lat2")))
      .head().getDouble(0)
    assert(math.abs(km - 343.5) < 1.0)
  }

  test("haversine is zero for identical points and symmetric") {
    val df = Seq((10.0, 20.0, 30.0, 40.0)).toDF("a", "b", "c", "d")
    val z = df.select(Geo.haversineKm(col("a"), col("b"), col("a"), col("b"))).head().getDouble(0)
    assert(z == 0.0)
    val ab = df.select(Geo.haversineKm(col("a"), col("b"), col("c"), col("d"))).head().getDouble(0)
    val ba = df.select(Geo.haversineKm(col("c"), col("d"), col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(ab - ba) < 1e-9)
  }

  test("lineLength sums consecutive segments in order") {
    val df = Seq((1L, 1L, 0.0, 0.0), (1L, 2L, 3.0, 4.0), (1L, 3L, 3.0, 8.0))
      .toDF("k", "o", "x", "y")
    val out = Geo.lineLength(df, "k", "o", "x", "y", 0.0).collect()
    assert(out.length == 1 && out(0).getDouble(1) == 9.0) // 5 + 4
  }

  test("lineLength drops degenerate polylines") {
    val df = Seq((1L, 1L, 0.0, 0.0), (1L, 2L, 0.0, 0.0)).toDF("k", "o", "x", "y")
    assert(Geo.lineLength(df, "k", "o", "x", "y", 1e-10).count() == 0)
  }

  test("polygonArea and polygonCentroid on the unit square") {
    // CCW unit square: area +1, centroid (0.5, 0.5)
    val ring = Seq(Tuple1(Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0))))
      .toDF("raw")
      .withColumn("ring", transform(col("raw"), p =>
        struct(p.getField("_1").as("x"), p.getField("_2").as("y"))))
    val r = ring.select(
      Geo.polygonArea(col("ring")).as("a"),
      Geo.polygonCentroid(col("ring")).as("c")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    val c = r.getStruct(1)
    assert(math.abs(c.getDouble(0) - 0.5) < 1e-12 && math.abs(c.getDouble(1) - 0.5) < 1e-12)
  }

  test("polygonCentroid is the area centroid, not the vertex mean") {
    // L-shaped hexagon: vertex mean != area centroid
    val pts = Seq((0.0, 0.0), (2.0, 0.0), (2.0, 1.0), (1.0, 1.0), (1.0, 2.0), (0.0, 2.0))
    val ring = Seq(Tuple1(pts)).toDF("raw")
      .withColumn("ring", transform(col("raw"), p =>
        struct(p.getField("_1").as("x"), p.getField("_2").as("y"))))
    val r = ring.select(Geo.polygonArea(col("ring")), Geo.polygonCentroid(col("ring"))).head()
    assert(math.abs(r.getDouble(0) - 3.0) < 1e-12) // area of the L
    val c = r.getStruct(1)
    // composite: 2x2 square minus top-right 1x1 -> centroid (2.5/3, 2.5/3) ≈ 0.833; vertex mean is 1.0
    assert(math.abs(c.getDouble(0) - 2.5 / 3) < 1e-9 && math.abs(c.getDouble(1) - 2.5 / 3) < 1e-9)
  }

  test("gridJoin equals the naive cross-product containment join") {
    val pts = tables.events.select(
      col("event_id"), col("value").as("x"), col("user_id").cast("double").as("y"))
    val boxes = tables.region.select(
      col("r_regionkey"),
      (col("r_regionkey") * 30.0).as("bxmin"), (col("r_regionkey") * 100.0).as("bymin"),
      (col("r_regionkey") * 30.0 + 80.0).as("bxmax"), (col("r_regionkey") * 100.0 + 300.0).as("bymax"))
    val grid = Geo.gridJoin(pts, boxes, "x", "y", "bxmin", "bymin", "bxmax", "bymax", 17.0)
      .select("event_id", "r_regionkey")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val naive = pts.crossJoin(boxes)
      .filter(col("x") >= col("bxmin") && col("x") <= col("bxmax") &&
        col("y") >= col("bymin") && col("y") <= col("bymax"))
      .select("event_id", "r_regionkey")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(grid == naive && grid.nonEmpty)
  }

  test("bboxAgg computes group bounds") {
    val out = Geo.bboxAgg(
      tables.events.select(col("event_type"), col("value").as("x"), col("user_id").cast("double").as("y")),
      Seq("event_type"), "x", "y").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(3) && r.getDouble(2) <= r.getDouble(4))
    }
  }

  test("pointInRing: convex, concave, and outside cases") {
    import spark.implicits._
    // Concave chevron: notch dips to (5, 4) at the top center.
    val chevron = Geo.ringLit(Seq((0.0, 0.0), (10.0, 0.0), (10.0, 8.0), (5.0, 4.0), (0.0, 8.0)))
    val cases = Seq(
      (1L, 2.0, 2.0, true),   // plainly inside
      (2L, 5.0, 6.0, false),  // inside bbox but in the concave notch
      (3L, 5.0, 1.0, true),   // below the notch, inside
      (4L, 11.0, 4.0, false), // right of polygon
      (5L, 5.0, -1.0, false)  // below polygon
    ).toDF("id", "x", "y", "expected")
    val got = cases.select($"id", Geo.pointInRing($"x", $"y", chevron).as("in"), $"expected")
      .collect()
    got.foreach(r => assert(r.getBoolean(1) == r.getBoolean(2), s"point ${r.getLong(0)}"))
  }

  test("normalizeRing: closing vertex dropped, consecutive dups collapsed, winding forced CCW") {
    import spark.implicits._
    // clockwise square, explicitly closed, with a doubled vertex
    val ring = Geo.ringLit(Seq(
      (0.0, 0.0), (0.0, 4.0), (0.0, 4.0), (4.0, 4.0), (4.0, 0.0), (0.0, 0.0)))
    val out = Seq(1).toDF("i").select(
      Geo.normalizeRing(ring).as("n"),
      Geo.ringIsValid(ring).as("valid"),
      round(Geo.polygonArea(Geo.normalizeRing(ring)), 4).as("area"))
      .head()
    val n = out.getSeq[org.apache.spark.sql.Row](0)
    assert(n.length == 4)                 // 6 raw -> closing + dup dropped
    assert(out.getBoolean(1))
    assert(out.getDouble(2) == 16.0)      // positive = CCW after reversal
  }

  test("ringIsValid rejects degenerate rings") {
    import spark.implicits._
    val line = Geo.ringLit(Seq((0.0, 0.0), (1.0, 1.0), (2.0, 2.0))) // zero area
    val tiny = Geo.ringLit(Seq((0.0, 0.0), (1.0, 0.0)))             // < 3 vertices
    val out = Seq(1).toDF("i")
      .select(Geo.ringIsValid(line).as("a"), Geo.ringIsValid(tiny).as("b")).head()
    assert(!out.getBoolean(0) && !out.getBoolean(1))
  }

  test("pointInPolygon honors interior rings (holes)") {
    import spark.implicits._
    val outer = Geo.ringLit(Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)))
    val hole  = Geo.ringLit(Seq((4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0)))
    val cases = Seq(
      (1L, 2.0, 2.0, true),  // in outer, outside hole
      (2L, 5.0, 5.0, false), // inside the hole
      (3L, 12.0, 5.0, false) // outside everything
    ).toDF("id", "x", "y", "expected")
    val got = cases
      .select($"id", Geo.pointInPolygon($"x", $"y", outer, Seq(hole)).as("in"), $"expected")
      .collect()
    got.foreach(r => assert(r.getBoolean(1) == r.getBoolean(2), s"point ${r.getLong(0)}"))
  }
}
