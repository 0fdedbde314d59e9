package graft.`export`

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Wkb
import graft.sources.ShapefileReader

/** H18 (round 10): ESRI Shapefile writer — the reference's `shp`
  * direct-export route, written pure-JVM from the public 1998 spec.
  * Validation is an INDEPENDENT byte-level reader in this spec
  * (implemented from the spec document, not the writer's code):
  * header magic/type/bbox, .shx offsets resolving every .shp record,
  * .dbf field descriptors + fixed-width values, geometry round-trip,
  * polygon ring orientation (outer CW per spec even when the input
  * WKB ring was CCW), and Exporter format routing.
  */
class ShapefileSpec extends SparkSpec {
  import spark.implicits._

  private def tmpBase(name: String): String = {
    val d = Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    s"$d/layer"
  }

  // ---- independent minimal readers (per spec, test-side only) ----

  private def le(b: Array[Byte], off: Int, len: Int): ByteBuffer = {
    val buf = ByteBuffer.wrap(b, off, len).slice()
    buf.order(ByteOrder.LITTLE_ENDIAN)
    buf
  }
  private def be(b: Array[Byte], off: Int, len: Int): ByteBuffer =
    ByteBuffer.wrap(b, off, len).slice() // default BE

  private def bytes(path: String): Array[Byte] = Files.readAllBytes(Paths.get(path))

  test("points: header, index, dbf and geometry all verify against the spec") {
    val base = tmpBase("shp-points")
    val df = Seq((1L, "alpha", -10.0, -5.0), (2L, "beta", 30.0, 40.0))
      .toDF("id", "name", "x", "y")
      .select($"id", $"name", Wkb.wkbFromXY($"x", $"y").as("geom"))
    val res = Shapefile.write(df, "geom", base)
    assert(res.rows == 2L && res.shapeType == 1)
    assert(res.bbox == ((-10.0, -5.0, 30.0, 40.0)))

    val shp = bytes(s"$base.shp")
    // main header: magic 9994 BE, version 1000 LE, type 1 LE, bbox LE
    assert(be(shp, 0, 4).getInt == 9994)
    assert(be(shp, 24, 4).getInt * 2 == shp.length, "declared length == file length")
    assert(le(shp, 28, 8).getInt == 1000)
    assert(le(shp, 32, 4).getInt == 1)
    assert(le(shp, 36, 32).getDouble == -10.0)
    val shx = bytes(s"$base.shx")
    assert(be(shx, 0, 4).getInt == 9994)
    assert(shx.length == 100 + 8 * 2)
    // every shx entry points at a record whose number and type parse
    (0 until 2).foreach { i =>
      val off = be(shx, 100 + 8 * i, 4).getInt * 2
      val len = be(shx, 100 + 8 * i + 4, 4).getInt * 2
      assert(be(shp, off, 4).getInt == i + 1, "record number")
      assert(be(shp, off + 4, 4).getInt * 2 == len, "record content length")
      assert(le(shp, off + 8, 4).getInt == 1, "point record type")
    }
    // second point's coordinates
    val off2 = be(shx, 108, 4).getInt * 2
    assert(le(shp, off2 + 12, 16).getDouble == 30.0)
    assert(le(shp, off2 + 20, 8).getDouble == 40.0)

    // .dbf: version, record count, descriptors, values
    val dbf = bytes(s"$base.dbf")
    assert(dbf(0) == 0x03)
    assert(le(dbf, 4, 4).getInt == 2, "dbf record count")
    val headerSize = le(dbf, 8, 2).getShort
    val recordSize = le(dbf, 10, 2).getShort
    assert(headerSize == 32 + 32 * 2 + 1)
    assert(recordSize == 1 + 18 + 64)
    val f1name = new String(dbf.slice(32, 42), "US-ASCII").takeWhile(_ != 0)
    assert(f1name == "id" && dbf(32 + 11).toChar == 'N')
    val f2name = new String(dbf.slice(64, 74), "US-ASCII").takeWhile(_ != 0)
    assert(f2name == "name" && dbf(64 + 11).toChar == 'C')
    val rec0 = new String(dbf.slice(headerSize, headerSize + recordSize), "US-ASCII")
    assert(rec0.startsWith(" "))
    assert(rec0.substring(1, 19).trim == "1")
    assert(rec0.substring(19).trim == "alpha")
    assert(dbf.last == 0x1A)

    // sidecars
    assert(new String(bytes(s"$base.prj"), "US-ASCII").contains("GCS_WGS_1984"))
    assert(new String(bytes(s"$base.cpg"), "US-ASCII") == "UTF-8")
  }

  test("polygon: outer ring re-oriented clockwise; polyline round-trips") {
    val base = tmpBase("shp-poly")
    // CCW square in WKB (shoelace > 0) — the spec demands CW on disk
    val df = Seq((7L, Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))))
      .toDF("id", "pts")
      .select($"id",
        Wkb.wkbPolygonFromCoords(transform($"pts",
          p => struct(p.getField("_1").as("x"), p.getField("_2").as("y")))).as("geom"))
    val res = Shapefile.write(df, "geom", base)
    assert(res.shapeType == 5)
    val shp = bytes(s"$base.shp")
    val content = le(shp, 108, shp.length - 108)
    assert(content.getInt == 5)
    // bbox
    assert(content.getDouble == 0.0 && content.getDouble == 0.0 &&
      content.getDouble == 4.0 && content.getDouble == 4.0)
    val nParts = content.getInt
    val nPts = content.getInt
    assert(nParts == 1 && nPts == 5)
    assert(content.getInt == 0) // part start
    val pts = Array.fill(nPts)((content.getDouble, content.getDouble))
    // CW: shoelace sum < 0
    val area2 = pts.indices.map { i =>
      val (x1, y1) = pts(i); val (x2, y2) = pts((i + 1) % nPts)
      x1 * y2 - x2 * y1
    }.sum
    assert(area2 < 0, s"outer ring must be clockwise, area2=$area2")

    val base2 = tmpBase("shp-line")
    val dfl = Seq((1L, Seq((0.0, 1.0), (2.0, 3.0), (4.0, 5.0))))
      .toDF("id", "pts")
      .select($"id",
        Wkb.wkbLineFromCoords(transform($"pts",
          p => struct(p.getField("_1").as("x"), p.getField("_2").as("y")))).as("geom"))
    val resl = Shapefile.write(dfl, "geom", base2)
    assert(resl.shapeType == 3 && resl.bbox == ((0.0, 1.0, 4.0, 5.0)))
    val shpl = bytes(s"$base2.shp")
    val cl = le(shpl, 108, shpl.length - 108)
    assert(cl.getInt == 3)
    cl.position(cl.position() + 32) // skip bbox
    assert(cl.getInt == 1 && cl.getInt == 3)
    assert(cl.getInt == 0)
    assert(cl.getDouble == 0.0 && cl.getDouble == 1.0)
  }

  test("Exporter routes .shp and mixed shape types fail typed") {
    val base = tmpBase("shp-route")
    // geometry passed as a computed column (the Exporter convention);
    // remaining frame columns are the dBase attributes
    val df = Seq((1L, 2.0, 3.0)).toDF("id", "x", "y")
    Exporter.write(df, s"$base.shp", ExportFormat.Shp,
      geometryWkb = Some(Wkb.wkbFromXY($"x", $"y")))
    assert(Files.exists(Paths.get(s"$base.shp")))
    assert(Files.exists(Paths.get(s"$base.dbf")))
    assert(ExportFormat.fromPath("x/y/layer.shp") == ExportFormat.Shp)

    val mixed = Seq((1L, 2.0, 3.0)).toDF("id", "x", "y")
      .select($"id", Wkb.wkbFromXY($"x", $"y").as("g"))
      .unionByName(
        Seq((2L, Seq((0.0, 1.0), (2.0, 3.0)))).toDF("id", "pts")
          .select($"id",
            Wkb.wkbLineFromCoords(transform($"pts",
              p => struct(p.getField("_1").as("x"), p.getField("_2").as("y")))).as("g")))
    val e = intercept[graft.ExportError] {
      Shapefile.write(mixed, "g", tmpBase("shp-mixed"))
    }
    assert(e.getMessage.contains("mixed shape types"))
  }

  test("Exporter strips an upper-case .SHP extension before naming sidecars") {
    val d = Files.createTempDirectory("shp-case")
    d.toFile.deleteOnExit()
    val df = Seq((1L, 2.0, 3.0)).toDF("id", "x", "y")
    Exporter.write(df, s"$d/LAYER.SHP", ExportFormat.Shp,
      geometryWkb = Some(Wkb.wkbFromXY($"x", $"y")))
    assert(Files.exists(Paths.get(s"$d/LAYER.shp")))
    assert(Files.exists(Paths.get(s"$d/LAYER.dbf")))
    assert(!Files.exists(Paths.get(s"$d/LAYER.SHP.shp")))
  }

  test("DBF integer overflow gets asterisk fill, not silent MSD truncation") {
    val base = tmpBase("shp-int-overflow")
    // |v| >= 1e18: 19 significant digits exceed the N-field width 18.
    val df = Seq((-1234567890123456789L, 2.0, 3.0), (42L, 4.0, 5.0))
      .toDF("big", "x", "y")
      .select($"big", Wkb.wkbFromXY($"x", $"y").as("geom"), $"x", $"y")
    Shapefile.write(df.select($"big", $"geom"), "geom", base)
    val dbf = bytes(s"$base.dbf")
    val headerSize = le(dbf, 8, 2).getShort
    val rec0 = new String(dbf, headerSize + 1, 18, "US-ASCII")
    val rec1 = new String(dbf, headerSize + 1 + 19, 18, "US-ASCII")
    assert(rec0 == "*" * 18, s"overflowed long must render as asterisks, got '$rec0'")
    assert(rec1.trim == "42")
  }

  test("ShapefileReader round-trips points, integers, doubles, strings and nulls") {
    val base = tmpBase("shp-reader-rt")
    val df = Seq(
      (1L, "alpha", Some(2.5), -10.5, -5.25),
      (2L, null.asInstanceOf[String], Some(-0.125), 30.0, 40.0),
      (3L, "gamma", None, 0.0, 0.0))
      .toDF("id", "name", "score", "x", "y")
      .select($"id", $"name", $"score", Wkb.wkbFromXY($"x", $"y").as("geom"))
    Shapefile.write(df, "geom", base)
    val back = ShapefileReader.read(spark, base)
      .select($"id", $"name", $"score", Wkb.wkbPointXY($"geometry").as("p"))
      .collect().map(r => (r.getLong(0),
        Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        r.getStruct(3).getDouble(0), r.getStruct(3).getDouble(1)))
      .sortBy(_._1)
    assert(back.toSeq == Seq(
      (1L, Some("alpha"), Some(2.5), -10.5, -5.25),
      (2L, None, Some(-0.125), 30.0, 40.0),
      (3L, Some("gamma"), None, 0.0, 0.0)))
  }

  test("ShapefileReader round-trips polygons through WKB") {
    val base = tmpBase("shp-reader-poly")
    val ring = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0))
    val df = Seq((1L, ring)).toDF("id", "pts")
      .select($"id",
        Wkb.wkbPolygonFromCoords(transform($"pts",
          p => struct(p.getField("_1").as("x"), p.getField("_2").as("y")))).as("geom"))
    Shapefile.write(df, "geom", base)
    val back = ShapefileReader.read(spark, base)
      .select(Wkb.wkbGeometryType($"geometry").as("t"),
        Wkb.wkbNumPoints($"geometry").as("n"))
      .collect()(0)
    assert(back.getInt(0) == 3 && back.getInt(1) == 5)
  }

  test("DBF field names colliding at the 10-char limit fail typed") {
    val df = Seq((1L, 1L, 2.0, 3.0))
      .toDF("measurement_a", "measurement_b", "x", "y")
      .select($"measurement_a", $"measurement_b",
        Wkb.wkbFromXY($"x", $"y").as("geom"))
    val e = intercept[graft.ExportError] {
      Shapefile.write(df, "geom", tmpBase("shp-name-collide"))
    }
    assert(e.getMessage.contains("collide"))
  }
}
