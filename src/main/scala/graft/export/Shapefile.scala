package graft.`export`

import java.io.{BufferedOutputStream, FileOutputStream, RandomAccessFile}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** ESRI Shapefile writer — pure JVM, from the PUBLIC spec ("ESRI
  * Shapefile Technical Description", ESRI whitepaper, July 1998; the
  * same format GDAL's 'ESRI Shapefile' driver writes). Closes the
  * reference's `shp` export route (reference: src/o2agol/pipeline/
  * source.py:626 maps 'shp' → 'ESRI Shapefile'; domain enums list it
  * as a direct-export format) the way the GPKG writer (H6) closed
  * `gpkg`: a real, externally readable file set, not a stub.
  *
  * Writes the full sidecar set:
  *   - `.shp` geometry records (Point / PolyLine / Polygon),
  *   - `.shx` record index,
  *   - `.dbf` dBase-III attribute table,
  *   - `.prj` WGS84 WKT, `.cpg` charset marker.
  *
  * Geometry input is the engine's WKB convention (little-endian
  * Point=1 / LineString=2 / Polygon=3, the `graft.functions.Wkb`
  * encoders). Ring orientation is normalized to the spec's contract
  * (outer rings clockwise, holes counter-clockwise) by signed area.
  *
  * Scale note: a shapefile is a SINGLE seekable file set with
  * interior back-patched lengths and a hard 2 GB format limit — the
  * driver-streamed `toLocalIterator` shape (constant memory, the
  * GPKG/GeoJSON convention) is forced by the format, not the engine;
  * the distributed big-export paths are GeoParquet (H17) and the
  * partitioned parquet/CSV sinks (H10). The 2 GB ceiling is enforced
  * with a typed ExportError rather than a corrupt file.
  */
object Shapefile {

  /** Summary of a finished write. */
  final case class WriteResult(
      path: String, rows: Long, shapeType: Int,
      bbox: (Double, Double, Double, Double))

  private val FileCode = 9994
  private val Version = 1000
  private val MaxFileBytes = Int.MaxValue.toLong // spec: offsets are 16-bit-word ints

  private val Wgs84Wkt =
    """GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]"""

  // ---- WKB reading (driver-side; the writer consumes the engine's
  // ---- own little-endian encoders but honors the byte-order flag).

  private final case class Geom(kind: Int, rings: Array[Array[Double]])

  private def readWkb(bytes: Array[Byte]): Geom = {
    val buf = ByteBuffer.wrap(bytes)
    buf.order(if (buf.get() == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    val kind = buf.getInt & 0xffff
    def readPts(n: Int): Array[Double] = {
      val a = new Array[Double](2 * n)
      var i = 0
      while (i < 2 * n) { a(i) = buf.getDouble; i += 1 }
      a
    }
    kind match {
      case 1 => Geom(1, Array(readPts(1)))
      case 2 => Geom(2, Array(readPts(buf.getInt)))
      case 3 =>
        val nRings = buf.getInt
        Geom(3, Array.fill(nRings)(readPts(buf.getInt)))
      case other =>
        throw new graft.ExportError(
          s"shapefile writer supports WKB Point/LineString/Polygon, got type $other",
          Map("format" -> "shp", "stage" -> "export"))
    }
  }

  /** 2×signed area (shoelace); > 0 = counter-clockwise. */
  private def signedArea2(ring: Array[Double]): Double = {
    var s = 0.0
    val n = ring.length / 2
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      s += ring(2 * i) * ring(2 * j + 1) - ring(2 * j) * ring(2 * i + 1)
      i += 1
    }
    s
  }

  private def reversed(ring: Array[Double]): Array[Double] = {
    val n = ring.length / 2
    val out = new Array[Double](ring.length)
    var i = 0
    while (i < n) {
      out(2 * i) = ring(2 * (n - 1 - i))
      out(2 * i + 1) = ring(2 * (n - 1 - i) + 1)
      i += 1
    }
    out
  }

  // ---- attribute (.dbf) model: fixed-width ASCII fields.

  private final case class DbfField(name: String, typ: Char, len: Int, dec: Int)

  private def dbfField(f: StructField): DbfField = f.dataType match {
    case StringType => DbfField(f.name.take(10), 'C', 64, 0)
    case LongType | IntegerType | ShortType | ByteType => DbfField(f.name.take(10), 'N', 18, 0)
    case DoubleType | FloatType => DbfField(f.name.take(10), 'N', 19, 6)
    case other =>
      throw new graft.ExportError(
        s"shapefile attribute '${f.name}': unsupported type ${other.simpleString}",
        Map("format" -> "shp", "stage" -> "export"))
  }

  private def renderField(fd: DbfField, v: Any): Array[Byte] = {
    val s = v match {
      case null => ""
      case d: Double => { val t = f"$d%.6f"; if (t.length > fd.len) "*" * fd.len else t }
      case f1: Float => { val t = f"${f1.toDouble}%.6f"; if (t.length > fd.len) "*" * fd.len else t }
      // Integers overflow the same way doubles do: a value wider than
      // the field gets the dBASE asterisk-fill overflow marker, never
      // a silent truncation of the most-significant digits.
      case other =>
        val t = other.toString
        if (fd.typ == 'N' && t.length > fd.len) "*" * fd.len else t
    }
    val out = Array.fill[Byte](fd.len)(' ')
    if (fd.typ == 'N') { // right-justified
      val t = s.takeRight(fd.len).getBytes("US-ASCII")
      System.arraycopy(t, 0, out, fd.len - t.length, t.length)
    } else { // left-justified, truncate
      val t = s.take(fd.len).getBytes("US-ASCII")
      System.arraycopy(t, 0, out, 0, math.min(t.length, fd.len))
    }
    out
  }

  /** Write `df` (with binary WKB column `wkbCol`; all geometries the
    * same WKB kind) as `<path>.shp/.shx/.dbf/.prj/.cpg`. `path` is
    * the basename WITHOUT extension. Returns the write summary.
    */
  def write(df: DataFrame, wkbCol: String, path: String): WriteResult = {
    val schema = df.schema
    val gIdx = schema.fieldIndex(wkbCol)
    if (schema(gIdx).dataType != BinaryType)
      throw new graft.ExportError(
        s"geometry column '$wkbCol' must be WKB binary, is ${schema(gIdx).dataType.simpleString}",
        Map("format" -> "shp", "stage" -> "export"))
    val attrs = schema.fields.zipWithIndex.filter(_._2 != gIdx)
    val fields = attrs.map { case (f, _) => dbfField(f) }
    // dBASE caps field names at 10 chars; two columns sharing a
    // 10-char prefix would silently collide in the .dbf and make one
    // attribute unreadable. Fail loudly instead.
    val dup = fields.groupBy(_.name).collectFirst { case (n, fs) if fs.length > 1 => n }
    dup.foreach { n =>
      throw new graft.ExportError(
        s"shapefile: attribute names collide at the DBF 10-char limit: '$n'",
        Map("format" -> "shp", "stage" -> "export"))
    }

    var shapeType = -1
    var rows = 0L
    var xmin = Double.MaxValue; var ymin = Double.MaxValue
    var xmax = -Double.MaxValue; var ymax = -Double.MaxValue

    val shp = new RandomAccessFile(s"$path.shp", "rw")
    val shx = new RandomAccessFile(s"$path.shx", "rw")
    val dbf = new RandomAccessFile(s"$path.dbf", "rw")
    try {
      shp.setLength(0); shx.setLength(0); dbf.setLength(0)
      // Placeholder main headers (patched after streaming).
      shp.write(new Array[Byte](100))
      shx.write(new Array[Byte](100))

      // .dbf header
      val headerSize = 32 + 32 * fields.length + 1
      val recordSize = 1 + fields.map(_.len).sum
      val dh = ByteBuffer.allocate(headerSize).order(ByteOrder.LITTLE_ENDIAN)
      dh.put(0x03.toByte).put(124.toByte).put(1.toByte).put(1.toByte) // version, YMD
      dh.putInt(0) // record count (patched)
      dh.putShort(headerSize.toShort).putShort(recordSize.toShort)
      dh.position(32)
      fields.foreach { fd =>
        val nm = new Array[Byte](11)
        val nb = fd.name.getBytes("US-ASCII")
        System.arraycopy(nb, 0, nm, 0, math.min(nb.length, 10))
        dh.put(nm).put(fd.typ.toByte).putInt(0)
        dh.put(fd.len.toByte).put(fd.dec.toByte)
        dh.put(new Array[Byte](14))
      }
      dh.put(0x0D.toByte)
      dbf.write(dh.array())

      var shpWords = 50L // header = 50 16-bit words

      val it = df.toLocalIterator()
      while (it.hasNext) {
        val row = it.next()
        val g = readWkb(row.getAs[Array[Byte]](gIdx))
        val st = g.kind match { case 1 => 1; case 2 => 3; case 3 => 5 }
        if (shapeType == -1) shapeType = st
        else if (shapeType != st)
          throw new graft.ExportError(
            s"mixed shape types in one shapefile: $shapeType vs $st",
            Map("format" -> "shp", "stage" -> "export"))

        // normalize polygon ring orientation: outer CW, holes CCW
        val rings =
          if (g.kind == 3)
            g.rings.zipWithIndex.map { case (r, i) =>
              val ccw = signedArea2(r) > 0
              if ((i == 0 && ccw) || (i > 0 && !ccw)) reversed(r) else r
            }
          else g.rings

        val pts = rings.map(_.length / 2).sum
        val content = g.kind match {
          case 1 =>
            val b = ByteBuffer.allocate(4 + 16).order(ByteOrder.LITTLE_ENDIAN)
            b.putInt(1).putDouble(rings(0)(0)).putDouble(rings(0)(1))
            b.array()
          case _ =>
            var rxmin = Double.MaxValue; var rymin = Double.MaxValue
            var rxmax = -Double.MaxValue; var rymax = -Double.MaxValue
            rings.foreach { r =>
              var i = 0
              while (i < r.length) {
                if (r(i) < rxmin) rxmin = r(i); if (r(i) > rxmax) rxmax = r(i)
                if (r(i + 1) < rymin) rymin = r(i + 1); if (r(i + 1) > rymax) rymax = r(i + 1)
                i += 2
              }
            }
            val b = ByteBuffer.allocate(4 + 32 + 8 + 4 * rings.length + 16 * pts)
              .order(ByteOrder.LITTLE_ENDIAN)
            b.putInt(shapeType)
            b.putDouble(rxmin).putDouble(rymin).putDouble(rxmax).putDouble(rymax)
            b.putInt(rings.length).putInt(pts)
            var start = 0
            rings.foreach { r => b.putInt(start); start += r.length / 2 }
            rings.foreach { r => r.foreach(b.putDouble) }
            b.array()
        }
        rows += 1
        rings.foreach { r =>
          var i = 0
          while (i < r.length) {
            if (r(i) < xmin) xmin = r(i); if (r(i) > xmax) xmax = r(i)
            if (r(i + 1) < ymin) ymin = r(i + 1); if (r(i + 1) > ymax) ymax = r(i + 1)
            i += 2
          }
        }

        // record header (big-endian): number, content words
        val rh = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN)
        rh.putInt(rows.toInt).putInt(content.length / 2)
        // index entry: offset words (BE), content words (BE)
        val ix = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN)
        ix.putInt(shpWords.toInt).putInt(content.length / 2)
        if ((shpWords + 4 + content.length / 2) * 2 > MaxFileBytes)
          throw new graft.ExportError(
            "shapefile 2 GB format limit exceeded — use GeoParquet for exports this size",
            Map("format" -> "shp", "stage" -> "export"))
        shp.write(rh.array()); shp.write(content)
        shx.write(ix.array())
        shpWords += 4 + content.length / 2

        // .dbf record
        dbf.write(' '.toInt)
        var fi = 0
        while (fi < attrs.length) {
          val i = attrs(fi)._2
          dbf.write(renderField(fields(fi), if (row.isNullAt(i)) null else row.get(i)))
          fi += 1
        }
      }
      dbf.write(0x1A)

      if (rows == 0) { xmin = 0; ymin = 0; xmax = 0; ymax = 0; shapeType = 1 }

      def mainHeader(lenWords: Long): Array[Byte] = {
        val b = ByteBuffer.allocate(100)
        b.order(ByteOrder.BIG_ENDIAN)
        b.putInt(FileCode); b.position(24); b.putInt(lenWords.toInt)
        b.order(ByteOrder.LITTLE_ENDIAN)
        b.putInt(Version).putInt(shapeType)
        b.putDouble(xmin).putDouble(ymin).putDouble(xmax).putDouble(ymax)
        b.putDouble(0).putDouble(0).putDouble(0).putDouble(0) // Z/M ranges
        b.array()
      }
      shp.seek(0); shp.write(mainHeader(shpWords))
      shx.seek(0); shx.write(mainHeader(50L + 4L * rows))
      dbf.seek(4)
      val rc = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      rc.putInt(rows.toInt)
      dbf.write(rc.array())
    } finally { shp.close(); shx.close(); dbf.close() }

    val prj = new BufferedOutputStream(new FileOutputStream(s"$path.prj"))
    try prj.write(Wgs84Wkt.getBytes("US-ASCII")) finally prj.close()
    val cpg = new BufferedOutputStream(new FileOutputStream(s"$path.cpg"))
    try cpg.write("UTF-8".getBytes("US-ASCII")) finally cpg.close()

    WriteResult(path, rows, shapeType, (xmin, ymin, xmax, ymax))
  }
}
