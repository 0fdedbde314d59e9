package graft.sources

import java.io.RandomAccessFile
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** ESRI Shapefile READER — the import half of H18, written from the
  * same public 1998 spec as the writer but sharing no code with it:
  * an independent parse, so a writer bug cannot hide behind a shared
  * encoder.
  *
  * Scale shape: the .shx sidecar IS the format's parallelism — an
  * 8-bytes-per-record offset table. The driver reads only .shx and
  * the .dbf descriptor block (bounded), then ships record ranges to
  * executors which each open .shp/.dbf and parse their own slices;
  * geometry bytes never visit the driver. This is the same
  * row-group economics as parquet, recovered from a 1998 format.
  */
object ShapefileReader {

  final case class Field(name: String, typ: Char, len: Int, dec: Int)

  final case class Meta(
      shapeType: Int,
      bbox: (Double, Double, Double, Double),
      fields: Seq[Field],
      recordCount: Int,
      dbfHeaderSize: Int,
      dbfRecordSize: Int,
      // per record: (shp content offset BYTES, content length BYTES)
      offsets: IndexedSeq[(Long, Int)])

  /** Parse the bounded sidecars: .shp header, .shx offsets, .dbf
    * descriptors. Driver state: 12 bytes per record + descriptors.
    */
  def readMeta(base: String): Meta = {
    val shx = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$base.shx"))
    if (shx.length < 100 || ByteBuffer.wrap(shx, 0, 4).getInt != 9994)
      throw new graft.ExportError(s"not a shapefile index: $base.shx",
        Map("format" -> "shp", "stage" -> "import"))
    val beShx = ByteBuffer.wrap(shx).order(ByteOrder.BIG_ENDIAN)
    val leShx = ByteBuffer.wrap(shx).order(ByteOrder.LITTLE_ENDIAN)
    val shapeType = leShx.getInt(32)
    val bbox = (leShx.getDouble(36), leShx.getDouble(44),
      leShx.getDouble(52), leShx.getDouble(60))
    val nRec = (shx.length - 100) / 8
    val offsets = (0 until nRec).map { i =>
      // offsets/lengths in 16-bit words; offset points at the record
      // HEADER — content starts 8 bytes later
      val off = beShx.getInt(100 + 8 * i).toLong * 2 + 8
      val len = beShx.getInt(100 + 8 * i + 4) * 2
      (off, len)
    }

    val dbfHead = {
      val raf = new RandomAccessFile(s"$base.dbf", "r")
      try {
        val h = new Array[Byte](32)
        raf.readFully(h)
        val le = ByteBuffer.wrap(h).order(ByteOrder.LITTLE_ENDIAN)
        val headerSize = le.getShort(8) & 0xffff
        val recordSize = le.getShort(10) & 0xffff
        val rest = new Array[Byte](headerSize - 32)
        raf.readFully(rest)
        (le.getInt(4), headerSize, recordSize, rest)
      } finally raf.close()
    }
    val (dbfCount, headerSize, recordSize, desc) = dbfHead
    val nFields = (headerSize - 33) / 32
    val fields = (0 until nFields).map { i =>
      val o = 32 * i
      val nameEnd = (0 until 11).find(j => desc(o + j) == 0).getOrElse(11)
      Field(new String(desc, o, nameEnd, "US-ASCII"),
        desc(o + 11).toChar, desc(o + 16) & 0xff, desc(o + 17) & 0xff)
    }
    require(dbfCount == nRec, s".dbf records ($dbfCount) != .shx records ($nRec)")
    Meta(shapeType, bbox, fields, nRec, headerSize, recordSize, offsets)
  }

  def schemaOf(m: Meta): StructType = StructType(
    m.fields.map { f =>
      val dt = f.typ match {
        case 'C' => StringType
        case 'N' => if (f.dec > 0) DoubleType else LongType
        case other =>
          throw new graft.ExportError(s"shapefile reader: field type '$other'",
            Map("format" -> "shp", "stage" -> "import"))
      }
      StructField(f.name, dt, nullable = true)
    } :+ StructField("geometry", BinaryType, nullable = true))

  /** Parse one .shp record content block into WKB (LE). */
  private[sources] def contentToWkb(bytes: Array[Byte]): Array[Byte] = {
    val le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val st = le.getInt(0)
    st match {
      case 0 => null // null shape
      case 1 =>
        val out = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
        out.put(1.toByte).putInt(1).putDouble(le.getDouble(4)).putDouble(le.getDouble(12))
        out.array()
      case 3 | 5 =>
        val numParts = le.getInt(36)
        val numPoints = le.getInt(40)
        val partsAt = 44
        val pointsAt = partsAt + 4 * numParts
        val parts = (0 until numParts).map(i => le.getInt(partsAt + 4 * i))
        def pt(i: Int): (Double, Double) =
          (le.getDouble(pointsAt + 16 * i), le.getDouble(pointsAt + 16 * i + 8))
        if (st == 3) {
          require(numParts == 1, s"multi-part polyline unsupported (parts=$numParts)")
          val out = ByteBuffer.allocate(9 + 16 * numPoints).order(ByteOrder.LITTLE_ENDIAN)
          out.put(1.toByte).putInt(2).putInt(numPoints)
          (0 until numPoints).foreach { i => val (x, y) = pt(i); out.putDouble(x).putDouble(y) }
          out.array()
        } else {
          val ends = parts.drop(1) :+ numPoints
          val out = ByteBuffer.allocate(9 + 4 + 4 * numParts + 16 * numPoints)
            .order(ByteOrder.LITTLE_ENDIAN)
          out.put(1.toByte).putInt(3).putInt(numParts)
          parts.zip(ends).foreach { case (s, e) =>
            out.putInt(e - s)
            (s until e).foreach { i => val (x, y) = pt(i); out.putDouble(x).putDouble(y) }
          }
          out.array()
        }
      case other =>
        throw new graft.ExportError(s"shapefile reader: shape type $other",
          Map("format" -> "shp", "stage" -> "import"))
    }
  }

  private[sources] def parseDbfRecord(bytes: Array[Byte], fields: Seq[Field]): Seq[Any] = {
    // bytes begin AFTER the 1-byte deletion flag
    var off = 0
    fields.map { f =>
      val s = new String(bytes, off, f.len, "US-ASCII")
      off += f.len
      f.typ match {
        case 'C' =>
          val t = s.replaceAll("\\s+$", "")
          if (t.isEmpty) null else t
        case 'N' =>
          val t = s.trim
          if (t.isEmpty || t.startsWith("*")) null
          else if (f.dec > 0) t.toDouble
          else t.toLong
        case other => throw new IllegalStateException(s"unreachable: $other")
      }
    }
  }

  /** Distributed read: record ranges ship to executors; each
    * partition opens its own .shp/.dbf handles and parses its slice.
    */
  def read(spark: SparkSession, base: String): DataFrame = {
    val m = readMeta(base)
    val schema = schemaOf(m)
    if (m.recordCount == 0)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    val fields = m.fields
    val dbfHeaderSize = m.dbfHeaderSize
    val dbfRecordSize = m.dbfRecordSize
    val work = m.offsets.zipWithIndex
    val rdd = spark.sparkContext
      .parallelize(work, math.min(spark.sparkContext.defaultParallelism,
        math.max(1, work.length / 64 + 1)))
      .mapPartitions { it =>
        val shp = new RandomAccessFile(s"$base.shp", "r")
        val dbf = new RandomAccessFile(s"$base.dbf", "r")
        val rows = it.map { case ((off, len), i) =>
          val content = new Array[Byte](len)
          shp.seek(off)
          shp.readFully(content)
          val rec = new Array[Byte](dbfRecordSize - 1)
          dbf.seek(dbfHeaderSize.toLong + i.toLong * dbfRecordSize + 1)
          dbf.readFully(rec)
          Row.fromSeq(parseDbfRecord(rec, fields) :+ contentToWkb(content))
        }.toArray
        shp.close(); dbf.close()
        rows.iterator
      }
    spark.createDataFrame(rdd, schema)
  }
}
