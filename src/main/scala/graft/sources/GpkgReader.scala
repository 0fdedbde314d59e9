package graft.sources

import java.io.RandomAccessFile

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** GeoPackage / SQLite READER — the import half of H6, written from
  * the PUBLIC SQLite file format (sqlite.org/fileformat2.html) and
  * the GPKG 1.3 spec, sharing no code with the writer: an
  * independent page-level parse (header, b-tree walk, varint record
  * decode, overflow chains, GP geometry blobs), so a writer bug
  * cannot hide behind a shared encoder.
  *
  * Scale shape: the driver walks only INTERIOR pages to collect the
  * leaf page numbers (fan-out ~100:1 — bounded driver state), then
  * ships leaf page numbers to executors which each open the file and
  * decode their own pages, following overflow chains locally.
  * Feature payloads never visit the driver. The same row-group
  * economics as parquet, recovered from the SQLite b-tree.
  */
object GpkgReader {

  // ---- low-level page access ------------------------------------

  private final class Db(val raf: RandomAccessFile) {
    val pageSize: Int = {
      raf.seek(16)
      val hi = raf.read(); val lo = raf.read()
      val v = (hi << 8) | lo
      if (v == 1) 65536 else v
    }
    def page(n: Int): Array[Byte] = {
      val b = new Array[Byte](pageSize)
      raf.seek((n - 1).toLong * pageSize)
      raf.readFully(b)
      b
    }
    // usable size (no reserved bytes written by this engine's files,
    // but honor the header byte anyway)
    val usable: Int = {
      raf.seek(20)
      pageSize - raf.read()
    }
  }

  private def u16(b: Array[Byte], o: Int): Int = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) | ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  /** (value, bytesConsumed) of a SQLite varint at `o`. */
  private def varint(b: Array[Byte], o: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 8) {
      val x = b(o + i)
      v = (v << 7) | (x & 0x7f)
      if ((x & 0x80) == 0) return (v, i + 1)
      i += 1
    }
    ((v << 8) | (b(o + 8) & 0xff), 9)
  }

  // ---- b-tree walk ------------------------------------------------

  /** All leaf page numbers of a table b-tree, via interior pages
    * only (driver-bounded).
    */
  private def leafPages(db: Db, root: Int): Seq[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    def walk(pn: Int): Unit = {
      val pg = db.page(pn)
      val hdr = if (pn == 1) 100 else 0
      pg(hdr) & 0xff match {
        case 0x0d => out += pn
        case 0x05 =>
          val nCells = u16(pg, hdr + 3)
          val ptrs = hdr + 12
          (0 until nCells).foreach { i =>
            val cell = u16(pg, ptrs + 2 * i)
            walk(u32(pg, cell).toInt)
          }
          walk(u32(pg, hdr + 8).toInt) // right-most child
        case other =>
          throw new graft.ExportError(s"gpkg reader: unexpected page type $other at page $pn",
            Map("format" -> "gpkg", "stage" -> "import"))
      }
    }
    walk(root)
    out.toSeq
  }

  /** Decode every (rowid, record bytes) on one table LEAF page,
    * following overflow chains (spec payload-spill formulas:
    * X = U−35, M = ((U−12)·32/255)−23, K = M + (P−M) mod (U−4)).
    */
  private def leafCells(db: Db, pn: Int): Seq[(Long, Array[Byte])] = {
    val pg = db.page(pn)
    val hdr = if (pn == 1) 100 else 0
    require((pg(hdr) & 0xff) == 0x0d, s"not a table leaf: page $pn")
    val u = db.usable
    val x = u - 35
    val m = ((u - 12) * 32 / 255) - 23
    val nCells = u16(pg, hdr + 3)
    val ptrs = hdr + 8
    (0 until nCells).map { i =>
      var o = u16(pg, ptrs + 2 * i)
      val (p, c1) = varint(pg, o); o += c1
      val (rowid, c2) = varint(pg, o); o += c2
      val pLen = p.toInt
      if (pLen <= x) {
        (rowid, java.util.Arrays.copyOfRange(pg, o, o + pLen))
      } else {
        val k = m + ((pLen - m) % (u - 4))
        val local = if (k <= x) k else m
        val out = new Array[Byte](pLen)
        System.arraycopy(pg, o, out, 0, local)
        var filled = local
        var next = u32(pg, o + local).toInt
        while (next != 0 && filled < pLen) {
          val op = db.page(next)
          val take = math.min(u - 4, pLen - filled)
          System.arraycopy(op, 4, out, filled, take)
          filled += take
          next = u32(op, 0).toInt
        }
        require(filled == pLen, s"gpkg reader: truncated overflow chain on page $pn")
        (rowid, out)
      }
    }
  }

  // ---- record decode ----------------------------------------------

  /** Decode a SQLite record into values (null / Long / Double /
    * String / Array[Byte]).
    */
  private[sources] def decodeRecord(rec: Array[Byte]): Seq[Any] = {
    val (hdrLen, c0) = varint(rec, 0)
    var ho = c0
    val serials = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (ho < hdrLen) {
      val (st, c) = varint(rec, ho)
      serials += st
      ho += c
    }
    var bo = hdrLen.toInt
    serials.toSeq.map { st =>
      def int(n: Int): Long = {
        var v = if ((rec(bo) & 0x80) != 0) -1L else 0L
        (0 until n).foreach { i => v = (v << 8) | (rec(bo + i) & 0xffL) }
        bo += n
        v
      }
      st match {
        case 0 => null
        case 1 => int(1)
        case 2 => int(2)
        case 3 => int(3)
        case 4 => int(4)
        case 5 => int(6)
        case 6 => int(8)
        case 7 => java.lang.Double.longBitsToDouble(int(8))
        case 8 => 0L
        case 9 => 1L
        case n if n >= 13 && n % 2 == 1 =>
          val len = ((n - 13) / 2).toInt
          val s = new String(rec, bo, len, "UTF-8"); bo += len; s
        case n if n >= 12 && n % 2 == 0 =>
          val len = ((n - 12) / 2).toInt
          val b = java.util.Arrays.copyOfRange(rec, bo, bo + len); bo += len; b
        case other =>
          throw new graft.ExportError(s"gpkg reader: serial type $other",
            Map("format" -> "gpkg", "stage" -> "import"))
      }
    }
  }

  // ---- catalog ------------------------------------------------------

  final case class MasterRow(kind: String, name: String, tbl: String, rootPage: Int, sql: Option[String])

  /** Parse sqlite_master (root = page 1). Driver-side, bounded. */
  def master(path: String): Seq[MasterRow] = {
    val raf = new RandomAccessFile(path, "r")
    try {
      val db = new Db(raf)
      leafPages(db, 1).flatMap(leafCells(db, _)).map { case (_, rec) =>
        val v = decodeRecord(rec)
        MasterRow(v(0).asInstanceOf[String], v(1).asInstanceOf[String],
          v(2).asInstanceOf[String], v(3).asInstanceOf[Long].toInt,
          Option(v(4)).map(_.asInstanceOf[String]))
      }
    } finally raf.close()
  }

  /** Column (name, declared type) pairs from a CREATE TABLE DDL —
    * minimal parse of the writer-emitted shape.
    */
  private[sources] def columnsOf(sql: String): Seq[(String, String)] = {
    val body = sql.substring(sql.indexOf('(') + 1, sql.lastIndexOf(')'))
    // split top-level commas (no nested parens in this engine's DDL
    // except none today; keep a depth counter anyway)
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    val cur = new StringBuilder
    body.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => parts += cur.toString; cur.clear()
      case ch => cur += ch
    }
    parts += cur.toString
    parts.toSeq.map(_.trim).filter(_.nonEmpty).map { defn =>
      val (name, rest) =
        if (defn.startsWith("\"")) {
          val end = defn.indexOf('"', 1)
          (defn.substring(1, end), defn.substring(end + 1).trim)
        } else {
          val sp = defn.indexOf(' ')
          (defn.substring(0, sp), defn.substring(sp + 1).trim)
        }
      (name, rest.split("\\s+").headOption.getOrElse("").toUpperCase)
    }
  }

  private def sparkType(declared: String): DataType = declared match {
    case "INTEGER" | "BOOLEAN" | "TINYINT" => LongType
    case "DOUBLE" | "REAL" | "FLOAT" => DoubleType
    case "TEXT" | "DATETIME" => StringType
    case _ => BinaryType // BLOB and geometry type names (POINT, ...)
  }

  // ---- distributed table read -----------------------------------------

  /** Read one table DISTRIBUTED: the driver walks interior pages for
    * the leaf list and parses the DDL for the schema; executors
    * decode their own leaves. An `INTEGER PRIMARY KEY` column is the
    * rowid alias (stored NULL in records) and is filled from the
    * rowid, per the SQLite spec.
    */
  def readTable(spark: SparkSession, path: String, table: String): DataFrame = {
    val m = master(path)
    val row = m.find(r => r.kind == "table" && r.name == table).getOrElse(
      throw new graft.ExportError(s"gpkg reader: no such table '$table'",
        Map("format" -> "gpkg", "stage" -> "import")))
    val ddl = row.sql.getOrElse(
      throw new graft.ExportError(s"gpkg reader: table '$table' has no DDL",
        Map("format" -> "gpkg", "stage" -> "import")))
    val cols = columnsOf(ddl)
    val rowidAlias = {
      val up = ddl.toUpperCase
      cols.indexWhere { case (n, _) =>
        up.contains(s""""${n.toUpperCase}" INTEGER PRIMARY KEY""") ||
          up.contains(s"${n.toUpperCase} INTEGER PRIMARY KEY")
      }
    }
    val schema = StructType(cols.map { case (n, t) =>
      StructField(n, sparkType(t), nullable = true)
    })
    val leaves = {
      val raf = new RandomAccessFile(path, "r")
      try leafPages(new Db(raf), row.rootPage) finally raf.close()
    }
    if (leaves.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    val nCols = cols.length
    val fieldTypes: Array[DataType] = schema.fields.map(_.dataType)
    val rdd = spark.sparkContext
      .parallelize(leaves, math.min(spark.sparkContext.defaultParallelism,
        math.max(1, leaves.length / 16 + 1)))
      .mapPartitions { it =>
        val raf = new RandomAccessFile(path, "r")
        val db = new Db(raf)
        val rows = it.flatMap { pn =>
          leafCells(db, pn).map { case (rowid, rec) =>
            val vals = decodeRecord(rec).toArray
            val out = new Array[Any](nCols)
            var i = 0
            while (i < nCols) {
              // SQLite affinity: a REAL column's integral values may
              // be STORED as integer serials (lossless-int record
              // optimization) — readers convert back by declared
              // affinity. Engine-written files never exercise this;
              // foreign writers (stock sqlite3) do.
              out(i) =
                if (i >= vals.length) null
                else (fieldTypes(i), vals(i)) match {
                  case (DoubleType, v: java.lang.Long) => v.toDouble
                  case (_, v) => v
                }
              i += 1
            }
            if (rowidAlias >= 0 && out(rowidAlias) == null) out(rowidAlias) = rowid
            Row.fromSeq(out.toIndexedSeq)
          }
        }.toArray
        raf.close()
        rows.iterator
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Strip the GPKG "GP" geometry-blob header (magic, version,
    * flags, srs_id, optional envelope) down to the raw WKB.
    */
  private[sources] def stripGpHeader(blob: Array[Byte]): Array[Byte] = {
    require(blob.length >= 8 && blob(0) == 'G' && blob(1) == 'P',
      "not a GPKG geometry blob")
    val flags = blob(3) & 0xff
    val envBytes = ((flags >> 1) & 0x7) match {
      case 0 => 0
      case 1 => 32
      case 2 | 3 => 48
      case 4 => 64
      case other =>
        throw new graft.ExportError(s"gpkg reader: invalid envelope code $other",
          Map("format" -> "gpkg", "stage" -> "import"))
    }
    java.util.Arrays.copyOfRange(blob, 8 + envBytes, blob.length)
  }

  /** Read the (single) feature table registered in gpkg_contents,
    * geometry blobs unwrapped to raw WKB.
    */
  def readFeatures(spark: SparkSession, path: String, table: String): DataFrame = {
    val geomCol = {
      val gc = readTableDriver(path, "gpkg_geometry_columns")
        .find(r => r._1 == table)
      gc.map(_._2).getOrElse(
        throw new graft.ExportError(s"gpkg reader: '$table' not in gpkg_geometry_columns",
          Map("format" -> "gpkg", "stage" -> "import")))
    }
    val df = readTable(spark, path, table)
    val schema = df.schema
    val gi = schema.fieldIndex(geomCol)
    val rdd = df.rdd.map { r =>
      val vals = r.toSeq.toArray
      if (vals(gi) != null)
        vals(gi) = stripGpHeader(vals(gi).asInstanceOf[Array[Byte]])
      Row.fromSeq(vals.toIndexedSeq)
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Tiny driver-side read of a metadata table's first two TEXT
    * columns (bounded: gpkg_* tables are catalog-sized).
    */
  private def readTableDriver(path: String, table: String): Seq[(String, String)] = {
    val m = master(path)
    val row = m.find(r => r.kind == "table" && r.name == table).getOrElse(
      throw new graft.ExportError(s"gpkg reader: no such table '$table'",
        Map("format" -> "gpkg", "stage" -> "import")))
    val raf = new RandomAccessFile(path, "r")
    try {
      val db = new Db(raf)
      leafPages(db, row.rootPage).flatMap(leafCells(db, _)).map { case (_, rec) =>
        val v = decodeRecord(rec)
        (v(0).asInstanceOf[String], v(1).asInstanceOf[String])
      }
    } finally raf.close()
  }
}
