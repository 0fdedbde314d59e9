package graft.`export`

import org.apache.spark.sql.{Column, DataFrame}

/** Export formats (reference: src/o2agol/domain/enums.py:33-38 +
  * export.py format routing). GPKG/FGDB require GDAL/sqlite
  * drivers that do not exist in this environment; they fail
  * explicitly rather than pretending (SURVEY §6 documented gap).
  */
object ExportFormat extends Enumeration {
  val GeoJson, GeoJsonSeq, Parquet, Csv, Json, Gpkg, Fgdb, GeoParquetFmt, Shp, Fgb = Value

  /** Infer from a file extension (reference export.py:45-55). */
  def fromPath(path: String): ExportFormat.Value = {
    val ext = path.substring(path.lastIndexOf('.') + 1).toLowerCase
    ext match {
      // .json → GeoJson mirrors the reference (export.py:48-49);
      // tabular JSON uses .jsonl (what Spark's json writer emits),
      // keeping the filename ↔ format round-trip unambiguous.
      case "geojson" | "json" => GeoJson
      case "geojsonseq"       => GeoJsonSeq
      case "jsonl"            => Json
      case "parquet"          => Parquet
      case "geoparquet"       => GeoParquetFmt
      case "csv"              => Csv
      case "gpkg"             => Gpkg
      case "gdb" | "fgdb"     => Fgdb
      case "shp"              => Shp
      case "fgb"              => Fgb
      case other              => throw new graft.ExportError(
        s"unknown export extension: $other",
        Map("format" -> other, "stage" -> "export"))
    }
  }
}

/** Multi-format exporter (reference: export.py `Exporter.write` /
  * `export_data`). Geometry-bearing formats take the serialized
  * geometry column; tabular formats write the frame as-is.
  */
object Exporter {

  def write(
      df: DataFrame,
      path: String,
      format: ExportFormat.Value,
      geometryJson: Option[Column] = None,
      target: String = "features",
      generatedAt: String = "1970-01-01T00:00:00",
      geometryWkb: Option[Column] = None,
      raw: Boolean = false
  ): Unit = try { format match {
    case ExportFormat.GeoJson =>
      val geom = geometryJson.getOrElse(
        throw new IllegalArgumentException("GeoJSON export needs a geometry column"))
      GeoJson.writeFeatureCollection(df, geom, path, target, generatedAt, rawExport = raw)
    case ExportFormat.GeoJsonSeq =>
      val geom = geometryJson.getOrElse(
        throw new IllegalArgumentException("GeoJSONSeq export needs a geometry column"))
      GeoJson.writeSeq(df, geom, path)
    case ExportFormat.Parquet => df.write.mode("overwrite").parquet(path)
    case ExportFormat.Csv =>
      df.write.mode("overwrite").option("header", "true").csv(path)
    case ExportFormat.Json => df.write.mode("overwrite").json(path)
    case ExportFormat.Gpkg =>
      // Self-contained GeoPackage (no GDAL/sqlite dependency): the
      // pure-JVM SQLite writer in Gpkg.scala — the reference CLI's
      // default format (cli.py:1163).
      val wkb = geometryWkb.getOrElse(
        throw new IllegalArgumentException(
          "GPKG export needs a WKB geometry column (geometryWkb)"))
      Gpkg.write(df.withColumn("geom", wkb), path, target)
    case ExportFormat.GeoParquetFmt =>
      // Distributed geo export (public GeoParquet v1.1.0 spec) —
      // the scale path the single-file GPKG/GeoJSON writers defer
      // huge exports to.
      val wkb = geometryWkb.getOrElse(
        throw new IllegalArgumentException(
          "GeoParquet export needs a WKB geometry column (geometryWkb)"))
      GeoParquet.write(df.withColumn("geometry", wkb), "geometry", path)
    case ExportFormat.Shp =>
      // Pure-JVM ESRI Shapefile (public 1998 spec) — the reference's
      // 'shp' direct-export route (source.py:626). Single-file
      // format ⇒ driver-streamed (the GPKG convention); the path's
      // .shp extension is stripped to the sidecar-set basename.
      val wkb = geometryWkb.getOrElse(
        throw new IllegalArgumentException(
          "Shapefile export needs a WKB geometry column (geometryWkb)"))
      // Strip the extension case-insensitively — fromPath routes
      // LAYER.SHP here too, and the sidecar set must not be
      // named LAYER.SHP.shp/.shx/.dbf.
      Shapefile.write(df.withColumn("geom", wkb), "geom",
        if (path.toLowerCase.endsWith(".shp")) path.dropRight(4) else path)
    case ExportFormat.Fgb =>
      // FlatGeobuf (public spec, real flatbuffers runtime) — the
      // reference's 'fgb' direct-export route (source.py:631).
      val wkb = geometryWkb.getOrElse(
        throw new IllegalArgumentException(
          "FlatGeobuf export needs a WKB geometry column (geometryWkb)"))
      FlatGeobuf.write(df.withColumn("geom", wkb), "geom", path)
    case ExportFormat.Fgdb =>
      throw new UnsupportedOperationException(
        s"$format is a proprietary ESRI container with no public spec; " +
          "unsupported by design (documented in SURVEY.md §6)")
  } } catch {
    // Typed seam (reference errors.py ExportError): driver errors,
    // missing geometry columns, and format routing all surface with
    // {path, format, stage} context; the UnsupportedOperationException
    // for FGDB intentionally stays untyped — it is a capability
    // statement, not a failure of an attempted export.
    case e: graft.GraftError                 => throw e
    case e: UnsupportedOperationException    => throw e
    case scala.util.control.NonFatal(e) =>
      throw new graft.ExportError(
        s"export failed: ${e.getMessage}",
        Map("path" -> path, "format" -> format.toString, "stage" -> "export"), e)
  }

  /** Multi-layer single-file GeoPackage — the reference's multilayer
    * GPKG route (export.py:80 "GPKG: Single file with layers";
    * export.py:337-344): a keyed set of frames (e.g. education =
    * places + buildings) lands as N layers of ONE .gpkg, each table
    * named `{target}_{layerName}` — or just `layerName` when
    * `raw = true`, matching the reference's raw_export naming. Every
    * layer frame must already carry a BINARY WKB column named
    * `geom` (each layer usually derives its geometry differently,
    * so a single shared Column expression would be wrong here).
    */
  def writeGpkgLayers(
      data: Seq[(String, DataFrame)],
      path: String,
      target: String,
      raw: Boolean = false
  ): Unit = try {
    require(data.nonEmpty, "GPKG multilayer export needs at least one layer")
    val layers = data.map { case (layerName, df) =>
      Gpkg.Layer(df, if (raw) layerName else s"${target}_$layerName")
    }
    Gpkg.writeLayers(layers, path)
  } catch {
    case e: graft.GraftError => throw e
    case scala.util.control.NonFatal(e) =>
      throw new graft.ExportError(
        s"export failed: ${e.getMessage}",
        Map("path" -> path, "format" -> "Gpkg", "stage" -> "export"), e)
  }

  /** Multi-layer GeoJSON — the reference's dict route for the
    * GEOJSON format (export.py:266-296): one combined
    * FeatureCollection, each feature tagged with its `layer` name
    * (names pass through untouched — unlike GPKG/FGDB the reference
    * does not prefix GeoJSON layer ids), per-layer counts +
    * total_count in the metadata block.
    */
  def writeGeoJsonLayers(
      data: Seq[(String, DataFrame, Column)],
      path: String,
      target: String,
      generatedAt: String = "1970-01-01T00:00:00",
      raw: Boolean = false
  ): Unit = try {
    GeoJson.writeFeatureCollectionLayers(data, path, target, generatedAt, raw)
  } catch {
    case e: graft.GraftError => throw e
    case scala.util.control.NonFatal(e) =>
      throw new graft.ExportError(
        s"export failed: ${e.getMessage}",
        Map("path" -> path, "format" -> "GeoJson", "stage" -> "export"), e)
  }

  /** Incremental partitioned export with DYNAMIC partition
    * overwrite: only the partitions present in `df` are replaced;
    * every other partition of the target survives untouched. This
    * is the incremental-publish write shape (reference publish.py
    * truncate-and-append per layer, generalized to keyed
    * partitions): a 100 TB lake refreshes one country/day partition
    * without rewriting — or even listing — the rest. The mode rides
    * as a per-write OPTION (it takes precedence over the session
    * conf, SPARK-25556), so concurrent writes on one session can
    * never observe each other's mode or leak it.
    */
  /** Z-order clustered parquet write — the 2-D extension of
    * `FeatureService.writeRangeSorted`: rows are range-partitioned
    * AND sorted by their Morton key (`Geo.mortonKey` over x/y), so
    * every output file covers one tight, disjoint z-range and its
    * footer min/max statistics become a spatial index. At 100 TB a
    * bbox predicate rewritten to z-range bounds prunes to the
    * handful of files whose ranges intersect it (the lake-table
    * Z-ORDER clustering move) instead of scanning the world. The
    * `zkey` column is kept in the output — it is the pruning
    * predicate's column.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      x: Column,
      y: Column,
      xmin: Double,
      ymin: Double,
      xmax: Double,
      ymax: Double,
      partitions: Int
  ): Unit = {
    import org.apache.spark.sql.functions.col
    df.withColumn("zkey", graft.operators.Geo.mortonKey(x, y, xmin, ymin, xmax, ymax))
      .repartitionByRange(partitions, col("zkey"))
      .sortWithinPartitions("zkey")
      .write.mode("overwrite").parquet(path)
  }

  /** Bbox read over a [[writeZOrdered]] layout — the consuming half
    * of the Z-order contract: the query bbox is rewritten to its
    * covering z-ranges (`Geo.zRangesForBbox`, driver-side math, no
    * data read to plan) and applied as OR'd BETWEEN predicates on
    * `zkey` — range predicates parquet prunes with footer min/max,
    * so with the writer's disjoint per-file ranges only the files
    * whose z-range intersects the bbox are opened. The exact x/y
    * predicate is ANDed on top, so correctness never depends on the
    * cover's tightness (it is a superset by construction: quantize
    * is monotonic and out-of-frame points clamp to edge cells the
    * exact predicate then rejects).
    */
  def readZOrdered(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      xCol: String,
      yCol: String,
      xmin: Double,
      ymin: Double,
      xmax: Double,
      ymax: Double,
      bboxXLo: Double,
      bboxYLo: Double,
      bboxXHi: Double,
      bboxYHi: Double,
      maxDepth: Int = 8
  ): DataFrame = {
    import org.apache.spark.sql.functions.col
    import graft.operators.Geo
    val qxLo = Geo.quantize16(bboxXLo, xmin, xmax)
    val qxHi = Geo.quantize16(bboxXHi, xmin, xmax)
    val qyLo = Geo.quantize16(bboxYLo, ymin, ymax)
    val qyHi = Geo.quantize16(bboxYHi, ymin, ymax)
    val ranges = Geo.zRangesForBbox(qxLo, qxHi, qyLo, qyHi, maxDepth)
    val zPred = ranges
      .map { case (lo, hi) => col("zkey").between(lo, hi) }
      .reduceOption(_ || _)
      .getOrElse(org.apache.spark.sql.functions.lit(false))
    spark.read.parquet(path)
      .filter(zPred)
      .filter(col(xCol).between(bboxXLo, bboxXHi) && col(yCol).between(bboxYLo, bboxYHi))
  }

  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path)

  /** Default export filename (reference: export.py:468-511
    * `generate_export_filename`): `<iso3>_<query>[_raw].<ext>`.
    */
  def exportFilename(
      query: String,
      iso3: String,
      format: ExportFormat.Value,
      raw: Boolean = false
  ): String = {
    val ext = format match {
      case ExportFormat.GeoJson    => "geojson"
      case ExportFormat.GeoJsonSeq => "geojsonseq"
      case ExportFormat.Parquet    => "parquet"
      case ExportFormat.Csv        => "csv"
      case ExportFormat.Json       => "jsonl"
      case ExportFormat.Gpkg          => "gpkg"
      case ExportFormat.Fgdb          => "gdb"
      case ExportFormat.Shp           => "shp"
      case ExportFormat.Fgb           => "fgb"
      case ExportFormat.GeoParquetFmt => "geoparquet"
    }
    val suffix = if (raw) "_raw" else ""
    s"${iso3.toLowerCase}_$query$suffix.$ext"
  }
}
