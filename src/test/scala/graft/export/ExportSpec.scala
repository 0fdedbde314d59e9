package graft.`export`

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class ExportSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-export").toString

  private def pointsDf = tables.events
    .limit(20)
    .select(col("event_id").as("id"), col("event_type").as("kind"),
      col("value").as("x"), col("user_id").cast("double").as("y"))

  test("GeoJSONSeq writes one valid feature per line, distributed") {
    val dir = tmpDir() + "/out.geojsonseq"
    GeoJson.writeSeq(pointsDf, GeoJson.pointGeometry(col("x"), col("y")), dir)
    val lines = spark.read.text(dir).collect().map(_.getString(0))
    assert(lines.length == 20)
    lines.foreach { l =>
      assert(l.startsWith("""{"type":"Feature","properties":{"""))
      assert(l.contains(""""geometry":{"type":"Point","coordinates":["""))
    }
  }

  test("FeatureCollection single file has features array + metadata block") {
    val file = tmpDir() + "/out.geojson"
    GeoJson.writeFeatureCollection(
      pointsDf, GeoJson.pointGeometry(col("x"), col("y")), file,
      target = "events", generatedAt = "2026-01-01T00:00:00")
    val content = new String(Files.readAllBytes(Paths.get(file)), "UTF-8")
    assert(content.startsWith("""{"type":"FeatureCollection","features":["""))
    assert(content.contains(""""metadata":{"generated":"2026-01-01T00:00:00""""))
    assert(content.contains(""""count":20"""))
    // parses as JSON via Spark's reader
    val parsed = spark.read.option("multiLine", "true").json(file)
    assert(parsed.columns.contains("features") && parsed.columns.contains("metadata"))
  }

  test("Exporter routes formats and rejects GPKG/FGDB explicitly") {
    val dir = tmpDir()
    Exporter.write(pointsDf, s"$dir/t.parquet", ExportFormat.Parquet)
    assert(spark.read.parquet(s"$dir/t.parquet").count() == 20)
    Exporter.write(pointsDf, s"$dir/t.csv", ExportFormat.Csv)
    assert(spark.read.option("header", "true").csv(s"$dir/t.csv").count() == 20)
    intercept[UnsupportedOperationException] {
      Exporter.write(pointsDf, s"$dir/t.gpkg", ExportFormat.Gpkg)
    }
  }

  test("ExportFormat.fromPath + exportFilename match reference naming") {
    assert(ExportFormat.fromPath("x/afg_roads.geojson") == ExportFormat.GeoJson)
    assert(ExportFormat.fromPath("y.gdb") == ExportFormat.Fgdb)
    assert(Exporter.exportFilename("roads", "AFG", ExportFormat.GeoJson) == "afg_roads.geojson")
    assert(Exporter.exportFilename("health", "ken", ExportFormat.Gpkg, raw = true) == "ken_health_raw.gpkg")
    // tabular JSON round-trips unambiguously (regression: .json used
    // to route back to GeoJson and throw on write)
    val jf = Exporter.exportFilename("places", "KEN", ExportFormat.Json)
    assert(jf == "ken_places.jsonl" && ExportFormat.fromPath(jf) == ExportFormat.Json)
  }

  test("FeatureService: Initial fails on existing, Overwrite truncates, Append adds") {
    val svc = tmpDir() + "/service"
    val df = pointsDf
    FeatureService.publish(df, svc, "roads", PublishMode.Initial)
    assert(FeatureService.readLayer(spark, svc, "roads").count() == 20)
    intercept[IllegalStateException] {
      FeatureService.publish(df, svc, "roads", PublishMode.Initial)
    }
    FeatureService.publish(df.limit(5), svc, "roads", PublishMode.Overwrite)
    assert(FeatureService.readLayer(spark, svc, "roads").count() == 5)
    FeatureService.publish(df.limit(3), svc, "roads", PublishMode.Append)
    assert(FeatureService.readLayer(spark, svc, "roads").count() == 8)
  }

  test("FeatureService Auto: create then key-upsert") {
    val svc = tmpDir() + "/service"
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    FeatureService.publish(v1, svc, "places", PublishMode.Auto)
    val v2 = Seq((2L, "b2"), (3L, "c")).toDF("id", "v")
    FeatureService.publish(v2, svc, "places", PublishMode.Auto)
    val out = FeatureService.readLayer(spark, svc, "places")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
  }

  test("chunkForUpload sizes partitions from row count") {
    val df = tables.orders
    val n = df.count()
    val chunked = FeatureService.chunkForUpload(df, n, maxRowsPerChunk = 100)
    assert(chunked.rdd.getNumPartitions == math.ceil(n / 100.0).toInt)
  }

  test("CountryCache list and clear manage entries") {
    val cache = new CountryCache(spark, tmpDir() + "/cache")
    val k1 = CacheKey("AF", "places", "place", "2026-01")
    val k2 = CacheKey("KE", "buildings", "building", "2026-01")
    cache.put(k1, pointsDf, "2026-01-01")
    cache.put(k2, pointsDf, "2026-01-01")
    assert(cache.list().toSet == Set(k1, k2))
    assert(cache.clear(k1))
    assert(cache.list().toSet == Set(k2) && !cache.exists(k1))
  }

  test("CountryCache: write-through, completeness fallback") {
    val cache = new CountryCache(spark, tmpDir() + "/cache")
    val key = CacheKey("AF", "places", "place", "2026-01")
    assert(!cache.exists(key))
    var computes = 0
    def compute = { computes += 1; pointsDf }
    val a = cache.readThrough(key, Set("id", "kind"), "2026-01-01")(compute)
    assert(a.count() == 20 && computes == 1)
    // second read hits cache
    val b = cache.readThrough(key, Set("id", "kind"), "2026-01-01")(compute)
    assert(b.count() == 20 && computes == 1)
    // expecting a column the cache lacks -> treated as miss, recomputed
    val c = cache.readThrough(key, Set("id", "kind", "extra_col"), "2026-01-01") {
      computes += 1; pointsDf.withColumn("extra_col", lit(1))
    }
    assert(c.columns.contains("extra_col") && computes == 2)
  }
}
