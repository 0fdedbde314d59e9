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

  test("Exporter routes formats, writes real GPKG, rejects FGDB explicitly") {
    val dir = tmpDir()
    Exporter.write(pointsDf, s"$dir/t.parquet", ExportFormat.Parquet)
    assert(spark.read.parquet(s"$dir/t.parquet").count() == 20)
    Exporter.write(pointsDf, s"$dir/t.csv", ExportFormat.Csv)
    assert(spark.read.option("header", "true").csv(s"$dir/t.csv").count() == 20)
    Exporter.write(pointsDf, s"$dir/t.gpkg", ExportFormat.Gpkg,
      geometryWkb = Some(graft.functions.Wkb.wkbFromXY(col("x"), col("y"))))
    val bytes = Files.readAllBytes(Paths.get(s"$dir/t.gpkg"))
    assert(new String(bytes.slice(68, 72), "ISO-8859-1") == "GPKG")
    intercept[graft.ExportError] { // gpkg without geometry
      Exporter.write(pointsDf, s"$dir/t2.gpkg", ExportFormat.Gpkg)
    }
    intercept[UnsupportedOperationException] {
      Exporter.write(pointsDf, s"$dir/t.gdb", ExportFormat.Fgdb)
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
    intercept[graft.PublishError] {
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

  test("estimateChunkSize responds to row width within reference bounds") {
    import org.apache.spark.sql.functions._
    val narrow = spark.range(2000).select($"id", lit("x").as("v"))
    val wide = spark.range(2000).select($"id",
      concat_ws("", array_repeat(lit("wide-payload-"), 400)).as("v"))
    val nSize = FeatureService.estimateChunkSize(narrow, maxMemoryMb = 1)
    val wSize = FeatureService.estimateChunkSize(wide, maxMemoryMb = 1)
    // Wider rows → fewer rows per memory budget (utils.py:346-374).
    assert(wSize < nSize, s"wide=$wSize narrow=$nSize")
    // Reference bounds [100, 50000] and the empty-input default.
    assert(wSize >= 100 && nSize <= 50000)
    assert(FeatureService.estimateChunkSize(narrow.limit(0)) == 1000)
    // A doubled budget buys proportionally more rows per chunk
    // (cap-free regime; ±1 for integer truncation).
    val w2 = FeatureService.estimateChunkSize(wide, maxMemoryMb = 2)
    assert(math.abs(w2 - 2 * wSize) <= 2, s"w2=$w2 wSize=$wSize")
    // The budgeted chunker wires the estimate through to partitions.
    val auto = FeatureService.chunkForUploadAuto(wide, 2000L, maxMemoryMb = 1)
    assert(auto.rdd.getNumPartitions == math.ceil(2000.0 / wSize).toInt)
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

  test("FeatureService: every crashed-swap state recovers to a readable layer") {
    val svc = tmpDir() + "/svc"
    val df1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val df2 = Seq((2L, "B"), (3L, "c")).toDF("id", "v")
    FeatureService.publish(df1, svc, "pts", PublishMode.Initial)
    val live    = Paths.get(svc, "layer=pts")
    val staging = Paths.get(svc, "layer=pts.staging")
    val backup  = Paths.get(svc, "layer=pts.backup")

    // Crash BEFORE the swap started (staging written, live untouched):
    // old layer stays live, leftovers removed.
    df2.write.parquet(staging.toString)
    assert(FeatureService.recoverLayer(spark, svc, "pts"))
    assert(Files.exists(live) && !Files.exists(staging))
    assert(FeatureService.readLayer(spark, svc, "pts").count() == 2)

    // Crash BETWEEN the two renames (live moved aside, staging not yet
    // promoted): the complete staging layer is promoted — no data loss.
    df2.write.parquet(staging.toString)
    Files.move(live, backup)
    assert(FeatureService.recoverLayer(spark, svc, "pts"))
    assert(Files.exists(live) && !Files.exists(staging) && !Files.exists(backup))
    val promoted = FeatureService.readLayer(spark, svc, "pts")
    assert(promoted.count() == 2 &&
      promoted.filter(col("id") === 3L).count() == 1)

    // Crash AFTER promote but before backup cleanup: live wins,
    // backup dropped.
    df1.write.parquet(backup.toString)
    assert(FeatureService.recoverLayer(spark, svc, "pts"))
    assert(!Files.exists(backup) &&
      FeatureService.readLayer(spark, svc, "pts").count() == 2)

    // A normal Auto upsert after recovery works and leaves no debris.
    FeatureService.publish(Seq((3L, "C"), (4L, "d")).toDF("id", "v"),
      svc, "pts", PublishMode.Auto)
    val merged = FeatureService.readLayer(spark, svc, "pts")
    assert(merged.count() == 3 && !Files.exists(staging) && !Files.exists(backup))
  }

  test("FeatureService.cleanup: heals swaps, removes orphans, keeps configured layers") {
    val svc = tmpDir() + "/svc"
    val df = Seq((1L, "a")).toDF("id", "v")
    FeatureService.publish(df, svc, "wanted", PublishMode.Initial)
    FeatureService.publish(df, svc, "orphan", PublishMode.Initial)
    // half-finished swap for a third layer: staging only, no live
    df.write.parquet(Paths.get(svc, "layer=crashed.staging").toString)

    val dry = FeatureService.cleanup(spark, svc, keep = Set("wanted", "crashed"), dryRun = true)
    assert(dry.recovered == Seq("crashed") && dry.orphansRemoved == Seq("orphan"))
    // dry run touched nothing
    assert(Files.exists(Paths.get(svc, "layer=crashed.staging")))
    assert(FeatureService.listLayers(spark, svc) == Seq("orphan", "wanted"))

    val real = FeatureService.cleanup(spark, svc, keep = Set("wanted", "crashed"))
    assert(real.recovered == Seq("crashed") && real.orphansRemoved == Seq("orphan")
      && real.kept.toSet == Set("crashed", "wanted"))
    assert(FeatureService.listLayers(spark, svc) == Seq("crashed", "wanted"))
    assert(FeatureService.readLayer(spark, svc, "crashed").count() == 1)
    assert(!Files.exists(Paths.get(svc, "layer=orphan")))
  }

  test("CountryCache readThrough retries transient failures and degrades to a stale release") {
    val cache = new CountryCache(spark, tmpDir() + "/cache")
    cache.put(CacheKey("AF", "places", "place", "2026-01"), pointsDf, "2026-01-01")

    // failing-then-succeeding compute: retried to success, cached.
    val newKey = CacheKey("AF", "places", "place", "2026-02")
    var calls = 0
    val ok = cache.readThrough(newKey, Set("id", "kind"), "2026-02-01",
      maxAttempts = 3, backoffMs = 1L) {
      calls += 1
      if (calls < 3) throw new RuntimeException("transient") else pointsDf
    }
    assert(ok.count() == 20 && calls == 3 && cache.exists(newKey))

    // every attempt fails -> the newest complete OLDER release is
    // served instead of failing the pipeline; nothing is cached for
    // the failed release.
    val newer = CacheKey("AF", "places", "place", "2026-03")
    var fails = 0
    val stale = cache.readThrough(newer, Set("id", "kind"), "2026-03-01",
      maxAttempts = 2, backoffMs = 1L) { fails += 1; throw new RuntimeException("down") }
    assert(fails == 2 && stale.count() == 20 && !cache.exists(newer))

    // no stale fallback anywhere -> the last error propagates.
    intercept[RuntimeException] {
      cache.readThrough(CacheKey("KE", "roads", "road", "2026-01"), Set("id"),
        "2026-01-01", maxAttempts = 2, backoffMs = 1L) {
        throw new RuntimeException("down")
      }
    }
  }

  test("dynamic partition overwrite replaces only incoming partitions") {
    val dir = tmpDir() + "/layer"
    val full = tables.events
      .select(col("event_id"), col("event_type"), col("value"))
    Exporter.writePartitioned(full, dir, "event_type")
    val before = spark.read.parquet(dir)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // refresh ONE partition with a reduced batch
    val patch = full.filter(col("event_type") === "click").limit(5)
    Exporter.writePartitioned(patch, dir, "event_type")

    val after = spark.read.parquet(dir)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after("click") == 5)                       // replaced
    (before.keySet - "click").foreach { k =>
      assert(after(k) == before(k), s"partition $k was disturbed") // untouched
    }
  }

  test("multilayer GeoJSON: one FeatureCollection, layer-tagged features, per-layer metadata") {
    import spark.implicits._
    val file = tmpDir() + "/multi.geojson"
    val places = Seq((1L, "school", 10.0, 20.0), (2L, "college", 11.0, 21.0))
      .toDF("id", "kind", "x", "y")
    val buildings = Seq((7L, 3.5, -1.0, -2.0)).toDF("id", "height", "x", "y")
    Exporter.writeGeoJsonLayers(
      Seq(
        ("places", places, GeoJson.pointGeometry(col("x"), col("y"))),
        ("buildings", buildings, GeoJson.pointGeometry(col("x"), col("y")))),
      file, target = "education", generatedAt = "2026-01-01T00:00:00")
    val content = new String(Files.readAllBytes(Paths.get(file)), "UTF-8")
    assert(content.startsWith("""{"type":"FeatureCollection","features":["""))
    assert(content.contains(""""layers":{"places":2,"buildings":1}"""))
    assert(content.contains(""""total_count":3"""))
    val parsed = spark.read.option("multiLine", "true").json(file)
    val feats = parsed.select(explode(col("features")).as("f"))
      .select(col("f.properties.layer").as("layer"), col("f.properties.id").as("id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
    assert(feats.toSeq == Seq(("places", 1L), ("places", 2L), ("buildings", 7L)))
    // duplicate layer names refuse with the typed error
    val e = intercept[graft.ExportError] {
      Exporter.writeGeoJsonLayers(
        Seq(("a", places, GeoJson.pointGeometry(col("x"), col("y"))),
          ("a", buildings, GeoJson.pointGeometry(col("x"), col("y")))),
        tmpDir() + "/dup.geojson", target = "t")
    }
    assert(e.getMessage.contains("duplicate layer"))
  }

  test("multilayer GeoJSON hardening: pre-existing 'layer' column refuses; layer names JSON-escape") {
    import spark.implicits._
    val withLayer = Seq((1L, "shadow", 1.0, 2.0)).toDF("id", "layer", "x", "y")
    // a frame already carrying `layer` would have its property
    // silently overwritten by the injected layer id — typed refusal
    val e = intercept[graft.ExportError] {
      Exporter.writeGeoJsonLayers(
        Seq(("places", withLayer, GeoJson.pointGeometry(col("x"), col("y")))),
        tmpDir() + "/shadow.geojson", target = "t")
    }
    assert(e.getMessage.contains("'layer' column"))
    // a quote in a layer name must escape, not break the document
    val file = tmpDir() + "/quoted.geojson"
    val df = Seq((1L, 1.0, 2.0)).toDF("id", "x", "y")
    Exporter.writeGeoJsonLayers(
      Seq(("""he"said""", df, GeoJson.pointGeometry(col("x"), col("y")))),
      file, target = """t"gt""", generatedAt = "2026-01-01T00:00:00")
    val parsed = spark.read.option("multiLine", "true").json(file)
    val meta = parsed.select(col("metadata.total_count"),
      col("metadata.target")).collect()(0)
    assert(meta.getLong(0) == 1L)
    assert(meta.getString(1) == """t"gt""")
    assert(!parsed.columns.contains("_corrupt_record"))
  }
}
