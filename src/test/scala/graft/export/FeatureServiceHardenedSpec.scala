package graft.`export`

import graft.SparkSpec
import java.nio.file.Files

/** The round-7 publish additions: item metadata sidecar
  * (publish.py:234-342 analogue) and the hardened seed/append path
  * (publish.py:478/505/604/646) — walked through success, transient
  * retry, crash, and timeout shapes.
  */
class FeatureServiceHardenedSpec extends SparkSpec {
  import spark.implicits._
  import FeatureService._

  private def tmp(): String = Files.createTempDirectory("graft-fsh").toString

  private def df(n: Int) =
    spark.range(n).select(
      org.apache.spark.sql.functions.col("id"),
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("v"),
        org.apache.spark.sql.functions.col("id")).as("v"))

  test("tag and visibility normalization match the reference rules") {
    assert(normalizeTags(" a, b ,, c ") == Seq("a", "b", "c"))
    assert(normalizeTags(null) == Nil)
    assert(normalizeTagList(Seq(" x ", null, "", "y")) == Seq("x", "y"))
    assert(normalizeVisibility(" Public ") == "public")
    assert(normalizeVisibility("ORG") == "org")
    assert(normalizeVisibility("everyone") == "private")
    assert(normalizeVisibility(null) == "private")
  }

  test("metadata applies additively and no-ops on an identical re-apply") {
    val svc = tmp()
    FeatureService.publish(df(5), svc, "l1", PublishMode.Initial)
    val first = applyItemMetadata(spark, svc, "l1", ItemMetadata(
      title = Some("Roads"), tags = Some(Seq("roads", "osm")),
      visibility = "org", groups = Seq("g1")))
    assert(first.updated &&
      first.appliedFields.toSet == Set("title", "tags", "visibility", "groups"))
    // identical desired state -> nothing written
    val again = applyItemMetadata(spark, svc, "l1", ItemMetadata(
      title = Some("Roads"), tags = Some(Seq("osm", "roads")), // set-equal
      visibility = "org", groups = Seq("g1")))
    assert(!again.updated && again.appliedFields.isEmpty)
    // visibility never downgrades; groups are additive; unknown skipped
    val down = applyItemMetadata(spark, svc, "l1", ItemMetadata(
      visibility = "private", groups = Seq("g2", "ghost", "g1")),
      knownGroup = Set("g1", "g2"))
    assert(down.updated && down.appliedFields == Seq("groups"))
    assert(down.skippedGroups == Seq("ghost"))
    val back = readItemMetadata(spark, svc, "l1").get
    assert(back.title.contains("Roads") && back.visibility == "org" &&
      back.groups == Seq("g1", "g2"))
    // escaping survives the sidecar round trip
    applyItemMetadata(spark, svc, "l1", ItemMetadata(
      description = Some("line1\nline2 \"quoted\" \\slash")))
    assert(readItemMetadata(spark, svc, "l1").get.description
      .contains("line1\nline2 \"quoted\" \\slash"))
  }

  test("metadata on an unpublished layer fails fast") {
    val svc = tmp()
    intercept[IllegalArgumentException] {
      applyItemMetadata(spark, svc, "nope", ItemMetadata(title = Some("x")))
    }
  }

  test("seed-then-append equals a one-shot publish") {
    val svc = tmp()
    val data = df(100)
    val rep = initialWithSeedAndAppend(data, svc, "big", "id",
      keyMin = 0L, keyMax = 99L, seedSpan = 10L, span = 25L)
    assert(rep.rowsAppended == 90 && rep.halvings == 0)
    val out = readLayer(spark, svc, "big")
    assert(out.count() == 100)
    assert(out.select("id").as[Long].collect().sorted.toSeq == (0L until 100L))
    // and re-running INITIAL on the same layer refuses
    intercept[IllegalStateException] {
      initialWithSeedAndAppend(data, svc, "big", "id", 0L, 99L, 10L, 25L)
    }
    // empty input: no layer created, clean no-op report
    val empty = initialWithSeedAndAppend(df(0), svc, "nothing", "id", 0L, 99L, 10L, 25L)
    assert(empty.rowsAppended == 0 && !layerExists(spark, svc, "nothing"))
  }

  test("transient failures halve the window and retry without loss or duplication") {
    val svc = tmp()
    FeatureService.publish(df(100).filter("id < 10"), svc, "adaptive", PublishMode.Initial)
    val rest = df(100).filter("id >= 10")
    // transport rejects any batch of more than 16 keys (a 413 analogue)
    val rep = appendBatches(rest, svc, "adaptive", "id", 10L, 99L, span = 64L) { b =>
      if (b.count() > 16) throw new TransientAppendError("413 payload too large")
      appendItemHardened(b, svc, "adaptive")
    }
    assert(rep.halvings >= 2 && rep.finalSpan <= 16L)
    assert(rep.rowsAppended == 90)
    val ids = readLayer(spark, svc, "adaptive").select("id").as[Long].collect().sorted.toSeq
    assert(ids == (0L until 100L)) // nothing lost, nothing doubled
    assert(orphanAppendItems(spark, svc).isEmpty) // temp items all reaped
  }

  test("a transient failure at minimum span propagates instead of spinning") {
    val svc = tmp()
    FeatureService.publish(df(2), svc, "stuck", PublishMode.Initial)
    val e = intercept[RuntimeException] {
      appendBatches(df(4).filter("id >= 2"), svc, "stuck", "id", 2L, 3L,
        span = 2L, minSpan = 1L) { _ =>
        throw new TransientAppendError("504 forever")
      }
    }
    assert(e.getMessage.contains("minimum span"))
  }

  test("a non-transient mid-commit failure rolls the batch back; live layer intact") {
    val svc = tmp()
    FeatureService.publish(df(10), svc, "rb", PublishMode.Initial)
    val before = readLayer(spark, svc, "rb").count()
    intercept[RuntimeException] {
      appendBatches(df(20).filter("id >= 10"), svc, "rb", "id", 10L, 19L, span = 10L) { b =>
        appendItemHardened(b, svc, "rb")
        throw new RuntimeException("schema rejected") // after commit: propagates
      }
    }
    // the injected failure above happened after a real commit — the
    // walker propagates it; an unknown target layer refuses before
    // any write at all
    intercept[IllegalArgumentException] {
      appendItemHardened(df(30).filter("id >= 20"), svc, "rb__no_such_layer___")
    }
    // rb grew only by the one committed batch
    assert(readLayer(spark, svc, "rb").count() == before + 10)
    assert(orphanAppendItems(spark, svc).isEmpty)
  }

  test("pollAppendJob: completes, fails, and times out") {
    val seq = Iterator("running", "running", "completed")
    pollAppendJob(() => seq.next(), timeoutMs = 1000L, intervalMs = 1L)
    intercept[RuntimeException] {
      pollAppendJob(() => "failed", timeoutMs = 1000L, intervalMs = 1L)
    }
    val e = intercept[RuntimeException] {
      pollAppendJob(() => "running", timeoutMs = 30L, intervalMs = 1L)
    }
    assert(e.getMessage.contains("timed out"))
  }
}
