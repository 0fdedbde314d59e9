package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("withBinaryMeta computes size, magic byte, checksum") {
    val df = Seq((1L, "ABC")).toDF("id", "t")
      .withColumn("payload", col("t").cast("binary"))
    val r = Multimodal.withBinaryMeta(df, "payload")
      .select("n_bytes", "magic_byte", "checksum").head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 65L)
    assert(r.getString(2).length == 8)
  }

  test("magic_byte reads the raw first BYTE, not a UTF-8 decode (regression)") {
    val jpegish = Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte)
    val pngish = Array(0x89.toByte, 0x50.toByte)
    val df = Seq((1L, jpegish), (2L, pngish)).toDF("id", "payload")
    val out = Multimodal.withBinaryMeta(df, "payload")
      .orderBy("id").select("magic_byte").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(255L, 137L))
  }

  test("decodeFeatures is deterministic and batch-shaped") {
    val df = tables.documents
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .limit(50)
    val a = Multimodal.decodeFeatures(df, "doc_id", "payload").collect()
    val b = Multimodal.decodeFeatures(df, "doc_id", "payload").collect()
    assert(a.length == 50)
    assert(a.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq)
    a.foreach { r =>
      assert(r.getInt(1) >= 16 && r.getInt(2) >= 16 && r.getInt(3) >= 1)
      assert(r.getDouble(4) > 0.0)
    }
  }

  test("sampleFrames explodes strided frame indices") {
    val feats = Multimodal.decodeFeatures(
      tables.documents.select(col("doc_id"), col("text").cast("binary").as("payload")).limit(10),
      "doc_id", "payload")
    val frames = Multimodal.sampleFrames(feats, stride = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.getInt(1) % 2 == 0))
  }

  test("shardManifest: greedy budget packing, oversize and zero/null byte edges") {
    val df = Seq(
      ("a", 1L, Some(300L)),  // opens shard 0
      ("a", 2L, Some(300L)),  // fits: shard 0 @300
      ("a", 3L, Some(500L)),  // 600+500 > 1000 -> shard 1
      ("a", 4L, Some(2000L)), // oversize: owns shard 2
      ("a", 5L, None),        // null -> 0 bytes; 2000+0 > 1000 closes the oversize shard
      ("b", 9L, Some(0L))     // zero-byte payload opens b's shard 0
    ).toDF("src", "doc", "nbytes")
    val out = Multimodal
      .shardManifest(df, "src", "doc", "nbytes", budget = 1000L)
      .orderBy("source", "doc_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("a", 1L, 0L, 0L),
      ("a", 2L, 0L, 300L),
      ("a", 3L, 1L, 0L),
      ("a", 4L, 2L, 0L),   // oversize payload owns its shard
      ("a", 5L, 3L, 0L),
      ("b", 9L, 0L, 0L)))
  }
}
