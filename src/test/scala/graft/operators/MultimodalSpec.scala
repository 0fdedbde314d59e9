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
}
