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

  test("sampleFrames explodes strided frame indices from real decoded features") {
    val feats = Seq((1L, 5), (2L, 1), (3L, 4))
      .toDF("media_id", "n_frames")
    val frames = Multimodal.sampleFrames(feats, stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(frames == Set((1L, 0), (1L, 2), (1L, 4), (2L, 0), (3L, 0), (3L, 2)))
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

  // --- ImageIo: the REAL codec (round 10) ---

  test("ImageIo PNG roundtrip is bit-exact with RGB band order") {
    // 2x1: pixel (0,0) = (10, 20, 30), pixel (1,0) = (200, 0, 255)
    val vals = Array(Array(10, 20, 30), Array(200, 0, 255))
    val png = Multimodal.ImageIo.encode(2, 1, "png")((x, _, c) => vals(x)(c))
    // real PNG container: magic 0x89 'P' 'N' 'G'
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte && png(2) == 'N'.toByte)
    val Some((w, h, bands, sums)) = Multimodal.ImageIo.decodeStats(png)
    assert(w == 2 && h == 1 && bands == 3)
    // band 0 must be RED (not the BGR storage order)
    assert(sums.toSeq == Seq(210L, 20L, 285L))
  }

  test("ImageIo decodeStats skips unreadable payloads, decodes BMP and JPEG") {
    assert(Multimodal.ImageIo.decodeStats("not an image".getBytes).isEmpty)
    assert(Multimodal.ImageIo.decodeStats(Array[Byte]()).isEmpty)
    val bmp = Multimodal.ImageIo.encode(3, 2, "bmp")((x, y, c) => 10 * c + x + y)
    assert(Multimodal.ImageIo.decodeStats(bmp).exists { case (w, h, b, s) =>
      w == 3 && h == 2 && b == 3 &&
        s.toSeq == Seq(0 + 1 + 2 + 1 + 2 + 3, 6 * 10 + 9, 6 * 20 + 9).map(_.toLong)
    })
    val jpg = Multimodal.ImageIo.encode(16, 16, "jpg")((_, _, c) => 64 * c + 32)
    val Some((w, h, _, sums)) = Multimodal.ImageIo.decodeStats(jpg)
    assert(w == 16 && h == 16)
    // lossy but bounded: constant image means survive within 2 levels
    for (c <- 0 until 3)
      assert(math.abs(sums(c) / 256.0 - (64 * c + 32)) <= 2.0, s"band $c: ${sums(c) / 256.0}")
  }

  test("ImageIo resizeStats: constant image stays constant, dims honored") {
    val png = Multimodal.ImageIo.encode(12, 8, "png")((_, _, c) => 50 + c)
    val Some((w, h, sums)) = Multimodal.ImageIo.resizeStats(png, 6, 4)
    assert(w == 6 && h == 4)
    // bilinear of a constant is the constant, exactly
    assert(sums.toSeq == Seq(50L * 24, 51L * 24, 52L * 24))
    assert(Multimodal.ImageIo.resizeStats("garbage".getBytes, 4, 4).isEmpty)
  }

  test("decodeImageStats: distributed real decode, drop-not-throw on corrupt rows") {
    val good = Multimodal.ImageIo.encode(4, 3, "png")((x, y, c) => c + x + y)
    val df = Seq(
      (1L, good),
      (2L, "corrupt payload".getBytes),
      (3L, Multimodal.ImageIo.encode(2, 2, "png")((_, _, _) => 7))
    ).toDF("media_id", "payload").repartition(3)
    val out = Multimodal.decodeImageStats(df, "media_id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).sortBy(_._1)
    assert(out.length == 2) // corrupt row dropped, not thrown
    // sum over 4x3 of (c + x + y): sum(x+y) = 3*(0+1+2+3) + 4*(0+1+2) = 18+12 = 30
    assert(out(0) == ((1L, 4L, 3L, 3L, 30L, 42L, 54L)))
    assert(out(1) == ((3L, 2L, 2L, 3L, 28L, 28L, 28L)))
  }

  test("AviMjpeg.frameIndex: corrupt chunk lengths drop, never hang or throw") {
    val jpg = Multimodal.ImageIo.encode(8, 8, "jpg")((x, y, c) => c + x + y)
    val avi = Multimodal.AviMjpeg.encode(Seq(jpg, jpg), 8, 8, fps = 10)
    assert(Multimodal.AviMjpeg.frameIndex(avi).exists(_.length == 2))

    // len = -8 would leave the chunk-walk position unchanged (infinite
    // loop) without the guard; a huge len would walk p past the payload.
    def corrupt(len: Int): Array[Byte] = {
      val b = avi.clone()
      val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(16, len) // first chunk inside 'AVI ' body (the hdrl LIST)
      b
    }
    assert(Multimodal.AviMjpeg.frameIndex(corrupt(-8)).isEmpty)
    assert(Multimodal.AviMjpeg.frameIndex(corrupt(Int.MaxValue - 2)).isEmpty)
    assert(Multimodal.AviMjpeg.frameIndex("RIFFxxxxAVI corrupt".getBytes).isEmpty)
  }
}
