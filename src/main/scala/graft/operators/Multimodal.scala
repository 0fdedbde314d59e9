package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: opaque binary payloads with typed
  * metadata, plus the decode/feature-extraction plumbing a media
  * pipeline needs.
  *
  * Every stage is REAL as of round 11 — nothing is simulated:
  * [[ImageIo]] encodes/decodes PNG/JPEG/BMP through the JDK's own
  * `javax.imageio` (headless-safe, no external library) inside the
  * partition-batched seam, [[AudioWav]] parses RIFF/WAVE PCM16 via
  * `javax.sound.sampled`, [[AviMjpeg]] walks the public RIFF/AVI
  * container for frame sampling, and [[DctPHash]] is the classic
  * DCT perceptual hash over the real decode.
  */
object Multimodal {

  /** Typed metadata over an opaque binary payload column:
    * byte size, leading magic byte, content digest. Pure column
    * math — at scale this is a map-only scan.
    */
  def withBinaryMeta(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("n_bytes", octet_length(col(payloadCol)).cast("long"))
      // First BYTE via hex, not a UTF-8 string cast: real media magic
      // numbers (0xFF JPEG, 0x89 PNG) are invalid UTF-8 and would
      // decode to U+FFFD under a string round-trip.
      .withColumn("magic_byte",
        conv(hex(substring(col(payloadCol), 1, 1)), 16, 10).cast("long"))
      .withColumn("checksum", substring(md5(col(payloadCol)), 1, 8))

  /** Frame sampling plan for video-ish payloads: every `stride`-th
    * frame index up to `n_frames` — the explode pattern that turns
    * one media row into per-frame work items without shuffling.
    */
  def sampleFrames(features: DataFrame, stride: Int): DataFrame =
    features.select(
      col("media_id"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Media near-dup pairs by decoded-feature blocking — the
    * perceptual-hash pipeline shape (block on coarse features, verify
    * candidates exactly) over decoded features: block key =
    * (width, height, n_frames), verify = mean-intensity delta
    * ≤ `meanEps` on 4-dp-rounded means (rounded BEFORE comparing so
    * the boundary is engine-deterministic). [[phashNearDup]] swaps
    * the block key for pHash bands; the join shape is identical.
    *
    * `features` is materialized once (localCheckpoint) before the
    * self-join — decode is the expensive stage and must not run
    * twice for the two join sides.
    */
  def featureNearDup(features: DataFrame, meanEps: Double): DataFrame = {
    val f = features
      .select(col("media_id"), col("width"), col("height"), col("n_frames"),
        round(col("mean_intensity"), 4).as("mi"))
      .localCheckpoint(true)
    f.as("a")
      .join(f.as("b"),
        col("a.width") === col("b.width") &&
          col("a.height") === col("b.height") &&
          col("a.n_frames") === col("b.n_frames") &&
          col("a.media_id") < col("b.media_id"))
      .filter(abs(col("a.mi") - col("b.mi")) <= meanEps)
      .select(
        col("a.media_id").as("media_a"),
        col("b.media_id").as("media_b"),
        round(abs(col("a.mi") - col("b.mi")), 4).as("intensity_delta"))
  }

  /** WebDataset-style shard manifest: whole payloads assigned
    * greedily to byte-budgeted shards within each source — a shard
    * closes when the next payload would overflow it (no payload
    * splitting; an oversized payload owns its shard). The greedy
    * reset depends on the previous SHARD boundary, not a running
    * sum, so it is inherently a per-source sequential pass; it runs
    * as `flatMapGroups` — the typed-API seam for exactly this kind
    * of per-key state machine — so the pass is LINEAR in the
    * source's payload count. (A previous HOF-fold formulation
    * rebuilt its accumulator array per element: O(n²) copies per
    * source, measured 12.5× at 10× data; the groups rewrite removes
    * the quadratic while keeping the identical one-exchange shuffle
    * shape.) Emits (doc, shard, offset): exactly the index a
    * tar-shard writer consumes. null sizes normalize to 0 so an
    * unknown size can't poison the rest of the source's pack;
    * zero-byte payloads are legal and occupy no budget.
    */
  def shardManifest(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      bytesCol: String,
      budget: Long
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(sourceCol).cast("string").as("source"),
        col(idCol).cast("long").as("doc_id"),
        coalesce(col(bytesCol).cast("long"), lit(0L)).as("bytes"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (src, it) =>
        // (doc_id, bytes) order — same order array_sort gave the
        // fold formulation (deterministic, id-led)
        val payloads = it.toArray.sortBy(p => (p._2, p._3))
        var shard = -1L
        var used = 0L
        payloads.iterator.map { case (_, id, bytes) =>
          // the first payload always OPENS shard 0 (shard −1 is the
          // pre-start sentinel), whatever its size — including 0,
          // which the used+bytes>budget rule alone would misplace.
          if (shard == -1L || used + bytes > budget) { shard += 1L; used = 0L }
          val offset = used
          used += bytes
          (src, id, shard, offset)
        }
      }
      .toDF("source", "doc_id", "shard", "offset")
  }

  /** REAL 64-bit DCT perceptual hash — the classic pHash recipe
    * (public algorithm: pHash.org / the widely-reimplemented
    * imagehash variant) over the real [[ImageIo]] decode:
    *
    *   1. decode the compressed payload (`javax.imageio`),
    *   2. grayscale + bilinear resize to 32×32 (scale/format
    *      normalization — this is what makes the hash robust to
    *      resize and recompression),
    *   3. 2-D DCT-II (separable, precomputed cosine basis),
    *   4. keep the top-left 8×8 low-frequency coefficients,
    *   5. bit k set iff coefficient k exceeds the 64-coefficient
    *      median (median thresholding ≈ 32 set bits — maximally
    *      informative and brightness/contrast invariant).
    *
    * Near-duplicate images (resized/recompressed variants) land
    * within a few bits of Hamming distance; unrelated images are
    * ~32 bits apart. None for payloads no installed reader decodes.
    */
  object DctPHash {
    private val N = 32
    // cos((2x+1)·u·π / (2N)) for the separable DCT-II passes.
    private val Cos: Array[Array[Double]] =
      Array.tabulate(N, N)((u, x) => math.cos(((2 * x + 1) * u * math.Pi) / (2.0 * N)))

    /** Grayscale 32×32 bilinear reduction of a decoded image. */
    private def gray32(src: java.awt.image.BufferedImage): Array[Double] = {
      val dst = new java.awt.image.BufferedImage(
        N, N, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val g = dst.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(src, 0, 0, N, N, null)
      g.dispose()
      val raster = dst.getRaster
      val p = new Array[Double](N * N)
      var y = 0
      while (y < N) {
        var x = 0
        while (x < N) { p(y * N + x) = raster.getSample(x, y, 0).toDouble; x += 1 }
        y += 1
      }
      p
    }

    /** Top-left 8×8 block of the 32×32 2-D DCT-II (row pass, then
      * column pass; only the 8 low-frequency outputs of the second
      * pass are materialized). Scale factors are irrelevant to a
      * sign-vs-median threshold and are omitted.
      */
    private def dctLow(p: Array[Double]): Array[Double] = {
      // rows: t(y, u) = Σ_x p(y, x)·cos[u][x], u < 8
      val t = new Array[Double](N * 8)
      var y = 0
      while (y < N) {
        var u = 0
        while (u < 8) {
          var s = 0.0
          var x = 0
          while (x < N) { s += p(y * N + x) * Cos(u)(x); x += 1 }
          t(y * 8 + u) = s
          u += 1
        }
        y += 1
      }
      // columns: d(v, u) = Σ_y t(y, u)·cos[v][y], v < 8
      val d = new Array[Double](64)
      var v = 0
      while (v < 8) {
        var u = 0
        while (u < 8) {
          var s = 0.0
          var yy = 0
          while (yy < N) { s += t(yy * 8 + u) * Cos(v)(yy); yy += 1 }
          d(v * 8 + u) = s
          u += 1
        }
        v += 1
      }
      d
    }

    def phash(payload: Array[Byte]): Option[Long] = {
      val src =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: java.io.IOException => null }
      if (src == null) None
      else {
        val d = dctLow(gray32(src))
        val sorted = d.clone()
        java.util.Arrays.sort(sorted)
        val med = (sorted(31) + sorted(32)) / 2.0
        var h = 0L
        var k = 0
        while (k < 64) {
          if (d(k) > med) h |= (1L << k)
          k += 1
        }
        Some(h)
      }
    }
  }

  /** Per-media REAL pHash rows (media_id, phash) — partition-batched
    * like [[decodeImageStats]]: one decode context per batch,
    * payload bytes never shuffle, unreadable payloads drop.
    */
  def phashes(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val input = df
      .select(col(idCol).cast("long").as("_id"), col(payloadCol))
      .filter(col("_id").isNotNull && col(payloadCol).isNotNull)
    val rows = input.rdd.mapPartitions { it =>
      it.flatMap { r =>
        DctPHash.phash(r.getAs[Array[Byte]](1)).map(h => Row(r.getLong(0), h))
      }
    }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("phash", LongType, nullable = false))))
  }

  /** pHash near-dup pairs with Hamming distance ≤ `maxHamming`,
    * found by BAND BLOCKING, never all-pairs: the 64-bit hash splits
    * into `nBands` equal bands; by pigeonhole any pair within
    * `maxHamming < nBands` bit flips agrees on at least one whole
    * band, so the (band_idx, band_value) equi-join generates every
    * true pair — candidates then verify exactly with
    * bit_count(xor). At 100 TB the join fan-out is bounded by
    * bucket occupancy (hash-random 16-bit bands), the same regime
    * as MinHash-LSH; output pairs are (a < b), distinct, with their
    * exact hamming distance.
    */
  def phashNearDup(hashes: DataFrame, maxHamming: Int = 3, nBands: Int = 4): DataFrame = {
    require(maxHamming < nBands,
      s"pigeonhole needs maxHamming < nBands (got $maxHamming, $nBands)")
    require(64 % nBands == 0, s"nBands must divide 64 (got $nBands)")
    val width = 64 / nBands
    val mask = if (width == 64) -1L else (1L << width) - 1L
    val h = hashes.select(col("media_id"), col("phash"))
    val banded = h.select(col("media_id"), col("phash"),
      explode(array((0 until nBands).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("phash"), b * width).bitwiseAND(lit(mask)).as("bv"))): _*)).as("bb"))
      .select(col("media_id"), col("phash"),
        col("bb.band").as("band"), col("bb.bv").as("bv"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  // ----------------------------------------------------------------
  // Real image codec (JDK ImageIO) — round 10: the decode stage is
  // no longer simulated. PNG/JPEG/BMP encode + decode run through
  // `javax.imageio` (pure JDK, headless-safe, no external library),
  // inside the same mapPartitions batch seam the stub defined.
  // ----------------------------------------------------------------

  /** JDK-ImageIO codec. Encode exists so pipelines (and the oracle
    * protocol) can stage REAL compressed payloads deterministically;
    * decode is the production stage: parse the container, inflate /
    * entropy-decode the pixel data, and reduce it to per-channel
    * statistics without ever materializing rasters outside the
    * executor batch.
    */
  object ImageIo {
    // Never touch a display server or a disk cache from executors.
    System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)

    /** Encode a `w`×`h` RGB image, pixel values from `sample(x, y,
      * band)` (band 0 = R, 1 = G, 2 = B; values clamped to 0..255),
      * to the given format ("png", "jpg", "bmp"). PNG and BMP are
      * lossless: a decode returns the exact samples. For JPEG,
      * `quality` in (0, 1] selects the compression level (scaled
      * quantization tables); quality < 0 keeps the writer default.
      */
    def encode(w: Int, h: Int, format: String, quality: Double = -1.0)(
        sample: (Int, Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var c = 0
          while (c < 3) {
            raster.setSample(x, y, c, math.max(0, math.min(255, sample(x, y, c))))
            c += 1
          }
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      if (quality >= 0.0) {
        val writers = javax.imageio.ImageIO.getImageWritersByFormatName(format)
        require(writers.hasNext, s"no ImageIO writer for $format")
        val writer = writers.next()
        val param = writer.getDefaultWriteParam
        if (param.canWriteCompressed) {
          param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
          param.setCompressionQuality(quality.toFloat)
        }
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        try {
          writer.setOutput(ios)
          writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
        } finally { ios.close(); writer.dispose() }
      } else {
        require(javax.imageio.ImageIO.write(img, format, bos), s"no ImageIO writer for $format")
      }
      bos.toByteArray
    }

    /** Decoded-image statistics: (width, height, bands, per-band
      * pixel-value sums). Returns None for payloads no installed
      * reader recognizes (corrupt/unknown magic) — a media corpus
      * fact of life the pipeline skips, never throws on.
      */
    def decodeStats(payload: Array[Byte]): Option[(Int, Int, Int, Array[Long])] = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: java.io.IOException => null }
      if (img == null) None
      else {
        val raster = img.getRaster
        val w = img.getWidth
        val h = img.getHeight
        val bands = raster.getNumBands
        val sums = new Array[Long](bands)
        val row = new Array[Int](w)
        var b = 0
        while (b < bands) {
          var s = 0L
          var y = 0
          while (y < h) {
            raster.getSamples(0, y, w, 1, b, row)
            var x = 0
            while (x < w) { s += row(x); x += 1 }
            y += 1
          }
          sums(b) = s
          b += 1
        }
        Some((w, h, bands, sums))
      }
    }

    /** Bilinear resize (the feature-extraction pre-step): pure-JDK
      * Graphics2D with BILINEAR interpolation, returning the resized
      * image's per-band pixel sums alongside its dims.
      */
    def resizeStats(payload: Array[Byte], outW: Int, outH: Int): Option[(Int, Int, Array[Long])] = {
      val src =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: java.io.IOException => null }
      if (src == null) None
      else {
        val dst = new java.awt.image.BufferedImage(
          outW, outH, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        val g = dst.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, outW, outH, null)
        g.dispose()
        val raster = dst.getRaster
        val sums = new Array[Long](3)
        var b = 0
        while (b < 3) {
          var s = 0L
          var y = 0
          while (y < outH) {
            var x = 0
            while (x < outW) { s += raster.getSample(x, y, b); x += 1 }
            y += 1
          }
          sums(b) = s
          b += 1
        }
        Some((outW, outH, sums))
      }
    }
  }

  /** REAL audio codec seam — `javax.sound.sampled` (pure JDK, no
    * external library): RIFF/WAVE container write and parse for
    * 16-bit signed PCM. The audio sibling of [[ImageIo]]: encode
    * produces a real .wav byte stream (`file` would say "RIFF …
    * WAVE audio"), decode is the JDK's own container parser + frame
    * reader, so a mis-parsed header or byte order lands off the
    * oracle's fixed point.
    */
  object AudioWav {

    /** Encode `n` mono 16-bit PCM samples at `sampleRate` Hz from
      * `sample(i)` (clamped to the signed-16 range) into a real WAV
      * container. Lossless: a decode returns the exact samples.
      */
    def encode(n: Int, sampleRate: Float)(sample: Int => Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
      val pcm = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val v = math.max(-32768, math.min(32767, sample(i)))
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Decoded-audio statistics: (sampleRate, channels, nFrames,
      * sum, sumSq, peakAbs) over all channels' 16-bit samples —
      * exact longs (sumSq ≤ n·2³⁰, overflow-safe to ~8·10⁹ frames
      * per payload). None for payloads no installed reader
      * recognizes or non-PCM16 encodings (decode-or-drop).
      */
    def decodeStats(payload: Array[Byte]): Option[(Int, Int, Long, Long, Long, Long)] = {
      val ais =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => null
          case _: java.io.IOException => null
        }
      if (ais == null) None
      else {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 ||
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
        else {
          val bytes = ais.readAllBytes()
          val big = fmt.isBigEndian
          var i = 0
          var sum = 0L
          var sumSq = 0L
          var peak = 0L
          while (i + 1 < bytes.length) {
            val v =
              if (big) ((bytes(i) << 8) | (bytes(i + 1) & 0xff)).toShort.toLong
              else ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort.toLong
            sum += v
            sumSq += v * v
            if (math.abs(v) > peak) peak = math.abs(v)
            i += 2
          }
          val frames = (bytes.length / 2) / fmt.getChannels
          Some((fmt.getSampleRate.toInt, fmt.getChannels, frames.toLong, sum, sumSq, peak))
        }
      }
    }
  }

  /** REAL video container seam — AVI/MJPEG from the public RIFF/AVI
    * layout (Microsoft's published 'RIFF AVI' structure: `RIFF('AVI '
    * LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi' 00dc…)
    * idx1)`): the video leg of the K2 seam. Encode produces a real
    * .avi byte stream (standard players/ffmpeg read it); frame
    * lookup PARSES the container — walks the chunk tree to `movi`
    * and reads the `idx1` index — and each sampled frame is a real
    * JPEG decoded by [[ImageIo]]. The pipeline stage a video corpus
    * needs (seek by index, decode only sampled frames) with no
    * simulated step.
    */
  object AviMjpeg {

    private def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

    private def le32(v: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(v); b.array()
    }

    /** Encode MJPEG frames (each a complete JPEG byte stream of the
      * same w×h) into a real AVI container at `fps`.
      */
    def encode(frames: Seq[Array[Byte]], w: Int, h: Int, fps: Int): Array[Byte] = {
      require(frames.nonEmpty, "at least one frame")
      val out = new java.io.ByteArrayOutputStream()
      def chunk(id: String, body: Array[Byte]): Array[Byte] = {
        val pad = body.length % 2
        val b = new Array[Byte](8 + body.length + pad)
        System.arraycopy(fcc(id), 0, b, 0, 4)
        System.arraycopy(le32(body.length), 0, b, 4, 4)
        System.arraycopy(body, 0, b, 8, body.length)
        b
      }
      def list(kind: String, body: Array[Byte]): Array[Byte] =
        chunk("LIST", fcc(kind) ++ body)

      val maxBytes = frames.map(_.length).max
      // avih: 14 DWORDs (MainAVIHeader)
      val avih = chunk("avih", Array.concat(
        le32(1000000 / fps), le32(maxBytes * fps), le32(0), le32(0x10),
        le32(frames.length), le32(0), le32(1), le32(maxBytes),
        le32(w), le32(h), le32(0), le32(0), le32(0), le32(0)))
      // strh: fccType 'vids', handler 'MJPG', scale/rate = 1/fps
      val strh = chunk("strh", Array.concat(
        fcc("vids"), fcc("MJPG"), le32(0), le32(0), le32(0),
        le32(1), le32(fps), le32(0), le32(frames.length),
        le32(maxBytes), le32(-1), le32(0), le32(0), le32(0)))
      // strf: BITMAPINFOHEADER
      val strf = chunk("strf", Array.concat(
        le32(40), le32(w), le32(h), Array[Byte](1, 0, 24, 0),
        fcc("MJPG"), le32(w * h * 3), le32(0), le32(0), le32(0), le32(0)))
      val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
      val moviChunks = frames.map(f => chunk("00dc", f))
      val movi = list("movi", moviChunks.flatten.toArray)
      // idx1: one entry per frame — offset counted from the start of
      // the 'movi' list's type fourcc (the widely-used convention).
      val idxEntries = {
        var off = 4
        frames.zip(moviChunks).map { case (f, c) =>
          val e = Array.concat(fcc("00dc"), le32(0x10), le32(off), le32(f.length))
          off += c.length
          e
        }
      }
      val idx1 = chunk("idx1", idxEntries.flatten.toArray)
      val riffBody = fcc("AVI ") ++ hdrl ++ movi ++ idx1
      out.write(fcc("RIFF")); out.write(le32(riffBody.length)); out.write(riffBody)
      out.toByteArray
    }

    /** Parse the container and return each frame's (absoluteOffset,
      * size) by walking the RIFF tree to the `movi` list and reading
      * the `idx1` index — a real container parse (bad magic or a
      * missing index → None, the decode-or-drop convention).
      */
    def frameIndex(payload: Array[Byte]): Option[Seq[(Long, Int)]] = {
      val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def four(p: Int): String =
        new String(payload, p, 4, "US-ASCII")
      if (payload.length < 12 || four(0) != "RIFF" || four(8) != "AVI ") return None
      var p = 12
      var moviPos = -1
      var idxPos = -1
      var idxLen = 0
      while (p + 8 <= payload.length) {
        val id = four(p)
        val len = bb.getInt(p + 4)
        // A corrupt/adversarial chunk length must not loop forever
        // (len = -8 leaves p unchanged) or walk p past the payload:
        // decode-or-drop, never throw or hang.
        if (len < 0 || p.toLong + 8L + len > payload.length) return None
        if (id == "LIST" && p + 12 <= payload.length && four(p + 8) == "movi") moviPos = p + 8
        if (id == "idx1") { idxPos = p + 8; idxLen = len }
        p += 8 + len + (len % 2)
      }
      if (moviPos < 0 || idxPos < 0) return None
      val n = idxLen / 16
      val frames = (0 until n).flatMap { i =>
        val e = idxPos + 16 * i
        if (four(e) == "00dc") {
          val off = bb.getInt(e + 8)
          val size = bb.getInt(e + 12)
          // idx1 offsets count from the movi list's type fourcc;
          // +8 skips the frame chunk's own header.
          Some((moviPos.toLong + off + 8L, size))
        } else None
      }
      Some(frames)
    }

    /** Sample every `step`-th frame and REALLY decode it: container
      * parse for the byte range, [[ImageIo.decodeStats]] (JPEG
      * entropy decode) for the raster stats. Returns
      * (frameIdx, byteOffset, width, height, sums) per sampled frame.
      */
    def sampleDecode(payload: Array[Byte], step: Int): Seq[(Int, Long, Int, Int, Array[Long])] = {
      frameIndex(payload).toSeq.flatMap { frames =>
        frames.zipWithIndex.collect {
          case ((off, size), i)
              if i % step == 0 && off >= 0 && size >= 0 &&
                off + size <= payload.length =>
            val bytes = java.util.Arrays.copyOfRange(payload, off.toInt, off.toInt + size)
            ImageIo.decodeStats(bytes).map { case (w, h, _, sums) =>
              (i, off, w, h, sums)
            }
        }.flatten
      }
    }
  }

  /** Decoded-audio feature row (real codec): container header fields
    * plus exact integer sample reductions — fully oracle-able for a
    * lossless PCM payload.
    */
  val AudioStatsSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("sample_rate", LongType, nullable = false),
    StructField("n_channels", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("sum_s", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("peak_abs", LongType, nullable = false)))

  /** REAL partition-batched audio decode over WAV payloads — the
    * audio leg of the K2 seam, same plumbing contract as
    * [[decodeImageStats]]: payload bytes never shuffle, unreadable
    * payloads are skipped, output is model-sized stats.
    */
  def decodeAudioStats(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val input = df
      .select(col(idCol).cast("long").as("_id"), col(payloadCol))
      .filter(col("_id").isNotNull && col(payloadCol).isNotNull)
    val rows = input.rdd.mapPartitions { it =>
      it.flatMap { r =>
        AudioWav.decodeStats(r.getAs[Array[Byte]](1)).map {
          case (rate, ch, frames, sum, sumSq, peak) =>
            Row(r.getLong(0), rate.toLong, ch.toLong, frames, sum, sumSq, peak)
        }
      }
    }
    spark.createDataFrame(rows, AudioStatsSchema)
  }

  /** Decoded-image feature row (real codec): dims, band count, and
    * exact per-band pixel sums (R, G, B) as longs — bit-exact across
    * partitionings, so a lossless payload is fully oracle-able.
    */
  val ImageStatsSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("n_channels", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false)))

  /** REAL partition-batched image decode: `javax.imageio` parses
    * each binary payload (PNG inflate + unfilter, JPEG entropy
    * decode, BMP) and reduces it to [[ImageStatsSchema]] rows.
    * Unreadable payloads are skipped (decode-or-drop, the media
    * ingest convention). Same plumbing contract the stub defined:
    * one reader context per partition batch, payload bytes never
    * shuffle, output is model-sized stats.
    */
  def decodeImageStats(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val input = df
      .select(col(idCol).cast("long").as("_id"), col(payloadCol))
      .filter(col("_id").isNotNull && col(payloadCol).isNotNull)
    val rows = input.rdd.mapPartitions { it =>
      it.flatMap { r =>
        ImageIo.decodeStats(r.getAs[Array[Byte]](1)).map { case (w, h, bands, sums) =>
          Row(r.getLong(0), w.toLong, h.toLong, bands.toLong,
            if (bands > 0) sums(0) else 0L,
            if (bands > 1) sums(1) else 0L,
            if (bands > 2) sums(2) else 0L)
        }
      }
    }
    spark.createDataFrame(rows, ImageStatsSchema)
  }
}
