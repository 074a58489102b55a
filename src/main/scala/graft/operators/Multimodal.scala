package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads are treated as
  * opaque `binary` columns with typed metadata, exactly as a 100 TB
  * training-data pipeline would carry them next to text.
  *
  * Four decode paths exist at the same per-partition plug-point:
  *  - [[decodeImageFeatures]] is a REAL image-codec round-trip —
  *    `javax.imageio` PNG decode (JDK built-in, no external libs) into a
  *    grayscale pixel histogram, fed by [[withMediaPng]]'s genuine
  *    PNG-encoded payloads;
  *  - [[decodeAudioFeatures]] is a REAL audio-container round-trip —
  *    `javax.sound.sampled` RIFF/WAVE parse (JDK built-in, headless)
  *    into a PCM16 amplitude histogram, fed by [[withMediaWav]];
  *  - [[decodeVideoFeatures]] is a REAL video-container round-trip — our
  *    own RIFF/AVI demux (chunk walk, avih parse, strh fccHandler codec
  *    dispatch, `movi` iteration) with per-frame `javax.imageio` decode,
  *    fed by [[withMediaAvi]]'s motion-PNG AVIs (lossless — pixel-exact
  *    oracle) or [[withMediaAviMjpeg]]'s motion-JPEG AVIs (the REAL
  *    lossy MJPEG codec; [[decodeVideoFidelity]] pins the decoded-pixel
  *    error band against the generator contract);
  *  - [[decodeFeatures]] keeps the clearly-marked deterministic fake
  *    (byte histogram) as the no-codecs fallback and plumbing-shape
  *    fixture — its gate (`q_media_features`) proves the plug-point,
  *    not a codec; every codec path above is real.
  * Everything around them — schema, partition-iterator batching, frame
  * sampling, metadata struct — is identical real Spark plumbing.
  */
object Multimodal {

  /** Attach a binary payload + metadata struct to each row (here the UTF-8
    * bytes of the text column stand in for a real media payload). */
  def withMedia(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol),
      col(payloadCol).cast("binary").as("media"),
      struct(
        octet_length(col(payloadCol).cast("binary")).as("n_bytes"),
        lit("application/x-fake").as("mime"),
        md5(col(payloadCol).cast("binary")).as("content_md5")
      ).as("media_meta"))

  /** Deterministic frame sampling: `nFrames` fixed-width byte slices at
    * even strides through the payload (the binary analog of video frame
    * sampling). Pure column expressions — no data leaves the executor. */
  def frameSamples(df: DataFrame, nFrames: Int = 4, frameLen: Int = 16): DataFrame = {
    val n = col("media_meta.n_bytes")
    val frames = sequence(lit(0), lit(nFrames - 1))
    df.withColumn("frames",
      transform(frames, f => {
        // long arithmetic: f * (n_bytes - frameLen) overflows Int once the
        // payload passes ~Int.MaxValue/nFrames bytes (video-sized blobs)
        val start = (f.cast("long") * greatest(n.cast("long") - frameLen, lit(1L)) / lit(nFrames)) + 1
        lower(hex(substring(col("media"), start.cast("int"), lit(frameLen))))
      }))
  }

  /** The decode plug-point: per-partition iterator over (id, payload) rows
    * producing a fixed-width feature vector. A real deployment swaps
    * `fakeDecode` for the actual decoder (e.g. JPEG → CNN features); the
    * signature, batching shape and schema stay identical.
    *
    * Implemented with `mapPartitions` (the Scala analog of `mapInPandas`):
    * rows stream through one partition at a time, never collected. */
  def decodeFeatures(spark: SparkSession, df: DataFrame, idCol: String,
                     nBuckets: Int = 16): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        // one iterator per partition: the decoder amortizes any per-batch
        // setup (codec contexts, model weights) across the partition
        iter.map { case (id, bytes) => (id, fakeDecode(bytes, nBuckets)) }
      }
      .toDF(idCol, "features")
  }

  /** Deterministic synthetic PNG payloads: a 16×16 8-bit grayscale image
    * whose pixel `i` (row-major) is the text's UTF-8 byte at `i mod len`
    * (0 for empty text), encoded through the REAL `javax.imageio` PNG
    * writer inside the per-partition iterator. Grayscale PNG is lossless,
    * so a downstream decode recovers the exact pixel bytes — which is what
    * lets a SQL oracle replay [[decodeImageFeatures]] bit-for-bit from the
    * text alone, while the payload passing through the pipeline is a real
    * codec artifact, not a fake. */
  def withMediaPng(spark: SparkSession, df: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { iter =>
        // one iterator per partition: the writer SPI lookup and the pixel
        // buffer are per-partition state, amortized across every row —
        // exactly the setup-amortization a real codec/model needs here
        val img = new java.awt.image.BufferedImage(
          PngSide, PngSide, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("png").next()
        iter.map { case (id, text) => (id, encodePngWith(img, writer, text)) }
      }
      .toDF(idCol, "media")
      .withColumn("media_meta", struct(
        octet_length(col("media")).as("n_bytes"),
        lit("image/png").as("mime"),
        md5(col("media")).as("content_md5")))
  }

  private def encodePngWith(img: java.awt.image.BufferedImage,
                            writer: javax.imageio.ImageWriter,
                            text: String,
                            pixelOffset: Int = 0,
                            param: javax.imageio.ImageWriteParam = null): Array[Byte] = {
    val bytes = if (text == null) Array.empty[Byte]
                else text.getBytes(StandardCharsets.UTF_8)
    val raster = img.getRaster
    var i = 0
    while (i < PngSide * PngSide) {
      val v = if (bytes.isEmpty) 0
              else bytes((i + pixelOffset) % bytes.length) & 0xff
      raster.setSample(i % PngSide, i / PngSide, 0, v)
      i += 1
    }
    val out = new ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    writer.setOutput(ios)
    // param = null → the writer's defaults (PNG); an explicit param
    // carries the JPEG quality setting for the MJPEG frames
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close()
    out.toByteArray
  }

  private[operators] def encodePng(text: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      PngSide, PngSide, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    try encodePngWith(img, writer, text) finally writer.dispose()
  }

  /** Edge length of the synthetic PNGs ([[withMediaPng]]). */
  val PngSide: Int = 16

  /** REAL image decode at the plug-point: `javax.imageio` PNG (or any
    * JDK-readable format) → normalized `nBuckets`-bucket grayscale pixel
    * histogram. Same `mapPartitions` shape as [[decodeFeatures]] — swap
    * the body for a CNN featurizer and nothing else changes. Fails loudly
    * on an undecodable payload (a corrupt blob silently scored as
    * all-zeros would poison downstream curation). */
  def decodeImageFeatures(spark: SparkSession, df: DataFrame, idCol: String,
                          nBuckets: Int = 16): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        // per-partition reader reuse: the PNG reader handles the fast path
        // without a per-row SPI scan; non-PNG payloads fall back to the
        // generic format-sniffing read (JPEG etc.)
        val pngReader = javax.imageio.ImageIO
          .getImageReadersByFormatName("png").next()
        iter.map { case (id, png) => (id, decodeImageWith(pngReader, png, nBuckets)) }
      }
      .toDF(idCol, "features")
  }

  /** REAL nearest-neighbor image resize at the plug-point: javax.imageio
    * decode → integer NN sample — source pixel `(dx·srcW DIV outW,
    * dy·srcH DIV outH)`, exact integer arithmetic so no FP-rounding
    * ambiguity between engines — → PNG re-encode. Grayscale band 0 is
    * resampled (the synthetic corpus is TYPE_BYTE_GRAY; for multi-band
    * sources this is the luminance-ish first band). Same per-partition
    * reader/writer/buffer amortization as the codecs; `media` is
    * replaced by the resized frame and `media_meta` rebuilt. Nearest
    * neighbor is chosen over bilinear DELIBERATELY: pixel values pass
    * through unchanged, which keeps the whole
    * encode→resize→decode→histogram chain bit-replayable by the SQL
    * oracle (bilinear would put an FP blend inside the codec chain). */
  def resizeImages(spark: SparkSession, df: DataFrame, idCol: String,
                   outW: Int, outH: Int): DataFrame = {
    require(outW >= 1 && outH >= 1, s"bad target geometry ${outW}x$outH")
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        val pngReader = javax.imageio.ImageIO
          .getImageReadersByFormatName("png").next()
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("png").next()
        val out = new java.awt.image.BufferedImage(
          outW, outH, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        iter.map { case (id, bytes) =>
          val src = readImageWith(pngReader, bytes)
          val (sw, sh) = (src.getWidth, src.getHeight)
          val sr = src.getRaster
          val or = out.getRaster
          var dy = 0
          while (dy < outH) {
            val sy = dy * sh / outH
            var dx = 0
            while (dx < outW) {
              or.setSample(dx, dy, 0, sr.getSample(dx * sw / outW, sy, 0))
              dx += 1
            }
            dy += 1
          }
          val bos = new ByteArrayOutputStream()
          val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
          writer.setOutput(ios)
          writer.write(null, new javax.imageio.IIOImage(out, null, null), null)
          ios.close()
          (id, bos.toByteArray)
        }
      }
      .toDF(idCol, "media")
      .withColumn("media_meta", struct(
        octet_length(col("media")).as("n_bytes"),
        lit("image/png").as("mime"),
        md5(col("media")).as("content_md5")))
  }

  /** PNG-fast-path image read with generic format-sniffing fallback;
    * fails loudly on undecodable payloads. */
  /** Perceptual difference hash (dHash, public technique) per image: the
    * REAL decode path → 9×8 nearest-neighbor grayscale sample (the
    * [[resizeImages]] integer geometry `sx = dx·sw/9, sy = dy·sh/8`) →
    * one bit per horizontal gradient `px(dx+1,dy) > px(dx,dy)`. The
    * scale/compression-robust image fingerprint that feeds
    * [[dhashPairs]]' banded near-dup join — the image-side mirror of the
    * text pipeline's simhash.
    *
    * 63 BITS by design: the (7,7) comparison is dropped so the hash
    * lives in a signed BIGINT without sign games (bit 63 would overflow
    * engines that check shifts). Bit layout: `dy·8 + dx`, dx < 8.
    * Integer-only sampling and comparisons — bit-replayable wherever
    * the pixel function is known. Emits (idCol, `dhash`). */
  def imageDHash(spark: SparkSession, df: DataFrame,
                 idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        val pngReader = javax.imageio.ImageIO
          .getImageReadersByFormatName("png").next()
        iter.map { case (id, bytes) =>
          val src = readImageWith(pngReader, bytes)
          val (sw, sh) = (src.getWidth, src.getHeight)
          val r = src.getRaster
          def px(dx: Int, dy: Int): Int =
            r.getSample(dx * sw / 9, dy * sh / 8, 0)
          var h = 0L
          var dy = 0
          while (dy < 8) {
            var dx = 0
            while (dx < 8) {
              if (!(dx == 7 && dy == 7) && px(dx + 1, dy) > px(dx, dy))
                h |= 1L << (dy * 8 + dx)
              dx += 1
            }
            dy += 1
          }
          (id, h)
        }
      }
      .toDF(idCol, "dhash")
  }

  /** All image pairs within `maxHamming` bits on their [[imageDHash]] —
    * the chunk-banding pigeonhole ([[Dedup.simhashPairs]] lifted to the
    * 63-bit hash): split into `maxHamming+1` disjoint ⌈63/(m+1)⌉-bit
    * chunks; a
    * pair within the budget must agree on SOME chunk, so candidates come
    * from per-chunk equi-joins (shuffle on (chunk, value) — scales with
    * true near-dups, never n²), each pair emitted once at its FIRST
    * matching chunk (a pure bit-arithmetic filter, no distinct
    * shuffle). Emits (`id_a`, `id_b`, `hamming`). */
  def dhashPairs(hashes: DataFrame, idCol: String,
                 maxHamming: Int = 3,
                 maxPairs: Long = Guards.DefaultMaxCandidatePairs): DataFrame = {
    require(maxHamming >= 1 && maxHamming <= 7,
      s"maxHamming in [1,7], got $maxHamming")
    val nChunks = maxHamming + 1
    // ceil(63/chunks): the chunks tile ALL 63 bits (the pigeonhole needs
    // full coverage — a short last chunk would leak pairs)
    val chunkBits = (63 + nChunks - 1) / nChunks
    // r13 pair budget: a flood of (near-)identical images shares every
    // chunk bucket — predict Σ C(m,2) over (c, chunk_val), fail loudly
    val chunked = Guards.pairBudget(
      hashes.select(col(idCol), col("dhash"),
          explode(sequence(lit(0), lit(nChunks - 1))).as("c"))
        .withColumn("chunk_val",
          expr(s"shiftright(dhash, c * $chunkBits)") % (1L << chunkBits)),
      Seq("c", "chunk_val"), maxPairs, "Multimodal.dhashPairs")
    val a = chunked.select(col(idCol).as("id_a"), col("dhash").as("fp_a"),
      col("c"), col("chunk_val"))
    val b = chunked.select(col(idCol).as("id_b"), col("dhash").as("fp_b"),
      col("c"), col("chunk_val"))
    def chunkAt(fp: String, k: Int) =
      expr(s"shiftright($fp, ${k * chunkBits})") % (1L << chunkBits)
    val firstMatchOnly = (0 until nChunks - 1)
      .map(k => (col("c") <= k) || (chunkAt("fp_a", k) =!= chunkAt("fp_b", k)))
      .reduce(_ && _)
    a.join(b, Seq("c", "chunk_val")).filter(col("id_a") < col("id_b"))
      .filter(firstMatchOnly)
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  private def readImageWith(pngReader: javax.imageio.ImageReader,
                            bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val img =
      try {
        // NEVER ImageIO.createImageInputStream here: with the default
        // useCache=true it backs EVERY image with a temp FILE — per-row
        // disk churn that turned the 30× scale probe convex (measured:
        // marginal cost 0.11 s/scale-unit in the first decade, 0.56 in
        // the second; flat after this fix). The in-memory stream never
        // touches the filesystem and needs no global setUseCache state.
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new ByteArrayInputStream(bytes))
        try { pngReader.setInput(iis, true, true); pngReader.read(0) }
        finally iis.close()
      } catch { case _: Exception =>
        javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      }
    require(img != null, "readImage: payload is not a decodable image")
    img
  }

  private def decodeImageWith(pngReader: javax.imageio.ImageReader,
                              bytes: Array[Byte], nBuckets: Int): Array[Double] = {
    val img = readImageWith(pngReader, bytes)
    val raster = img.getRaster
    val (w, h) = (img.getWidth, img.getHeight)
    val hist = new Array[Double](nBuckets)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = raster.getSample(x, y, 0) & 0xff
        hist((g * nBuckets) / 256) += 1.0
        x += 1
      }
      y += 1
    }
    val total = math.max(1.0, (w.toLong * h).toDouble)
    var j = 0
    while (j < nBuckets) { hist(j) /= total; j += 1 }
    hist
  }

  /** Deterministic synthetic WAV payloads: [[WavSamples]] PCM16 mono
    * samples at 8 kHz, sample `i` = `(byte_{i mod len} − 128) · 256`
    * (text's UTF-8 bytes, 0 for empty), written through the REAL
    * `javax.sound.sampled` RIFF/WAVE writer (JDK built-in, headless) in
    * the per-partition iterator. PCM is lossless, so a downstream decode
    * recovers the exact samples — the audio twin of [[withMediaPng]],
    * replayable by a SQL oracle from the text alone. */
  def withMediaWav(spark: SparkSession, df: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { iter =>
        // per-partition PCM buffer reuse — the codec-setup amortization
        val pcm = new Array[Byte](WavSamples * 2)
        iter.map { case (id, text) => (id, encodeWavWith(pcm, text)) }
      }
      .toDF(idCol, "media")
      .withColumn("media_meta", struct(
        octet_length(col("media")).as("n_bytes"),
        lit("audio/wav").as("mime"),
        md5(col("media")).as("content_md5")))
  }

  private def encodeWavWith(pcm: Array[Byte], text: String): Array[Byte] = {
    val bytes = if (text == null) Array.empty[Byte]
                else text.getBytes(StandardCharsets.UTF_8)
    var i = 0
    while (i < WavSamples) {
      val b = if (bytes.isEmpty) 0 else bytes(i % bytes.length) & 0xff
      val s = (b - 128) * 256 // signed 16-bit amplitude
      pcm(2 * i) = (s & 0xff).toByte // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, WavSamples.toLong)
    val out = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  private[operators] def encodeWav(text: String): Array[Byte] =
    encodeWavWith(new Array[Byte](WavSamples * 2), text)

  /** Sample count of the synthetic WAVs ([[withMediaWav]]). */
  val WavSamples: Int = 256

  /** REAL audio decode at the plug-point: `javax.sound.sampled` parses
    * the RIFF/WAVE container and format, and the PCM16 samples histogram
    * into `nBuckets` amplitude buckets (normalized). Same `mapPartitions`
    * shape as the image path — swap the body for a real featurizer
    * (spectrogram, wav2vec) and nothing else changes. Fails loudly on an
    * unparseable payload or a non-PCM16-mono format. */
  def decodeAudioFeatures(spark: SparkSession, df: DataFrame, idCol: String,
                          nBuckets: Int = 16): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (id, wav) => (id, decodeWav(wav, nBuckets)) }
      }
      .toDF(idCol, "features")
  }

  private def decodeWav(bytes: Array[Byte], nBuckets: Int): Array[Double] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
      !fmt.isBigEndian &&
      fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      s"decodeWav: expected PCM16 mono little-endian, got $fmt")
    val data = ais.readAllBytes()
    val n = data.length / 2
    val hist = new Array[Double](nBuckets)
    var i = 0
    while (i < n) {
      val s = ((data(2 * i) & 0xff) | (data(2 * i + 1).toInt << 8)) // sign-extends
      hist(((s + 32768) * nBuckets) / 65536) += 1.0
      i += 1
    }
    val total = math.max(1.0, n.toDouble)
    var j = 0
    while (j < nBuckets) { hist(j) /= total; j += 1 }
    hist
  }

  /** Deterministic synthetic AVI payloads: a REAL RIFF/AVI container
    * ([[AviFrames]] frames of [[PngSide]]×[[PngSide]] grayscale video)
    * written by our own muxer — `RIFF('AVI ' LIST(hdrl avih
    * LIST(strl strh strf)) LIST(movi 00dc…) idx1)`, the standard
    * single-stream layout. Frames are compressed with the REAL
    * `javax.imageio` PNG codec (fourcc `MPNG`, motion-PNG — the lossless
    * MJPEG variant): frame `f`'s pixel `i` is the text byte at
    * `(i + f) mod len`, so a downstream demux+decode recovers the exact
    * pixels and a SQL oracle can replay the whole round-trip from the
    * text alone — the video twin of [[withMediaPng]]. MJPEG-proper (JPEG
    * frames) would be the same container walk with a lossy codec, which
    * is exactly why the gate uses the lossless variant. */
  def withMediaAvi(spark: SparkSession, df: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { iter =>
        // per-partition codec state, amortized across rows (the
        // withMediaPng discipline)
        val img = new java.awt.image.BufferedImage(
          PngSide, PngSide, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("png").next()
        iter.map { case (id, text) => (id, encodeAviWith(img, writer, text)) }
      }
      .toDF(idCol, "media")
      .withColumn("media_meta", struct(
        octet_length(col("media")).as("n_bytes"),
        lit("video/avi").as("mime"),
        md5(col("media")).as("content_md5")))
  }

  /** Frame count of the synthetic AVIs ([[withMediaAvi]]). */
  val AviFrames: Int = 4

  /** MJPEG-proper synthetic AVIs: the SAME container layout and pixel
    * generator as [[withMediaAvi]], but each frame goes through the REAL
    * `javax.imageio` JPEG codec (fourcc `MJPG`, explicit quality 1.0 —
    * quantization tables collapse to ≈1, so the lossy round-trip stays
    * within ~±2 gray levels of the source). The text column is KEPT in
    * the output (idCol, textCol, media, media_meta): the fidelity decode
    * ([[decodeVideoFidelity]]) compares decoded pixels against the
    * generator contract without a join. This is the path a user decoding
    * actual MJPEG video hits — a genuine lossy codec inside a genuine
    * container, not the lossless stand-in. */
  def withMediaAviMjpeg(spark: SparkSession, df: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { iter =>
        // per-partition codec state (the withMediaPng discipline); the
        // JPEG write param carries the explicit quality setting
        val img = new java.awt.image.BufferedImage(
          PngSide, PngSide, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("jpeg").next()
        val param = writer.getDefaultWriteParam
        param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionQuality(1.0f)
        iter.map { case (id, text) =>
          (id, text, encodeAviWith(img, writer, text, "MJPG", param))
        }
      }
      .toDF(idCol, textCol, "media")
      .withColumn("media_meta", struct(
        octet_length(col("media")).as("n_bytes"),
        lit("video/avi").as("mime"),
        md5(col("media")).as("content_md5")))
  }

  /** Uncompressed-video synthetic AVIs: the SAME container layout and
    * pixel generator, but frames are raw bottom-up 24-bit BGR DIBs
    * (`strh` fccHandler `DIB `, `strf` biCompression = BI_RGB — the
    * classic uncompressed AVI every capture tool can write). No codec at
    * all: rows are stored bottom-up with the DIB 4-byte row-stride pad,
    * gray value v as the achromatic triple (v,v,v). Lossless, so the
    * downstream demux recovers exact pixels and the gate reuses the
    * motion-PNG oracle verbatim. The text column is KEPT in the output
    * (the [[decodeVideoFidelity]] position check reads it join-free,
    * like the MJPEG variant). */
  def withMediaAviRaw(spark: SparkSession, df: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { iter =>
        iter.map { case (id, text) =>
          val bytes = if (text == null) Array.empty[Byte]
                      else text.getBytes(StandardCharsets.UTF_8)
          val frames = (0 until AviFrames).map { f =>
            encodeDibFrame(bytes, PngSide, PngSide, f)
          }
          (id, text, muxAvi(frames, PngSide, PngSide, "DIB "))
        }
      }
      .toDF(idCol, textCol, "media")
      .withColumn("media_meta", struct(
        octet_length(col("media")).as("n_bytes"),
        lit("video/avi").as("mime"),
        md5(col("media")).as("content_md5")))
  }

  /** One bottom-up BGR24 DIB frame under the shared pixel contract
    * (row-major pixel `i` = text byte `(i+frame) mod len`); row stride
    * padded to 4 bytes per the DIB spec (a no-op at width 16 but the
    * formula is the general one). */
  private def encodeDibFrame(textBytes: Array[Byte], w: Int, h: Int,
                             pixelOffset: Int): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val out = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val srcRow = h - 1 - y // DIB rows are stored bottom-up
      var x = 0
      while (x < w) {
        val i = srcRow * w + x
        val v = if (textBytes.isEmpty) 0
                else textBytes((i + pixelOffset) % textBytes.length) & 0xff
        val o = y * stride + x * 3
        out(o) = v.toByte; out(o + 1) = v.toByte; out(o + 2) = v.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  private def encodeAviWith(img: java.awt.image.BufferedImage,
                            writer: javax.imageio.ImageWriter,
                            text: String,
                            fourcc: String = "MPNG",
                            param: javax.imageio.ImageWriteParam = null): Array[Byte] = {
    val frames = (0 until AviFrames).map { f =>
      encodePngWith(img, writer, text, pixelOffset = f, param = param)
    }
    muxAvi(frames, PngSide, PngSide, fourcc)
  }

  /** Minimal standards-shaped AVI muxer: one `vids` stream (frame codec
    * named by `fourcc` — `MPNG` motion-PNG or `MJPG` motion-JPEG), one
    * `00dc` chunk per frame (even-padded) + `idx1` index.
    * Little-endian sizes throughout, as RIFF requires. */
  private def muxAvi(frames: Seq[Array[Byte]], w: Int, h: Int,
                     fourcc: String = "MPNG"): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def fcc(s: String): Array[Byte] = s.getBytes(StandardCharsets.US_ASCII)
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = if (payload.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
      fcc(id) ++ le32(payload.length) ++ payload ++ pad
    }
    def list(subtype: String, payload: Array[Byte]): Array[Byte] =
      fcc("LIST") ++ le32(payload.length + 4) ++ fcc(subtype) ++ payload

    val maxFrame = frames.map(_.length).max
    // avih: MAIN AVI HEADER (56 bytes of fields)
    val avih = chunk("avih",
      le32(100000) ++ le32(maxFrame * 10) ++ le32(0) ++ le32(0x10 /*HASINDEX*/) ++
      le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(maxFrame) ++
      le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    // strh: stream header, fccType vids / fccHandler = frame codec, 10 fps
    val strh = chunk("strh",
      fcc("vids") ++ fcc(fourcc) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(1) ++ le32(10) ++ le32(0) ++ le32(frames.length) ++
      le32(maxFrame) ++ le32(-1) ++ le32(0) ++
      // rcFrame: four 16-bit shorts (0,0,w,h)
      Array((0 & 0xff).toByte, 0.toByte, (0 & 0xff).toByte, 0.toByte) ++
      Array((w & 0xff).toByte, ((w >> 8) & 0xff).toByte,
        (h & 0xff).toByte, ((h >> 8) & 0xff).toByte))
    // strf: BITMAPINFOHEADER — biCompression is the codec fourcc for
    // compressed streams, or BI_RGB (0) for the uncompressed DIB variant
    val biCompression =
      if (fourcc == "DIB ") le32(0) /*BI_RGB*/ else fcc(fourcc)
    val strf = chunk("strf",
      le32(40) ++ le32(w) ++ le32(h) ++
      Array[Byte](1, 0, 24, 0) /*biPlanes=1, biBitCount=24*/ ++
      biCompression ++ le32(w * h * 3) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))

    val moviChunks = frames.map(f => (chunk("00dc", f), f.length))
    val movi = list("movi", moviChunks.flatMap(_._1).toArray)
    // idx1: offsets are relative to the start of movi's payload data
    // (the 'movi' fourcc position + 4), per the AVI 1.0 convention
    var off = 4
    val idxEntries = moviChunks.map { case (c, payloadLen) =>
      val e = fcc("00dc") ++ le32(0x10 /*AVIIF_KEYFRAME*/) ++
        le32(off) ++ le32(payloadLen)
      off += c.length
      e
    }
    val idx1 = chunk("idx1", idxEntries.flatMap(e => e).toArray)

    val body = fcc("AVI ") ++ hdrl ++ movi ++ idx1
    out.write(fcc("RIFF")); out.write(le32(body.length)); out.write(body)
    out.toByteArray
  }

  /** REAL video decode at the plug-point: walk the RIFF/AVI container
    * (validate signatures, parse `avih` for the declared geometry and
    * frame count, iterate the `movi` list's `00dc` chunks), decode every
    * frame with `javax.imageio`, and emit the container metadata plus the
    * normalized grayscale histogram pooled across frames — the
    * demux-then-per-frame-decode shape a real MJPEG pipeline has, with
    * zero external deps. Same `mapPartitions` plug-point as the image and
    * audio paths; fails loudly on a malformed container, a frame-count
    * mismatch, or an undecodable frame. Emits (idCol, `n_frames`,
    * `width`, `height`, `features`). */
  def decodeVideoFeatures(spark: SparkSession, df: DataFrame, idCol: String,
                          nBuckets: Int = 16): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        val readerFor = codecReaders()
        iter.map { case (id, avi) =>
          val hist = new Array[Double](nBuckets)
          var totalPx = 0L
          val (nf, w, h) = demuxAvi(readerFor, avi) { img =>
            val raster = img.getRaster
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                hist((raster.getSample(x, y, 0) & 0xff) * nBuckets / 256) += 1.0
                x += 1
              }
              y += 1
            }
            totalPx += img.getWidth.toLong * img.getHeight
          }
          val total = math.max(1.0, totalPx.toDouble)
          var j = 0
          while (j < nBuckets) { hist(j) /= total; j += 1 }
          (id, nf, w, h, hist)
        }
      }
      .toDF(idCol, "n_frames", "width", "height", "features")
  }

  /** Per-partition frame-codec reader cache: the stream header's
    * fccHandler picks the `javax.imageio` reader — `MPNG` (motion-PNG,
    * the lossless variant) or `MJPG` (motion-JPEG, the real lossy MJPEG
    * codec). Unsupported fourccs fail loudly: a container silently
    * skipped would poison downstream curation exactly like a corrupt
    * image scored as all-zeros. */
  private def codecReaders(): String => javax.imageio.ImageReader = {
    val readers =
      scala.collection.mutable.Map.empty[String, javax.imageio.ImageReader]
    fourcc => {
      val fmt = fourcc match {
        case "MPNG" => "png"
        case "MJPG" => "jpeg"
        case other => throw new IllegalArgumentException(
          s"decodeVideo: unsupported frame codec fourcc '$other'")
      }
      readers.getOrElseUpdate(fmt,
        javax.imageio.ImageIO.getImageReadersByFormatName(fmt).next())
    }
  }

  /** MJPEG fidelity decode: demux + REAL per-frame JPEG (or PNG) decode,
    * then compare every decoded pixel against the generator contract
    * (frame `f` pixel `i` = text byte at `(i+f) mod len`) and report the
    * mean absolute pixel error DISCRETIZED to `floor(mae / tol)` bands.
    * JPEG is lossy, so exact pixel values are not SQL-replayable the way
    * the motion-PNG gate's are — but the error BAND is deterministic with
    * wide margin: quality-1.0 grayscale JPEG round-trips 8×8 blocks
    * within ~±2 of the source (quant tables ≈ 1), an order of magnitude
    * inside the default tol=8, while a wrong/broken decode (byte
    * histogram, shifted frames, garbage pixels) lands dozens of bands
    * away. Emits (idCol, n_frames, width, height, mae_band) — the
    * DuckDB twin replays the expected bands (0) plus the exact container
    * geometry from the text alone. */
  def decodeVideoFidelity(spark: SparkSession, df: DataFrame, idCol: String,
                          textCol: String, tol: Double = 8.0): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol), col("media"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { iter =>
        val readerFor = codecReaders()
        iter.map { case (id, text, avi) =>
          val expected = if (text == null) Array.empty[Byte]
                         else text.getBytes(StandardCharsets.UTF_8)
          var sumErr = 0.0
          var px = 0L
          var fidx = 0
          val (nf, w, h) = demuxAvi(readerFor, avi) { img =>
            val raster = img.getRaster
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val i = y * img.getWidth + x
                val exp = if (expected.isEmpty) 0
                          else expected((i + fidx) % expected.length) & 0xff
                sumErr += math.abs((raster.getSample(x, y, 0) & 0xff) - exp)
                px += 1
                x += 1
              }
              y += 1
            }
            fidx += 1
          }
          val mae = sumErr / math.max(1L, px).toDouble
          (id, nf, w, h, (mae / tol).toInt)
        }
      }
      .toDF(idCol, "n_frames", "width", "height", "mae_band")
  }

  /** Container walk shared by the feature and fidelity decoders: validate
    * the RIFF/AVI signatures, parse `avih` (declared geometry + frame
    * count) and `strh` (the frame codec fourcc), decode every `movi`
    * `00dc` chunk with the fccHandler-selected reader, and hand each
    * decoded frame to `onFrame` in stream order. Returns
    * (frames, width, height); fails loudly on a malformed container, a
    * frame before the stream header, a frame-count mismatch, or an
    * undecodable frame. */
  private def demuxAvi(readerFor: String => javax.imageio.ImageReader,
                       bytes: Array[Byte])
                      (onFrame: java.awt.image.BufferedImage => Unit): (Int, Int, Int) = {
    def rd32(o: Int): Int =
      (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
      ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    def fccAt(o: Int): String =
      new String(bytes, o, 4, StandardCharsets.US_ASCII)
    require(bytes.length >= 12 && fccAt(0) == "RIFF" && fccAt(8) == "AVI ",
      "decodeVideo: payload is not a RIFF/AVI container")

    var declaredFrames = -1; var width = -1; var height = -1
    var handler: String = null
    var decoded = 0

    def decodeFrame(off: Int, len: Int): Unit = {
      require(handler != null,
        "decodeVideo: movi frame before the strh stream header")
      val img =
        if (handler == "DIB ") decodeDibFrame(bytes, off, len, width, height)
        else {
          val reader = readerFor(handler)
          // in-memory stream — see readImageWith: the ImageIO factory's
          // default file cache costs a temp file per frame
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new ByteArrayInputStream(bytes, off, len))
          try { reader.setInput(iis, true, true); reader.read(0) }
          finally iis.close()
        }
      require(img != null, "decodeVideo: undecodable frame")
      onFrame(img)
      decoded += 1
    }

    // top-level chunk walk; LIST payloads walked one level down
    def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
      var o = from
      while (o + 8 <= to) {
        val id = fccAt(o); val sz = rd32(o + 4)
        require(sz >= 0 && o + 8 + sz <= to,
          s"decodeVideo: chunk $id overruns the container")
        if (id == "LIST") {
          val sub = fccAt(o + 8)
          walk(o + 12, o + 8 + sz, inMovi = sub == "movi")
        } else if (id == "avih") {
          declaredFrames = rd32(o + 8 + 16)
          width = rd32(o + 8 + 32); height = rd32(o + 8 + 36)
        } else if (id == "strh") {
          // fccType(4) then fccHandler(4): the frame codec fourcc
          handler = fccAt(o + 8 + 4)
        } else if (inMovi && id == "00dc") {
          decodeFrame(o + 8, sz)
        }
        o += 8 + sz + (sz % 2) // chunks are even-aligned
      }
    }
    walk(12, 12 + rd32(4) - 4, inMovi = false)

    require(declaredFrames >= 0, "decodeVideo: missing avih header")
    require(decoded == declaredFrames,
      s"decodeVideo: avih declares $declaredFrames frames, movi has $decoded")
    (decoded, width, height)
  }

  /** Uncompressed bottom-up BGR24 DIB frame → grayscale image: rows are
    * stored bottom-up with a 4-byte stride pad (the DIB spec), gray via
    * exact integer BT.601 luma (299r+587g+114b+500)/1000 — identity for
    * the achromatic triples [[withMediaAviRaw]] writes, so the lossless
    * round-trip stays bit-replayable by the SQL oracle. Geometry comes
    * from the already-parsed `avih`; a frame whose byte length does not
    * match stride×height fails loudly. */
  private def decodeDibFrame(bytes: Array[Byte], off: Int, len: Int,
                             w: Int, h: Int): java.awt.image.BufferedImage = {
    require(w > 0 && h > 0, "decodeVideo: DIB frame before avih geometry")
    val stride = ((w * 3 + 3) / 4) * 4
    require(len == stride * h,
      s"decodeVideo: DIB frame is $len bytes, geometry needs ${stride * h}")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var row = 0
    while (row < h) {
      val y = h - 1 - row // bottom-up storage
      var x = 0
      while (x < w) {
        val o = off + row * stride + x * 3
        val b = bytes(o) & 0xff
        val g = bytes(o + 1) & 0xff
        val r = bytes(o + 2) & 0xff
        raster.setSample(x, y, 0, (299 * r + 587 * g + 114 * b + 500) / 1000)
        x += 1
      }
      row += 1
    }
    img
  }

  /** STUB — stands in for the real media decoder (`???` in a deployment
    * without codecs). Deterministic byte-histogram features, normalized. */
  private[operators] def fakeDecode(bytes: Array[Byte], nBuckets: Int): Array[Double] = {
    val hist = new Array[Double](nBuckets)
    var i = 0
    while (i < bytes.length) {
      hist(((bytes(i) & 0xff) * nBuckets) / 256) += 1.0
      i += 1
    }
    val total = math.max(1.0, bytes.length.toDouble)
    var j = 0
    while (j < nBuckets) { hist(j) /= total; j += 1 }
    hist
  }
}
