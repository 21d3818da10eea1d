package graft.pipelines

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata, and decode / feature
  * extraction runs as a partition-local transform (`mapPartitions`) so
  * heavyweight decoder state is initialized once per partition, not per
  * row — the Scala analog of a batched `mapInPandas` UDF.
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): [[StubDecoder]] emits deterministic fake features derived
  * from the payload bytes. The Spark-side contract — schema, batch shape,
  * partition-local init, null passthrough — is real and tested; swap
  * [[Decoder]] for a JNI/FFM-backed implementation in production.
  */
object Multimodal {

  /** Media row schema: binary payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Decoder contract: bytes → fixed-width feature vector. Implementations
    * must be serializable and cheap to construct per partition.
    */
  trait Decoder extends Serializable {
    def featureDim: Int
    def decode(kind: String, payload: Array[Byte]): Array[Float]
  }

  /** Deterministic stand-in for the real codec: features are a simple
    * byte-statistics sketch (unsigned-byte SUM per stripe — sums, not
    * means: integer sums are exact in float32 for small payloads, so the
    * stub path gets a bit-stable SQL oracle like the real decoders).
    * Replace with a real decoder in production; the pipeline shape is
    * identical.
    */
  final class StubDecoder(val featureDim: Int = 8) extends Decoder {
    def decode(kind: String, payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](featureDim)
      if (payload != null && payload.nonEmpty) {
        val stripe = math.max(1, payload.length / featureDim)
        var i = 0
        while (i < featureDim) {
          val from = i * stripe
          val until = math.min(payload.length, from + stripe)
          var s = 0L
          var j = from
          while (j < until) { s += (payload(j) & 0xff); j += 1 }
          out(i) = s.toFloat
          i += 1
        }
      }
      out
    }
  }

  /** Real image decoder backed by the JDK's built-in `javax.imageio`
    * (PNG/BMP/GIF/JPEG readers ship with the JVM — no external deps).
    * Features: [width, height, meanR, meanG, meanB, meanLuma, aspect, 1]
    * for decodable images; non-image kinds and undecodable payloads fall
    * back to `fallback`'s byte sketch with the decoded-flag 0, so a
    * corrupt blob degrades instead of failing the partition. The decode
    * runs partition-locally inside [[extractFeatures]] — the reference
    * ships the same bytes as data-URL images to its vision call
    * (/root/reference/app/main.py:694-713); here they become columns.
    */
  final class ImageDecoder(fallback: Decoder = new StubDecoder(8))
      extends Decoder {
    val featureDim: Int = 8

    private def flagged(f: Array[Float]): Array[Float] =
      f.take(featureDim - 1).padTo(featureDim - 1, 0f) :+ 0f

    def decode(kind: String, payload: Array[Byte]): Array[Float] = {
      if (kind != "image") return flagged(fallback.decode(kind, payload))
      val img =
        try {
          javax.imageio.ImageIO.setUseCache(false) // no temp-file cache
          javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload))
        } catch { case _: Throwable => null }
      if (img == null) return flagged(fallback.decode(kind, payload))
      val w = img.getWidth
      val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toFloat
      Array(w.toFloat, h.toFloat, sr / n, sg / n, sb / n,
        (sr + sg + sb) / (3f * n), w.toFloat / h, 1f)
    }
  }

  /** Real audio decoder for WAV/PCM via the JDK's built-in
    * `javax.sound.sampled` — no external deps. Features: [sampleRate,
    * nFrames, rms, meanAbs, durationMs, channels, 0, 1] for decodable
    * audio; other kinds and undecodable payloads fall back with the
    * decoded-flag 0. RMS/meanAbs are computed in exact integer space
    * (sums of int16 squares stay far below 2^53) so fixture values are
    * bit-reproducible.
    */
  final class AudioDecoder(fallback: Decoder = new StubDecoder(8))
      extends Decoder {
    val featureDim: Int = 8

    private def flagged(f: Array[Float]): Array[Float] =
      f.take(featureDim - 1).padTo(featureDim - 1, 0f) :+ 0f

    def decode(kind: String, payload: Array[Byte]): Array[Float] = {
      if (kind != "audio") return flagged(fallback.decode(kind, payload))
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian)
          return flagged(fallback.decode(kind, payload))
        val bytes = in.readAllBytes()
        val n = bytes.length / 2
        var sumSq = 0L
        var sumAbs = 0L
        var i = 0
        while (i < n) {
          val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort
          sumSq += s.toLong * s
          sumAbs += math.abs(s.toLong)
          i += 1
        }
        val frames = n / fmt.getChannels
        Array(fmt.getSampleRate, frames.toFloat,
          math.sqrt(sumSq.toDouble / n).toFloat,
          (sumAbs.toDouble / n).toFloat,
          (frames * 1000.0 / fmt.getSampleRate).toFloat,
          fmt.getChannels.toFloat, 0f, 1f)
      } catch {
        case _: Throwable => flagged(fallback.decode(kind, payload))
      }
    }
  }

  /** Real video decoder over animated-GIF containers via the JDK's
    * multi-frame ImageIO reader — frame COUNT, frame SAMPLING (every
    * `frameStride`-th frame), and per-channel pixel sums over the
    * sampled frames. Sums, not means: integer sums are exact in float,
    * so fixture features recompute bit-for-bit from the seed. Real
    * codecs (H.264 etc.) need native libs this container lacks; the
    * container/frame-iteration shape — seek, sample, reduce — is
    * identical.
    */
  final class VideoDecoder(frameStride: Int = 2,
                           fallback: Decoder = new StubDecoder(8))
      extends Decoder {
    val featureDim: Int = 8

    private def flagged(f: Array[Float]): Array[Float] =
      f.take(featureDim - 1).padTo(featureDim - 1, 0f) :+ 0f

    def decode(kind: String, payload: Array[Byte]): Array[Float] = {
      if (kind != "video") return flagged(fallback.decode(kind, payload))
      var iis: javax.imageio.stream.ImageInputStream = null
      try {
        javax.imageio.ImageIO.setUseCache(false)
        iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext)
          return flagged(fallback.decode(kind, payload))
        val reader = readers.next()
        reader.setInput(iis)
        val nFrames = reader.getNumImages(true)
        var f = 0
        var sr = 0L; var sg = 0L; var sb = 0L
        var w = 0; var h = 0
        var sampled = 0
        while (f < nFrames) {
          val img = reader.read(f)
          w = img.getWidth; h = img.getHeight
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          sampled += 1
          f += frameStride
        }
        reader.dispose()
        val px = (w.toLong * h).toFloat
        Array(nFrames.toFloat, w.toFloat, h.toFloat,
          sr / px, sg / px, sb / px, sampled.toFloat, 1f)
      } catch {
        case _: Throwable => flagged(fallback.decode(kind, payload))
      } finally if (iis != null) iis.close()
    }
  }

  /** Attach a `features array<float>` column by running the decoder
    * partition-locally. Rows with null payloads pass through with null
    * features (never dropped — curation decides downstream).
    */
  def extractFeatures(media: DataFrame,
                      decoder: Decoder = new StubDecoder()): DataFrame = {
    val outSchema = media.schema
      .add(StructField("features", ArrayType(FloatType), nullable = true))
    val enc = RowEncoder.encoderFor(outSchema)
    val kindIdx = media.schema.fieldIndex("kind")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      // decoder state initialized once per partition (the expensive part
      // for real codecs); rows stream through without buffering
      rows.map { r =>
        val payload = r.get(payloadIdx).asInstanceOf[Array[Byte]]
        val feats =
          if (payload == null) null
          else decoder.decode(r.getString(kindIdx), payload)
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(enc)
  }

  /** Deterministic synthetic media table for tests: payload bytes derived
    * from the id (no external fixtures needed).
    */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val payload =
        if (i % 7 == 0) null
        else Array.tabulate[Byte](64 + i % 64)(j => ((i * 31 + j) % 251).toByte)
      Row(i.toLong, kind, payload,
        if (kind == "image") Integer.valueOf(640) else null,
        if (kind == "image") Integer.valueOf(480) else null,
        if (kind != "image") java.lang.Long.valueOf(1000L + i) else null)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), mediaSchema)
  }

  /** Deterministic synthetic WAV table: clip i is a 16 kHz mono square
    * wave of amplitude 1000 + 37i mod 20000 over 8000 + 1600·(i mod 5)
    * frames — |sample| is constant, so decoded RMS and mean-abs equal
    * the amplitude EXACTLY (integer-space sums, perfect-square sqrt) and
    * a SQL oracle recomputes every feature from the id. Headers are
    * written by hand (44-byte canonical RIFF/PCM), encoded in the
    * executors.
    */
  def syntheticWavs(spark: SparkSession, n: Int): DataFrame = {
    val rows = spark.sparkContext.parallelize(0 until n, 4).map { i =>
      val amp = 1000 + (i * 37) % 20000
      val frames = 8000 + (i % 5) * 1600
      val rate = 16000
      val dataLen = frames * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1.toShort).putShort(1.toShort) // PCM, mono
        .putInt(rate).putInt(rate * 2)
        .putShort(2.toShort).putShort(16.toShort)
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      var f = 0
      while (f < frames) {
        bb.putShort((if (f % 2 == 0) amp else -amp).toShort)
        f += 1
      }
      Row(i.toLong, "audio", bb.array(), null, null,
        java.lang.Long.valueOf(frames * 1000L / rate))
    }
    spark.createDataFrame(rows, mediaSchema)
  }

  /** Deterministic synthetic animated-GIF table: clip i has 2 + i%5
    * solid-color 16×16 frames (frame f's channels are id/frame
    * arithmetic mod 256 — GIF stores ≤256 exact palette colors, so
    * decode is lossless and a SQL oracle recomputes the sampled-frame
    * channel sums from the id). Encoded in the executors.
    */
  def syntheticGifs(spark: SparkSession, n: Int): DataFrame = {
    val rows = spark.sparkContext.parallelize(0 until n, 4).map { i =>
      val nFrames = 2 + i % 5
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.setUseCache(false)
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val writer =
        javax.imageio.ImageIO.getImageWritersBySuffix("gif").next()
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(16, 16,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = (((i * 31 + f * 7) % 256) << 16) |
          (((i * 13 + f * 11) % 256) << 8) | ((i * 17 + f * 3) % 256)
        var y = 0
        while (y < 16) {
          var x = 0
          while (x < 16) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
      ios.close()
      writer.dispose()
      Row(i.toLong, "video", bos.toByteArray, Integer.valueOf(16),
        Integer.valueOf(16), java.lang.Long.valueOf(nFrames * 100L))
    }
    spark.createDataFrame(rows, mediaSchema)
  }

  /** Deterministic synthetic PNG table: image i is a solid
    * (i%256, 7i%256, 13i%256) color at (8+i%8)×(8+i%5) — PNG is
    * lossless, so the decoded channel means equal the seed color exactly
    * and a SQL oracle can recompute them from the id. Payloads are
    * ENCODED inside the executors (mapPartitions over a range), so the
    * fixture generator itself scales like any other pipeline.
    */
  def syntheticImages(spark: SparkSession, n: Int): DataFrame = {
    val rows = spark.sparkContext.parallelize(0 until n, 4).map { i =>
      val w = 8 + i % 8
      val h = 8 + i % 5
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = ((i % 256) << 16) | (((i * 7) % 256) << 8) | ((i * 13) % 256)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.setUseCache(false)
      javax.imageio.ImageIO.write(img, "png", bos)
      Row(i.toLong, "image", bos.toByteArray, Integer.valueOf(w),
        Integer.valueOf(h), null)
    }
    spark.createDataFrame(rows, mediaSchema)
  }
}
