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
    * byte-statistics sketch (mean/min/max/length per stripe). Replace
    * with a real decoder in production; the pipeline shape is identical.
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
          out(i) = if (until > from) s.toFloat / (until - from) else 0f
          i += 1
        }
      }
      out
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
}
