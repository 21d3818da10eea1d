package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipelines.Multimodal

/** Real-image decode path: javax.imageio PNG decode inside the
  * partition-local feature extractor, plus graceful fallback for corrupt
  * payloads and non-image kinds.
  */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("ImageDecoder recovers size and exact channel means from PNGs") {
    val media = Multimodal.syntheticImages(spark, 24)
    val got = Multimodal.extractFeatures(media,
        new Multimodal.ImageDecoder())
      .select($"media_id", $"features")
      .as[(Long, Seq[Float])].collect().toMap
    for (i <- 0 until 24) {
      val f = got(i.toLong)
      assert(f(0) === (8 + i % 8).toFloat, s"width of $i")
      assert(f(1) === (8 + i % 5).toFloat, s"height of $i")
      assert(f(2) === (i % 256).toFloat, s"meanR of $i")
      assert(f(3) === (i * 7 % 256).toFloat, s"meanG of $i")
      assert(f(4) === (i * 13 % 256).toFloat, s"meanB of $i")
      assert(f(7) === 1f, s"decoded flag of $i")
    }
  }

  test("AudioDecoder recovers rate/frames/amplitude from WAVs exactly") {
    val media = Multimodal.syntheticWavs(spark, 15)
    val got = Multimodal.extractFeatures(media,
        new Multimodal.AudioDecoder())
      .select($"media_id", $"features")
      .as[(Long, Seq[Float])].collect().toMap
    for (i <- 0 until 15) {
      val f = got(i.toLong)
      assert(f(0) === 16000f, s"rate of $i")
      assert(f(1) === (8000 + (i % 5) * 1600).toFloat, s"frames of $i")
      assert(f(2) === (1000 + i * 37 % 20000).toFloat, s"rms of $i")
      assert(f(3) === (1000 + i * 37 % 20000).toFloat, s"meanAbs of $i")
      assert(f(7) === 1f, s"decoded flag of $i")
    }
  }

  test("VideoDecoder samples frames and recovers exact channel sums") {
    val media = Multimodal.syntheticGifs(spark, 12)
    val got = Multimodal.extractFeatures(media,
        new Multimodal.VideoDecoder(frameStride = 2))
      .select($"media_id", $"features")
      .as[(Long, Seq[Float])].collect().toMap
    for (i <- 0 until 12) {
      val f = got(i.toLong)
      val nf = 2 + i % 5
      val sampled = (0 until nf by 2)
      assert(f(0) === nf.toFloat, s"frames of $i")
      assert(f(1) === 16f && f(2) === 16f)
      assert(f(3) === sampled.map(fr => (i * 31 + fr * 7) % 256).sum.toFloat,
        s"sum_r of $i")
      assert(f(6) === sampled.size.toFloat, s"sampled of $i")
      assert(f(7) === 1f)
    }
  }

  test("corrupt payloads and non-image kinds degrade to the byte sketch") {
    val rows = Seq(
      (0L, "image", Array[Byte](1, 2, 3, 4), null, null, null),  // not a PNG
      (1L, "audio", Array.fill[Byte](32)(7), null, null, null))
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2, r._3, r._4, r._5, r._6)), 1),
      Multimodal.mediaSchema)
    val got = Multimodal.extractFeatures(media,
        new Multimodal.ImageDecoder())
      .select($"media_id", $"features")
      .as[(Long, Seq[Float])].collect().toMap
    assert(got(0L).last === 0f) // flagged undecoded, row not dropped
    assert(got(1L).last === 0f)
    assert(got(1L).head === 28f) // stub byte-sum sketch (4-byte stripe of 7s)
  }

  test("null payloads pass through with null features") {
    val media = Multimodal.syntheticMedia(spark, 14)
    val feats = Multimodal.extractFeatures(media,
      new Multimodal.ImageDecoder())
    val nullRows = feats.filter($"payload".isNull)
    assert(nullRows.count() === 2) // ids 0 and 7
    assert(nullRows.filter($"features".isNotNull).count() === 0)
  }
}
