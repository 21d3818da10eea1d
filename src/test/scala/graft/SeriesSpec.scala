package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Series

/** W1–W9 window semantics + the P1 ICT composite over crafted series
  * (reference: /root/reference/static/main.js:217-383).
  */
class SeriesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(i: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00")

  private def series(vals: Double*) =
    vals.zipWithIndex.map { case (v, i) => (i.toLong, "K", ts(i), v) }
      .toDF("id", "k", "t", "v")

  private val w = Series.ordered("k", col("t"), col("id"))

  test("sma: null warm-up until n-1 rows, then rolling mean (W1)") {
    val got = series(1, 2, 3, 4, 5)
      .select($"id", Series.sma($"v", 3, w).as("s"))
      .orderBy("id").as[(Long, Option[Double])].collect().map(_._2)
    assert(got.toSeq === Seq(None, None, Some(2.0), Some(3.0), Some(4.0)))
  }

  test("cumSum: running total in order (W2 equity curve)") {
    val got = series(1, -2, 3)
      .select($"id", Series.cumSum($"v", w).as("c"))
      .orderBy("id").as[(Long, Double)].collect().map(_._2)
    assert(got.toSeq === Seq(1.0, -1.0, 2.0))
  }

  test("rollingMin over trailing n (W4)") {
    val got = series(5, 3, 4, 1, 2)
      .select($"id", Series.rollingMin($"v", 3, w).as("m"))
      .orderBy("id").as[(Long, Double)].collect().map(_._2)
    assert(got.toSeq === Seq(5.0, 3.0, 3.0, 1.0, 1.0))
  }

  test("rollingStd: sample stddev with warm-up (W3)") {
    val got = series(2, 4, 4, 4, 5, 5, 7, 9)
      .select($"id", Series.rollingStd($"v", 8, w).as("s"))
      .orderBy("id").as[(Long, Option[Double])].collect().map(_._2)
    assert(got.init.forall(_.isEmpty))
    assert(math.abs(got.last.get - 2.13809) < 1e-4) // known sample stddev
  }

  test("local extrema: plateau counts as both-sided >= (W6)") {
    val df = series(1, 3, 2, 2, 5)
    val got = df.select($"id",
        Series.isLocalHigh($"v", w).as("h"), Series.isLocalLow($"v", w).as("l"))
      .orderBy("id").as[(Long, Boolean, Boolean)].collect()
    // edges (no neighbor) are never extrema
    assert(got(0)._2 === false && got(4)._2 === false)
    assert(got(1)._2 === true)            // 3 >= 1 && 3 >= 2
    assert(got(2)._3 === true)            // 2 <= 3 && 2 <= 2 (plateau)
    assert(got(3)._3 === true)            // 2 <= 2 && 2 <= 5
  }

  test("slope and lagDelta (W7, W8)") {
    val df = series(10, 12, 11, 15)
    assert(df.select(Series.lagDelta($"v", w)).as[Option[Double]]
      .collect().toSeq === Seq(None, Some(2.0), Some(-1.0), Some(4.0)))
    assert(df.select(Series.slope($"v", 2, w)).as[Option[Double]]
      .collect().toSeq === Seq(None, None, Some(1.0), Some(3.0)))
  }

  test("highestWithPos: arg-max value and its row position (W5)") {
    val df = series(1, 9, 3)
    val (hv, hp) = Series.highestWithPos($"v", $"id" + 1, 3, w)
    val got = df.select($"id", hv.as("hv"), hp.as("hp")).orderBy("id")
      .as[(Long, Double, Long)].collect()
    assert(got(2) === ((2L, 9.0, 2L))) // max 9.0 at position 2 (1-based)
  }

  test("topKRecent keeps k newest per key (W9)") {
    val df = series(1, 2, 3, 4, 5)
    val got = Series.topKRecent(df, "k", $"t", $"id", 2)
      .select("v").as[Double].collect().toSet
    assert(got === Set(4.0, 5.0))
  }

  test("analyzeICT: hi/lo/mid/premium/bias on a monotone rising series") {
    // 25 rising points: last == hi, so premium; both MA slopes positive
    val df = series((1 to 25).map(_ * 1.0): _*)
    val r = Series.analyzeICT(df, "k", $"t", $"id", $"v").collect()(0)
    assert(r.getAs[Double]("hi") === 25.0 && r.getAs[Double]("lo") === 1.0)
    assert(r.getAs[Double]("mid") === 13.0)
    assert(r.getAs[Double]("last") === 25.0)
    assert(r.getAs[Boolean]("premium"))
    assert(r.getAs[String]("bias") === "bullish")
    assert(math.abs(r.getAs[Double]("ote_62") - (1.0 + 24 * 0.62)) < 1e-9)
    // falling series mirrors
    val f = Series.analyzeICT(series((1 to 25).map(26.0 - _): _*),
      "k", $"t", $"id", $"v").collect()(0)
    assert(f.getAs[String]("bias") === "bearish")
    assert(!f.getAs[Boolean]("premium"))
  }

  test("maxDrawdown: worst peak-to-trough fraction; rising series is 0") {
    val rows = Seq(
      // A: 10 → 20 (peak) → 5 (dd 0.75) → 15 (recovery, dd 0.25)
      ("A", ts(0), 1L, 10.0),
      ("A", ts(1), 2L, 20.0),
      ("A", ts(2), 3L, 5.0),
      ("A", ts(3), 4L, 15.0),
      // B: monotone rise — never below the running peak
      ("B", ts(0), 5L, 1.0),
      ("B", ts(1), 6L, 2.0))
      .toDF("k", "t", "id", "v")
    val got = Series.maxDrawdown(rows, "k", $"t", $"id", $"v")
      .orderBy("k").collect()
    assert(got(0).getAs[Double]("max_drawdown") === 0.75)
    assert(got(0).getAs[Double]("peak") === 20.0)
    assert(got(1).getAs[Double]("max_drawdown") === 0.0)
    assert(got(1).getAs[Double]("peak") === 2.0)
  }

  test("olsTrend: recovers slope and intercept of an exact line") {
    // value = 2 + 0.24·minute, sampled on exact minute ticks so the
    // minute/cents quantization is lossless → slope_per_day must be
    // 0.24·1440 = 345.6 and intercept 2.0 (up to double rounding)
    val rows = (0 until 10).map { k =>
      ("A", java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 0, k, 0)
          .format(java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd HH:mm:ss"))),
        2.0 + 0.24 * k)
    }
    val df = rows.toDF("k", "t", "v")
    val got = Series.olsTrend(df, "k", $"t", $"v",
      anchor = "2024-01-01").collect()(0)
    assert(got.getAs[Long]("n") === 10L)
    assert(math.abs(got.getAs[Double]("slope_per_day") - 345.6) < 1e-9)
    assert(math.abs(got.getAs[Double]("intercept") - 2.0) < 1e-9)
  }

  test("olsTrend: flat series has zero slope, mean intercept") {
    val rows = (0 until 5).map { k =>
      ("F", java.sql.Timestamp.valueOf(f"2024-01-01 00:$k%02d:00"), 7.5)
    }
    val got = Series.olsTrend(rows.toDF("k", "t", "v"), "k", $"t",
      $"v", anchor = "2024-01-01").collect()(0)
    assert(math.abs(got.getAs[Double]("slope_per_day")) < 1e-12)
    assert(math.abs(got.getAs[Double]("intercept") - 7.5) < 1e-12)
  }
}
