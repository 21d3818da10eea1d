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

  // ---- chart indicators (w14-w20) ----

  test("ohlcBars: OHLC per (key, hour) from the (ts, id) order") {
    val df = Seq(
      (0L, "K", ts(0), 5.0), (1L, "K", ts(1), 3.0), (2L, "K", ts(2), 8.0),
      (3L, "K", ts(61), 2.0), (4L, "K", ts(62), 7.0))
      .toDF("id", "k", "t", "v")
    val got = Series.ohlcBars(df, "k", col("t"), col("id"), col("v"),
        "1 hour")
      .orderBy("bar").select("open", "high", "low", "close", "n")
      .as[(Double, Double, Double, Double, Long)].collect()
    assert(got(0) === ((5.0, 8.0, 3.0, 8.0, 3L)))
    assert(got(1) === ((2.0, 7.0, 2.0, 7.0, 2L)))
  }

  test("bollinger: flat series pins bands to the mean, %B undefined") {
    val got = Series.bollinger(series(4, 4, 4, 4), $"v", 3, 2.0, w)
      .orderBy("id").select("mid", "band_up", "band_dn", "pct_b")
      .as[(Option[Double], Option[Double], Option[Double],
           Option[Double])].collect()
    assert(got(0)._1.isEmpty) // warm-up
    assert(got(3)._1.contains(4.0) && got(3)._2.contains(4.0) &&
      got(3)._3.contains(4.0))
    assert(got.forall(_._4.isEmpty)) // zero-width band → %B null
    // varying tail: bands straddle the mean, %B inside (0, 1)
    val g2 = Series.bollinger(series(1, 2, 3), $"v", 3, 2.0, w)
      .orderBy("id").select("band_up", "band_dn", "pct_b")
      .as[(Option[Double], Option[Double], Option[Double])]
      .collect().last
    assert(g2._1.get > 2.0 && g2._2.get < 2.0)
    assert(g2._3.contains(0.75)) // (3 − 0) / (4 − 0)
  }

  test("rsiCutler: all-gain window reads 100, all-loss 0, warm-up null") {
    val up = Series.rsiCutler(series(1, 2, 3, 4, 5), $"v", 3, w)
      .orderBy("id").select("rsi")
      .as[Option[Double]].collect()
    assert(up.take(3).forall(_.isEmpty)) // 3 deltas first exist at row 3
    assert(up.drop(3).forall(_.contains(100.0)))
    val dn = Series.rsiCutler(series(5, 4, 3, 2, 1), $"v", 3, w)
      .orderBy("id").select("rsi")
      .as[Option[Double]].collect()
    assert(dn.drop(3).forall(_.contains(0.0)))
  }

  test("stochasticK: range top is 100, bottom 0, flat range null") {
    val got = Series.stochasticK(series(1, 2, 3, 1, 3), $"v", 3, w)
      .orderBy("id").select("k_pct")
      .as[Option[Double]].collect()
    assert(got(0).isEmpty && got(1).isEmpty)
    assert(got(2).contains(100.0))
    assert(got(3).contains(0.0))
    val flat = Series.stochasticK(series(2, 2, 2), $"v", 3, w)
      .orderBy("id").select("k_pct")
      .as[Option[Double]].collect()
    assert(flat.forall(_.isEmpty))
  }

  test("emaTrunc: constant converges to the constant; hand-check span 3") {
    val got = series(Seq.fill(10)(7.0): _*)
      .select($"id", Series.emaTrunc($"v", 2, w).as("e")) // K = 4
      .orderBy("id").as[(Long, Option[Double])].collect().map(_._2)
    assert(got.take(3).forall(_.isEmpty))
    assert(got.drop(3).forall(_.contains(7.0)))
    // span 3 (α = 0.5, K = 6) over 1..10 at the last row: lags are
    // 10,9,8,7,6,5 with weights 1,.5,.25,.125,.0625,.03125
    val hand = series(1, 2, 3, 4, 5, 6, 7, 8, 9, 10)
      .select($"id", Series.emaTrunc($"v", 3, w).as("e"))
      .orderBy("id").as[(Long, Option[Double])].collect().last._2.get
    val num = Seq(10.0, 9, 8, 7, 6, 5)
      .zip(Seq(1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125))
      .map { case (v, wt) => v * wt }.sum
    assert(math.abs(hand - num / 1.96875) < 1e-6)
  }

  test("macd: flat series reads zero once the slow EMA warms") {
    val got = Series.macd(series(Seq.fill(20)(5.0): _*), $"v", 3, 6, w)
      .orderBy("id").select("macd") // K = 6 and 12
      .as[Option[Double]].collect()
    assert(got.take(11).forall(_.isEmpty))
    assert(got.drop(11).forall(_.contains(0.0)))
  }

  test("resampleFfill: hourly grid forward-fills; grid-aligned obs wins") {
    val df = Seq(
      (0L, "K", java.sql.Timestamp.valueOf("2024-01-01 00:30:00"), 1.0),
      (1L, "K", java.sql.Timestamp.valueOf("2024-01-01 02:10:00"), 5.0),
      (2L, "K", java.sql.Timestamp.valueOf("2024-01-01 03:00:00"), 9.0))
      .toDF("id", "k", "t", "v")
    val got = Series.resampleFfill(df, "k", col("t"), col("id"), col("v"),
        stepSec = 3600L)
      .orderBy("grid_ts")
      .as[(String, java.sql.Timestamp, Option[Double])].collect()
    // 00:00 precedes the first obs → null; 01:00/02:00 carry 1.0
    // (02:10 is later); 03:00 has an exact-ts obs → 9.0
    assert(got.map(_._3).toSeq === Seq(None, Some(1.0), Some(1.0),
      Some(9.0)))
  }

  test("williamsR: close position in the trailing true range; flat null") {
    val bars = Seq(
      ("K", 0L, 10.0, 8.0, 9.0),   // warm-up (n = 2)
      ("K", 1L, 12.0, 9.0, 11.0),  // hi 12, lo 8 → (12−11)·−100/4 = −25
      ("K", 2L, 11.0, 7.0, 8.0),   // hi 12, lo 7 → (12−8)·−100/5 = −80
      ("F", 0L, 5.0, 5.0, 5.0),    // flat range → null
      ("F", 1L, 5.0, 5.0, 5.0))
      .toDF("k", "bar", "high", "low", "close")
    val got = Series.williamsR(bars, "k", n = 2)
      .orderBy("k", "bar").select("k", "wr")
      .as[(String, Option[Double])].collect()
    assert(got.toSeq === Seq(("F", None), ("F", None),
      ("K", None), ("K", Some(-25.0)), ("K", Some(-80.0))))
  }

  test("donchian: trailing extremes with warm-up; midline averages them") {
    val bars = Seq(
      ("K", 0L, 10.0, 8.0, 9.0),   // warm-up (n = 2)
      ("K", 1L, 12.0, 9.0, 11.0),  // up 12, dn 8, mid 10
      ("K", 2L, 11.0, 7.0, 8.0))   // up 12, dn 7, mid 9.5
      .toDF("k", "bar", "high", "low", "close")
    val got = Series.donchian(bars, "k", n = 2)
      .orderBy("bar").select("dc_up", "dc_dn", "dc_mid")
      .as[(Option[Double], Option[Double], Option[Double])].collect()
    assert(got.toSeq === Seq((None, None, None),
      (Some(12.0), Some(8.0), Some(10.0)),
      (Some(12.0), Some(7.0), Some(9.5))))
  }

  test("aroon: bars-since-extreme on 0..100; extremum ties go latest") {
    val bars = Seq(
      ("K", 0L, 10.0, 8.0, 9.0),  // warm-up (n = 2 needs 3 bars)
      ("K", 1L, 12.0, 9.0, 11.0), // warm-up
      ("K", 2L, 11.0, 7.0, 8.0),  // hi 12@rn2 → up 50; lo 7@rn3 → dn 100
      ("K", 3L, 12.0, 9.0, 10.0)) // hi 12 ties rn2/rn4 → LATEST → up 100
      .toDF("k", "bar", "high", "low", "close")
    val got = Series.aroon(bars, "k", n = 2)
      .orderBy("bar").select("aroon_up", "aroon_dn")
      .as[(Option[Double], Option[Double])].collect()
    assert(got.toSeq === Seq((None, None), (None, None),
      (Some(50.0), Some(100.0)),
      (Some(100.0), Some(50.0)))) // lo 7@rn3: (2-(4-3))·100/2 = 50
  }

  test("aroon: shadowed extremes (declining highs / rising lows) give " +
    "0, not null") {
    // After the peak ages out of the frame, every in-frame high is
    // smaller than ITS OWN trailing max (shadowed by the bar just
    // outside the frame). A staged `high === trailing_max` scan
    // nulls here; the in-frame struct arg-extremum must give the
    // textbook 0 (extreme printed n bars ago) on every warm row.
    val bars = Seq(
      ("K", 0L, 20.0, 10.0, 9.0), ("K", 1L, 19.0, 11.0, 9.0),
      ("K", 2L, 18.0, 12.0, 9.0), ("K", 3L, 17.0, 13.0, 9.0),
      ("K", 4L, 16.0, 14.0, 9.0))
      .toDF("k", "bar", "high", "low", "close")
    val got = Series.aroon(bars, "k", n = 2)
      .orderBy("bar").select("aroon_up", "aroon_dn")
      .as[(Option[Double], Option[Double])].collect()
    assert(got.toSeq === Seq((None, None), (None, None),
      (Some(0.0), Some(0.0)), (Some(0.0), Some(0.0)),
      (Some(0.0), Some(0.0))))
  }

  test("obv: signed volume votes accumulate; first bar and flats vote 0") {
    val bars = Seq(
      ("K", 0L, 5.0, 10L), ("K", 1L, 7.0, 20L), // up → +20
      ("K", 2L, 6.0, 30L),                      // down → −30
      ("K", 3L, 6.0, 40L),                      // flat → 0
      ("K", 4L, 9.0, 50L))                      // up → +50
      .toDF("k", "bar", "close", "n")
    val got = Series.obv(bars, "k", col("n"))
      .orderBy("bar").select("obv").as[Long].collect()
    assert(got.toSeq === Seq(0L, 20L, -10L, -10L, 40L))
  }

  test("keltner: flat bars collapse the channel onto the price") {
    val bars = (0 until 6).map(i => ("K", i.toLong, 5.0, 5.0, 5.0))
      .toDF("k", "bar", "high", "low", "close")
    val got = Series.keltner(bars, "k", emaSpan = 2, atrSpan = 2, k = 2.0)
      .orderBy("bar").select("kc_mid", "kc_up", "kc_dn")
      .as[(Option[Double], Option[Double], Option[Double])].collect()
    assert(got.take(3).forall(_._1.isEmpty)) // EMA warm-up (K = 4)
    assert(got.drop(3).forall(r =>
      r._1.contains(5.0) && r._2.contains(5.0) && r._3.contains(5.0)))
  }

  test("ichimoku: midranges and displacements on a linear ramp") {
    // high = low = close = i → every n-bar midrange is i − (n−1)/2
    val bars = (0 until 80).map(i =>
      ("K", i.toLong, i.toDouble, i.toDouble, i.toDouble))
      .toDF("k", "bar", "high", "low", "close")
    val got = Series.ichimoku(bars, "k").orderBy("bar")
      .select("tenkan", "kijun", "senkou_a", "senkou_b", "chikou")
      .as[(Option[Double], Option[Double], Option[Double],
           Option[Double], Option[Double])].collect()
    assert(got(7)._1.isEmpty && got(8)._1.contains(4.0)) // 9-bar warm-up
    assert(got(79)._1.contains(75.0))   // i − 4
    assert(got(79)._2.contains(66.5))   // i − 12.5
    assert(got(79)._3.contains(44.75))  // (t + k)/2 at i−26
    assert(got(79)._4.contains(27.5))   // mid52 at i−26 = 53 − 25.5
    assert(got(40)._5.contains(66.0))   // close at i+26
    assert(got(79)._5.isEmpty)          // no bar 26 ahead
  }

  test("atr: TR bridges the inter-bar gap; first bar is high−low") {
    val df = Seq(
      (0L, "K", ts(0), 8.0), (1L, "K", ts(1), 10.0), (2L, "K", ts(2), 9.0),
      (3L, "K", ts(61), 11.0), (4L, "K", ts(62), 12.0))
      .toDF("id", "k", "t", "v")
    val bars = Series.ohlcBars(df, "k", col("t"), col("id"), col("v"),
      "1 hour")
    val got = Series.atr(bars, "k", 2).orderBy("bar")
      .select("tr", "atr").as[(Double, Option[Double])].collect()
    assert(got(0)._1 === 2.0) // 10 − 8
    assert(got(1)._1 === 3.0) // max(12−11, |12−9|, |11−9|)
    assert(got(0)._2.isEmpty)
    assert(got(1)._2.contains(2.5))
  }
}
