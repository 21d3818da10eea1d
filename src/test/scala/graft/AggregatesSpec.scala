package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Aggregates
import graft.functions.MarketFunctions

/** A1–A8 aggregation semantics against hand-computed fixtures mirroring
  * /root/reference/app/db.py:399-425 and static/main.js:554-570,1002-1017.
  */
class AggregatesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("positions: BUY/SELL conditional algebra, DIV ignored, avg_cost") {
    val txns = Seq(
      (1L, "AAPL", "BUY", 10.0, 100.0, 1.0),
      (2L, "AAPL", "BUY", 10.0, 110.0, 1.0),
      (3L, "AAPL", "SELL", 5.0, 120.0, 1.0),
      (4L, "AAPL", "DIV", 99.0, 999.0, 99.0), // ignored entirely
      (5L, "MSFT", "SELL", 2.0, 50.0, 0.5))   // sells only -> no buys
      .toDF("id", "symbol", "type", "qty", "price", "fees")
    val got = Aggregates.positions(txns).orderBy("symbol").collect()
    val aapl = got(0)
    assert(aapl.getString(0) === "AAPL")
    assert(aapl.getDouble(1) === 15.0)            // 10+10-5
    assert(aapl.getDouble(2) === 2100.0)          // 10*100+10*110
    assert(aapl.getDouble(3) === 3.0)             // BUY+SELL fees only
    assert(aapl.getDouble(4) === 105.0)           // 2100/20
    val msft = got(1)
    assert(msft.getDouble(1) === -2.0 && msft.getDouble(4) === 0.0)
  }

  test("latestPerKey: max (ord, id) wins — id breaks ties (db.py:391-396)") {
    val df = Seq(
      (1L, "A", ts("2024-01-01 00:00:00"), 10.0),
      (3L, "A", ts("2024-01-02 00:00:00"), 30.0),
      (2L, "A", ts("2024-01-02 00:00:00"), 20.0)) // same ts, lower id
      .toDF("id", "k", "t", "v")
    val got = Aggregates.latestPerKey(df, "k", $"t", $"id", $"v").collect()
    assert(got(0).getDouble(1) === 30.0)
  }

  test("overviewStats: winrate whole-percent rounding (main.js:941)") {
    val j = Seq(
      ("Long", 1.0, 10.0, Some(15.0), 0.0, 9.5),
      ("Long", 1.0, 10.0, Some(5.0), 0.0, 9.5),
      ("Long", 1.0, 10.0, Some(12.0), 0.0, 9.5))
      .toDF("direction", "qty", "entry", "exit", "fees", "stop")
    val pnl = MarketFunctions.pnl($"direction", $"qty", $"entry", $"exit",
      $"fees")
    val r = MarketFunctions.rMultiple(pnl, $"entry", $"stop", $"qty")
    val row = Aggregates.overviewStats(j, pnl, r).collect()(0)
    assert(row.getAs[Long]("n") === 3L)
    assert(row.getAs[Long]("wins") === 2L)
    assert(row.getAs[Double]("winrate") === 67.0) // round(66.67)
    assert(row.getAs[Double]("total_pnl") === 2.0) // 5-5+2
  }

  test("histogram10: clamped bins; degenerate max==min goes to bin 0") {
    val df = (0 until 100).map(_.toDouble).toDF("v")
    val bins = Aggregates.histogram10(df, $"v").orderBy("bin")
      .as[(Int, Long)].collect()
    assert(bins.length === 10 && bins.forall(_._2 === 10L))
    assert(bins.head === ((0, 10L)) && bins.last === ((9, 10L)))
    val flat = Seq(5.0, 5.0, 5.0).toDF("v")
    val fb = Aggregates.histogram10(flat, $"v").as[(Int, Long)].collect()
    assert(fb.toSeq === Seq((0, 3L)))
  }

  test("approxPercentilesHist: within one bin width of exact; degenerate flat input") {
    val df = (1 to 10000).map(_.toDouble).toDF("v")
    val got = Aggregates.approxPercentilesHist(df, $"v",
        ps = Seq(0.5, 0.9, 0.99), bins = 1000)
      .orderBy("p").as[(Double, Double)].collect().toMap
    val binWidth = (10000.0 - 1.0) / 1000
    // exact percentiles of 1..10000 are ~p*10000
    assert(math.abs(got(0.5) - 5000.0) <= binWidth)
    assert(math.abs(got(0.9) - 9000.0) <= binWidth)
    assert(math.abs(got(0.99) - 9900.0) <= binWidth)
    // reproducible under a different partitioning (mergeable counts)
    val re = Aggregates.approxPercentilesHist(df.repartition(13), $"v",
        ps = Seq(0.5, 0.9, 0.99), bins = 1000)
      .orderBy("p").as[(Double, Double)].collect().toMap
    assert(re === got)
    // max == min collapses to the single value
    val flat = Seq(5.0, 5.0, 5.0).toDF("v")
    val fp = Aggregates.approxPercentilesHist(flat, $"v", Seq(0.5), 10)
      .as[(Double, Double)].collect()
    assert(fp.toSeq === Seq((0.5, 5.0)))
  }

  test("groupedApproxPercentiles: per-group answers match the global sketch per slice") {
    // two groups with disjoint distributions: each group's grouped
    // answer must equal the GLOBAL sketch run on that slice alone
    val df = ((1 to 5000).map(i => ("a", i.toDouble)) ++
      (1 to 2000).map(i => ("b", i * 10.0))).toDF("g", "v")
    val got = Aggregates.groupedApproxPercentiles(df, $"g", $"v",
        ps = Seq(0.5, 0.9), bins = 100)
      .orderBy("key", "p").as[(String, Double, Long)].collect().toSeq
    val expected = Seq("a", "b").flatMap { g =>
      Aggregates.approxPercentilesHist(df.filter($"g" === g), $"v",
          ps = Seq(0.5, 0.9), bins = 100)
        .orderBy("p").as[(Double, Double)].collect().toSeq
        .map { case (p, est) => (g, p, est) }
    }
    // grouped emits floor-micro, the global sketch emits round-6: the
    // same underlying estimate within one micro-unit
    got.zip(expected).foreach { case ((gk, gp, micro), (ek, ep, est)) =>
      assert(gk === ek && gp === ep)
      assert(math.abs(micro / 1e6 - est) <= 1e-6,
        s"$gk p=$gp micro=$micro est=$est")
    }
    // reproducible under a different partitioning (mergeable counts,
    // fixed-order interpolation)
    val re = Aggregates.groupedApproxPercentiles(df.repartition(13),
        $"g", $"v", ps = Seq(0.5, 0.9), bins = 100)
      .orderBy("key", "p").as[(String, Double, Long)].collect().toSeq
    assert(re === got)
  }

  test("approxCountDistinctHll: estimate within the sketch's error band; reproducible") {
    // 5000 distinct keys, each duplicated 3x — duplicates must not move
    // the registers
    val df = (1 to 15000).map(i => s"user-${i % 5000}").toDF("k")
    val est = Aggregates.approxCountDistinctHll(df, $"k", p = 8)
      .as[Double].collect()(0)
    // p=8 → relative std error ≈ 1.04/sqrt(256) ≈ 6.5%; allow 3 sigma
    assert(math.abs(est - 5000.0) / 5000.0 < 0.20, s"est=$est")
    val re = Aggregates.approxCountDistinctHll(df.repartition(11), $"k",
      p = 8).as[Double].collect()(0)
    assert(re === est)
    // small cardinality exercises the linear-counting correction
    val small = (1 to 40).map(i => s"u$i").toDF("k")
    val se = Aggregates.approxCountDistinctHll(small, $"k", p = 8)
      .as[Double].collect()(0)
    assert(math.abs(se - 40.0) / 40.0 < 0.25, s"small est=$se")
  }

  test("countMinTopK: estimates never undercount; hot key stays near truth") {
    val items = (Seq.fill(500)("hot") ++ (1 to 2000).map(i => s"cold-$i"))
      .toDF("x")
    val got = Aggregates.countMinTopK(items, $"x", k = 5)
      .orderBy($"n_true".desc, $"item").collect()
    assert(got.head.getAs[String]("item") === "hot")
    assert(got.head.getAs[Long]("n_true") === 500L)
    // the CMS invariant: min-over-rows never undercounts
    assert(got.forall(_.getAs[Boolean]("overestimates")))
    // with 2500 occurrences over 1024 cells × 4 rows, collisions
    // inflate the hot key's estimate only slightly
    assert(got.head.getAs[Long]("cms_est") - 500L <= 50L)
  }

  test("quoteDelta: last minus prev; single-row key has null delta") {
    val df = Seq(
      (1L, "A", ts("2024-01-01 00:00:00"), 10.0),
      (2L, "A", ts("2024-01-02 00:00:00"), 12.5),
      (3L, "B", ts("2024-01-01 00:00:00"), 7.0))
      .toDF("id", "k", "t", "v")
    val got = Aggregates.quoteDelta(df, "k", $"t", $"id", $"v")
      .orderBy("k").collect()
    assert(got(0).getDouble(1) === 12.5 && got(0).getDouble(2) === 2.5)
    assert(got(1).getDouble(1) === 7.0 && got(1).isNullAt(2))
  }

  test("rangeChange: first/last over last-N window, pct guard first!=0") {
    val df = (1 to 10).map(i =>
      (i.toLong, "A", ts(f"2024-01-${i}%02d 00:00:00"), i * 10.0))
      .toDF("id", "k", "t", "v")
    val got = Aggregates.rangeChange(df, "k", $"t", $"id", $"v", lastN = 5)
      .collect()(0)
    assert(got.getAs[Double]("last") === 100.0)  // most recent
    assert(got.getAs[Double]("first") === 60.0)  // 5 back
    assert(got.getAs[Double]("diff") === 40.0)
    val zero = Seq((1L, "Z", ts("2024-01-01 00:00:00"), 0.0),
      (2L, "Z", ts("2024-01-02 00:00:00"), 5.0)).toDF("id", "k", "t", "v")
    val zrow = Aggregates.rangeChange(zero, "k", $"t", $"id", $"v", 5)
      .collect()(0)
    assert(zrow.isNullAt(zrow.fieldIndex("pct"))) // first == 0 -> null
  }

  test("hiLoMid (main.js:342-345)") {
    val df = Seq(("A", 4.0), ("A", 10.0), ("A", 6.0)).toDF("k", "v")
    val r = Aggregates.hiLoMid(df, "k", $"v").collect()(0)
    assert(r.getDouble(1) === 10.0 && r.getDouble(2) === 4.0 &&
      r.getDouble(3) === 7.0)
  }

  test("positions property: matches a sequential reference fold on random txns") {
    val rng = new scala.util.Random(7)
    val types = Seq("BUY", "SELL", "DIV", "CASH", "FX")
    val txns = (1 to 400).map { i =>
      (i.toLong, s"S${rng.nextInt(6)}", types(rng.nextInt(types.length)),
        math.rint(rng.nextDouble() * 1000) / 100.0,
        math.rint(rng.nextDouble() * 10000) / 100.0,
        math.rint(rng.nextDouble() * 100) / 100.0)
    }
    // reference semantics (app/db.py:405-421) as a plain fold
    val expect = txns.groupBy(_._2).map { case (sym, rows) =>
      var (qty, cost, fees, buys) = (0.0, 0.0, 0.0, 0.0)
      rows.foreach { case (_, _, t, q, p, f) =>
        if (t == "BUY") { qty += q; cost += q * p; fees += f; buys += q }
        else if (t == "SELL") { qty -= q; fees += f }
      }
      sym -> (qty, cost, fees, if (buys == 0) 0.0 else cost / buys)
    }
    val got = Aggregates.positions(
      txns.toDF("id", "symbol", "type", "qty", "price", "fees"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (sym, (q, c, f, ac)) =>
      val (gq, gc, gf, gac) = got(sym)
      assert(math.abs(gq - q) < 1e-6, s"$sym qty")
      assert(math.abs(gc - c) < 1e-6, s"$sym cost")
      assert(math.abs(gf - f) < 1e-6, s"$sym fees")
      assert(math.abs(gac - ac) < 1e-5, s"$sym avg_cost")
    }
  }

  test("positionsWithMarketValue: left join keeps symbols without prices") {
    val txns = Seq((1L, "AAPL", "BUY", 2.0, 100.0, 0.0),
      (2L, "NOPX", "BUY", 1.0, 10.0, 0.0))
      .toDF("id", "symbol", "type", "qty", "price", "fees")
    val prices = Seq((1L, "AAPL", 150.0, ts("2024-01-01 00:00:00")))
      .toDF("id", "symbol", "price", "as_of")
    val got = Aggregates.positionsWithMarketValue(txns, prices)
      .orderBy("symbol").collect()
    assert(got(0).getAs[Double]("market_value") === 300.0)
    assert(got(1).isNullAt(got(1).fieldIndex("last")))
    assert(got(1).isNullAt(got(1).fieldIndex("market_value")))
  }

  test("eventFunnel: stages must occur in order, first-touch binding") {
    val ev = Seq(
      // u1 completes the whole funnel in order
      (1L, ts("2024-01-01 00:00:00"), "signup"),
      (1L, ts("2024-01-02 00:00:00"), "view"),
      (1L, ts("2024-01-03 00:00:00"), "purchase"),
      // u2 viewed BEFORE signing up and never after: the purchase
      // after signup must NOT count (no qualifying view precedes it)
      (2L, ts("2024-01-01 00:00:00"), "view"),
      (2L, ts("2024-01-02 00:00:00"), "signup"),
      (2L, ts("2024-01-03 00:00:00"), "purchase"),
      // u3 stalls after signup
      (3L, ts("2024-01-05 00:00:00"), "signup"),
      // u4 never signs up: contributes to no stage
      (4L, ts("2024-01-01 00:00:00"), "view"),
      (4L, ts("2024-01-02 00:00:00"), "purchase"))
      .toDF("user_id", "t", "etype")
    val got = Aggregates.eventFunnel(ev, col("user_id"), col("t"),
        col("etype"), Seq("signup", "view", "purchase"))
      .orderBy("stage").collect()
    assert(got.map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .toSeq === Seq((1, "signup", 3L), (2, "view", 1L),
        (3, "purchase", 1L)))
  }

  test("eventFunnel: stage binds to its EARLIEST qualifying event") {
    // u1's first view is before signup, second is after: the funnel
    // must bind to the later one, and the purchase between them (after
    // signup but before the qualifying view) must not count
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-02 00:00:00"), "signup"),
      (1L, ts("2024-01-03 00:00:00"), "purchase"),
      (1L, ts("2024-01-04 00:00:00"), "view"),
      (1L, ts("2024-01-05 00:00:00"), "purchase"))
      .toDF("user_id", "t", "etype")
    val got = Aggregates.eventFunnel(ev, col("user_id"), col("t"),
        col("etype"), Seq("signup", "view", "purchase"))
      .orderBy("stage").collect()
    assert(got.map(_.getLong(2)).toSeq === Seq(1L, 1L, 1L))
  }

  test("pairCorrelation: perfect anti-correlation; co-observed only") {
    def at(h: Int) = ts(f"2024-01-01 $h%02d:30:00")
    val ev =
      // six co-observed hourly buckets: A rises linearly, B falls
      (0 until 6).flatMap { h =>
        Seq(("A", at(h), (h + 1).toDouble), ("B", at(h), 10.0 - h))
      } ++
      // an A-only bucket: must NOT enter the pair (inner alignment)
      Seq(("A", at(7), 100.0))
    val got = Aggregates.pairCorrelation(ev.toDF("k", "t", "v"),
        col("k"), col("t"), col("v"), bucketSeconds = 3600L)
      .collect()
    assert(got.length === 1)
    val r = got(0)
    assert(r.getAs[String]("key_a") === "A" &&
      r.getAs[String]("key_b") === "B")
    assert(r.getAs[Long]("n_buckets") === 6L,
      "the A-only bucket is excluded")
    assert(math.abs(r.getAs[Double]("corr_xy") + 1.0) < 1e-12,
      "exact linear anti-correlation")
  }

  test("pairCorrelation: in-bucket events aggregate before correlating") {
    def at(h: Int, m: Int) = ts(f"2024-01-01 $h%02d:$m%02d:00")
    // two events per bucket for A; their SUM (not either event) tracks
    // B perfectly, so corr must be exactly +1
    val ev = (0 until 4).flatMap { h =>
      Seq(("A", at(h, 10), (h + 1).toDouble),
          ("A", at(h, 40), (h + 1).toDouble),
          ("B", at(h, 20), 2.0 * (h + 1)))
    }
    val r = Aggregates.pairCorrelation(ev.toDF("k", "t", "v"),
        col("k"), col("t"), col("v"), bucketSeconds = 3600L)
      .collect()(0)
    assert(math.abs(r.getAs[Double]("corr_xy") - 1.0) < 1e-12)
  }

  test("betaToBenchmark: self-beta is exactly 1; 2x series has beta 2") {
    def at(h: Int) = ts(f"2024-01-01 $h%02d:15:00")
    val ev = (0 until 5).flatMap { h =>
      Seq(("BM", at(h), (h * h + 1).toDouble),      // the benchmark
          ("D",  at(h), 2.0 * (h * h + 1)),          // exactly 2x
          ("N",  at(h), 7.0))                        // flat: beta 0
    }
    val got = Aggregates.betaToBenchmark(ev.toDF("k", "t", "v"),
        col("k"), col("t"), col("v"), benchmarkKey = "BM",
        bucketSeconds = 3600L)
      .collect().map(r => r.getAs[String]("key") ->
        r.getAs[Double]("beta")).toMap
    assert(got("BM") === 1.0, "benchmark regressed on itself")
    assert(math.abs(got("D") - 2.0) < 1e-12)
    assert(math.abs(got("N")) < 1e-12)
  }

  test("seriesGapAudit: missing buckets counted, dense series clean") {
    val ev = Seq(
      // A: hours 0,1,4 observed → span 5, missing 2
      ("A", ts("2024-01-01 00:10:00")),
      ("A", ts("2024-01-01 00:50:00")), // same bucket as above
      ("A", ts("2024-01-01 01:10:00")),
      ("A", ts("2024-01-01 04:10:00")),
      // B: hours 0,1 → complete
      ("B", ts("2024-01-01 00:10:00")),
      ("B", ts("2024-01-01 01:10:00")))
      .toDF("k", "t")
    val got = Aggregates.seriesGapAudit(ev, col("k"), col("t"),
        bucketSeconds = 3600L)
      .orderBy("key").collect()
    assert(got(0).getAs[Long]("observed") === 3L)
    assert(got(0).getAs[Long]("expected") === 5L)
    assert(got(0).getAs[Long]("missing") === 2L)
    assert(got(1).getAs[Long]("missing") === 0L)
  }

  test("cohortRetention: triangle cells, pre-anchor events dropped") {
    val ev = Seq(
      // u1 first active week 0, returns weeks 1 and 3
      (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-09 10:00:00")),
      (1L, ts("2024-01-23 10:00:00")),
      // u2 also cohort week 0, returns week 1 (twice in-week: one cell)
      (2L, ts("2024-01-03 10:00:00")),
      (2L, ts("2024-01-10 10:00:00")),
      (2L, ts("2024-01-11 10:00:00")),
      // u3 cohort week 2, never returns
      (3L, ts("2024-01-16 10:00:00")),
      // u4 only active BEFORE the anchor: dropped entirely
      (4L, ts("2023-12-20 10:00:00")))
      .toDF("user_id", "t")
    val got = Aggregates.cohortRetention(ev, col("user_id"), col("t"),
        anchor = "2024-01-01")
      .orderBy("cohort_week", "week_offset").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq === Seq((0L, 0L, 2L), (0L, 1L, 2L), (0L, 3L, 1L),
        (2L, 0L, 1L)))
  }

  test("sharpe: hand-computed ratio; constant-increment series is null") {
    // values 1,2,4 → cent returns 100,200: mean 150, s² 5000,
    // sharpe = 150/√5000 = 2.121320...
    val ev = Seq((0L, "A", ts("2024-01-01 00:00:00"), 1.0),
      (1L, "A", ts("2024-01-01 00:01:00"), 2.0),
      (2L, "A", ts("2024-01-01 00:02:00"), 4.0),
      // B: constant increments → σ = 0 → sharpe null
      (3L, "B", ts("2024-01-01 00:00:00"), 1.0),
      (4L, "B", ts("2024-01-01 00:01:00"), 2.0),
      (5L, "B", ts("2024-01-01 00:02:00"), 3.0))
      .toDF("id", "k", "t", "v")
    val got = Aggregates.sharpe(ev, "k", col("t"), col("id"), col("v"))
      .orderBy("k").collect()
    assert(got(0).getLong(1) === 2L)
    assert(got(0).getAs[Double]("mean_ret") === 1.5)
    assert(got(0).getAs[Double]("sharpe") === 2.12132)
    assert(got(1).isNullAt(got(1).fieldIndex("sharpe")))
  }

  test("autocorr: alternating returns are −1 at lag 1; constant null") {
    // A: values 0,1,0,1,0 → returns +100,−100,+100,−100 (cents);
    // lag-1 pairs (100,−100),(−100,100),(100,−100) → r = −1 exactly
    val ev = (0 until 5).map(i =>
      (i.toLong, "A", ts(f"2024-01-01 00:0$i%d:00"), (i % 2).toDouble)) ++
      // B: constant increments → every return equal → varX = 0 → null
      (0 until 4).map(i =>
        (10L + i, "B", ts(f"2024-01-01 00:0$i%d:00"), i.toDouble))
    val got = Aggregates.autocorr(ev.toDF("id", "k", "t", "v"),
        "k", col("t"), col("id"), col("v"), lagK = 1)
      .orderBy("k").collect()
    assert(got(0).getLong(1) === 3L)
    assert(got(0).getAs[Double]("autocorr") === -1.0)
    assert(got(1).getLong(1) === 2L)
    assert(got(1).isNullAt(got(1).fieldIndex("autocorr")))
  }

  test("varianceRatio: perfect mean reversion is 0; trend (σ₁ = 0) null") {
    // A: values alternate 0,1 → 1-period returns ±100 (σ² > 0) but
    // every 2-period return is exactly 0 → VR(2) = 0
    val ev = (0 until 6).map(i =>
      (i.toLong, "A", ts(f"2024-01-01 00:0$i%d:00"), (i % 2).toDouble)) ++
      // B: constant increments → all 1-period returns equal → σ₁ = 0
      (0 until 5).map(i =>
        (10L + i, "B", ts(f"2024-01-01 00:0$i%d:00"), i.toDouble))
    val got = Aggregates.varianceRatio(ev.toDF("id", "k", "t", "v"),
        "k", col("t"), col("id"), col("v"), k = 2)
      .orderBy("k").collect()
    assert(got(0).getLong(1) === 5L && got(0).getLong(2) === 4L)
    assert(got(0).getAs[Double]("vr") === 0.0)
    assert(got(1).isNullAt(got(1).fieldIndex("vr")))
  }

  test("nonparamSkew: symmetric 0, right-tail positive") {
    val ev = Seq(("S", 1.0), ("S", 2.0), ("S", 3.0),
      ("R", 1.0), ("R", 1.0), ("R", 10.0)).toDF("k", "v")
    val got = Aggregates.nonparamSkew(ev, "k", col("v"))
      .orderBy("k").collect()
    // R: mean 4, median 1, σ = √270000/100 → 3·300/519.615...
    assert(got(0).getAs[Double]("skew") === 1.732051)
    assert(got(0).getAs[Double]("median") === 1.0)
    assert(got(1).getAs[Double]("skew") === 0.0) // mean == median
  }

  test("seasonality: dow 0 = Sunday, per-cell integer-micro mean") {
    val ev = Seq(
      ("A", ts("2024-01-07 13:10:00"), 2.0), // Sunday → dow 0
      ("A", ts("2024-01-07 13:50:00"), 4.0), // same cell
      ("A", ts("2024-01-01 09:00:00"), 7.0)) // Monday → dow 1
      .toDF("k", "t", "v")
    val got = Aggregates.seasonality(ev, "k", col("t"), col("v"))
      .orderBy("dow", "hod").collect()
    assert(got.map(r => (r.getInt(1), r.getInt(2), r.getLong(3),
      r.getAs[Double]("mean_value"))).toSeq ===
      Seq((0, 13, 2L, 3.0), (1, 9, 1L, 7.0)))
  }

  test("benford: digit from exact integer micros, zero rows excluded") {
    // digits: 1×3 (1.0, 0.15, 12.0), 2×1 (0.25), 5×1 (5.0); 0.0 dropped
    val ev = Seq(1.0, 0.15, 12.0, 0.25, 5.0, 0.0).toDF("v")
    val got = Aggregates.benford(ev, col("v")).orderBy("digit").collect()
    assert(got.map(r => (r.getInt(0), r.getLong(1))).toSeq ===
      Seq((1, 3L), (2, 1L), (5, 1L)))
    assert(got(0).getAs[Double]("obs_share") === 0.6)
    assert(got(0).getAs[Double]("exp_share") === 0.30103)
    // shares against the 5-row positive total, deviation over rounded
    assert(got(0).getAs[Double]("dev") === 0.29897)
  }

  test("welchTvsRest: equal groups read t = 0; shifted group |t| known") {
    // A = {1,2,3}, B = {5,6,7}: both have sample variance 1, n = 3,
    // so se² = 2/3 and t_A = (2 − 6)/√(2/3) = −4.898979…, df = 4
    // (Welch–Satterthwaite with equal u-terms collapses to 2(n−1)).
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0),
      ("B", 5.0), ("B", 6.0), ("B", 7.0)).toDF("k", "v")
    val got = Aggregates.welchTvsRest(df, "k", col("v"))
      .orderBy("k").collect()
    assert(got.map(_.getString(0)).toSeq === Seq("A", "B"))
    assert(got(0).getAs[Double]("mean") === 2.0)
    assert(got(0).getAs[Double]("t_welch") === -4.898979)
    assert(got(1).getAs[Double]("t_welch") === 4.898979)
    assert(got(0).getAs[Double]("df_welch") === 4.0)
    // identical groups: t reads exactly 0, df still defined
    val same = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0),
      ("B", 1.0), ("B", 2.0), ("B", 3.0)).toDF("k", "v")
    val g2 = Aggregates.welchTvsRest(same, "k", col("v")).collect()
    assert(g2.forall(_.getAs[Double]("t_welch") === 0.0))
  }

  test("gini: uniform mass scores 0, a single owner approaches 1, " +
    "hand value exact, ties order-invariant, zero mass null") {
    def g(rows: Seq[(String, Long, Long)]): Map[String, Option[Long]] =
      Aggregates.giniPpm(rows.toDF("grp", "id", "x"), "grp", "x", "id")
        .collect().map(r => r.getString(0) ->
          Option(r.get(2)).map(_.asInstanceOf[Long])).toMap
    val got = g(Seq(
      ("eq", 1L, 7L), ("eq", 2L, 7L), ("eq", 3L, 7L), ("eq", 4L, 7L),
      ("one", 1L, 0L), ("one", 2L, 0L), ("one", 3L, 0L), ("one", 4L, 100L),
      // hand: x = (1,2,3,4) ascending → G = (2·30 − 5·10)/(4·10) = 0.25
      ("hand", 1L, 1L), ("hand", 2L, 2L), ("hand", 3L, 3L), ("hand", 4L, 4L),
      ("zero", 1L, 0L), ("zero", 2L, 0L)))
    assert(got("eq") === Some(0L))
    assert(got("one") === Some(750000L), "(n-1)/n = 3/4 for one owner")
    assert(got("hand") === Some(250000L))
    assert(got("zero") === None)
    // permutation within ties cannot move the value
    val a = g(Seq(("t", 1L, 5L), ("t", 2L, 5L), ("t", 3L, 9L)))
    val b = g(Seq(("t", 3L, 5L), ("t", 1L, 5L), ("t", 2L, 9L)))
    assert(a("t") === b("t"))
  }
}
