package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Ordered-series / window operators — SURVEY.md §2.5 (W1–W10) and the
  * composite ICT analytics pipeline P1. The reference computes all of
  * these client-side over a per-symbol JS array
  * (/root/reference/static/main.js:217-383); here each one is a window
  * function over `partitionBy(key).orderBy(ts, id)`, so per-key series
  * stay within a partition and the computation scales horizontally with
  * the number of keys.
  *
  * Money-valued rolling sums use integer cents (see
  * [[Aggregates.cents]]) so results are order-independent and exactly
  * reproducible.
  */
object Series {

  def ordered(key: String, ord: Column, id: Column): WindowSpec =
    Window.partitionBy(col(key)).orderBy(ord.asc, id.asc)

  private def trailing(w: WindowSpec, n: Int): WindowSpec =
    w.rowsBetween(-(n - 1), 0)

  /** W1 — SMA(n) with NaN/null warm-up until n−1 rows
    * (/root/reference/static/main.js:217-227). Mean is computed as
    * integer-cents sum / count for cross-engine determinism.
    */
  def sma(value: Column, n: Int, w: WindowSpec): Column = {
    val tw = trailing(w, n)
    when(count(value).over(tw) >= n,
      round(sum(Aggregates.cents(value)).over(tw) /
        (lit(1000000.0) * count(value).over(tw)), 6))
  }

  /** W2 — running cumulative sum (equity curve,
    * /root/reference/static/main.js:990-1001).
    */
  def cumSum(value: Column, w: WindowSpec): Column =
    Aggregates.fromCents(sum(Aggregates.cents(value))
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

  /** W3 — rolling sample stddev (/root/reference/static/main.js:231-232). */
  def rollingStd(value: Column, n: Int, w: WindowSpec): Column = {
    val tw = trailing(w, n)
    when(count(value).over(tw) >= n, round(stddev_samp(value).over(tw), 6))
  }

  /** W4 — rolling min (/root/reference/static/main.js:233). */
  def rollingMin(value: Column, n: Int, w: WindowSpec): Column =
    min(value).over(trailing(w, n))

  /** W5 — highest value and its offset within the trailing n
    * (/root/reference/static/main.js:234-235): arg-max over the window
    * frame via max(struct(v, pos)).
    */
  def highestWithPos(value: Column, pos: Column, n: Int,
                     w: WindowSpec): (Column, Column) = {
    val s = max(struct(value.as("v"), pos.as("p"))).over(trailing(w, n))
    (s.getField("v"), s.getField("p"))
  }

  /** W6 — local extrema: px[i] ≥ px[i−1] ∧ px[i] ≥ px[i+1] (highs;
    * mirrored for lows) (/root/reference/static/main.js:322-335).
    */
  def isLocalHigh(value: Column, w: WindowSpec): Column =
    lag(value, 1).over(w).isNotNull && lead(value, 1).over(w).isNotNull &&
      value >= lag(value, 1).over(w) && value >= lead(value, 1).over(w)
  def isLocalLow(value: Column, w: WindowSpec): Column =
    lag(value, 1).over(w).isNotNull && lead(value, 1).over(w).isNotNull &&
      value <= lag(value, 1).over(w) && value <= lead(value, 1).over(w)

  /** W6 staged: ONE lag + ONE lead frame feeding both extremum flags —
    * the Column forms above inline each neighbor twice per flag (8
    * frames for 2 distinct); this is the form a full-table extremum
    * scan should use.
    */
  def localExtrema(df: DataFrame, value: Column, w: WindowSpec): DataFrame =
    df.withColumn("_pv", lag(value, 1).over(w))
      .withColumn("_nv", lead(value, 1).over(w))
      .withColumn("is_high", col("_pv").isNotNull && col("_nv").isNotNull &&
        value >= col("_pv") && value >= col("_nv"))
      .withColumn("is_low", col("_pv").isNotNull && col("_nv").isNotNull &&
        value <= col("_pv") && value <= col("_nv"))
      .drop("_pv", "_nv")

  /** W7 — MA slope: ma[i] − ma[i−k]
    * (/root/reference/static/main.js:242-243).
    */
  def slope(ma: Column, k: Int, w: WindowSpec): Column =
    round(ma - lag(ma, k).over(w), 6)

  /** W8 — lag delta (/root/reference/static/main.js:563-565). */
  def lagDelta(value: Column, w: WindowSpec): Column =
    round(value - lag(value, 1).over(w), 6)

  /** W9 — top-K most recent rows per key
    * (/root/reference/static/main.js:1101-1103). row_number + filter:
    * a single window pass, no global sort.
    */
  def topKRecent(df: DataFrame, key: String, ord: Column, id: Column,
                 k: Int): DataFrame =
    df.withColumn("_rn", row_number().over(
        Window.partitionBy(col(key)).orderBy(ord.desc, id.desc)))
      .filter(col("_rn") <= k).drop("_rn")

  /** Gap-based sessionization: consecutive events of a key belong to one
    * session until the gap to the previous event exceeds `maxGapSec`;
    * `session` is the running count of session starts (1-based). One
    * window pass per key — the standard behavioral-analytics shape the
    * reference's polling UI approximates with its client-side refresh
    * loop, generalized to arbitrary event streams.
    */
  def sessionize(df: DataFrame, key: String, ord: Column, id: Column,
                 maxGapSec: Long): DataFrame = {
    val w = ordered(key, ord, id)
    // gap in MICROseconds: unix_seconds truncates sub-second parts,
    // which shifts a x.5-second gap across the threshold relative to
    // engines that keep fractions (caught by the sf0.1 oracle)
    val gap = unix_micros(ord) - unix_micros(lag(ord, 1).over(w))
    val isNew =
      when(gap.isNull || gap > maxGapSec * 1000000L, 1L).otherwise(0L)
    df.withColumn("session", sum(isNew).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** P1 — `analyzeICT` (/root/reference/static/main.js:336-383), the
    * reference's flagship composite: per key over the ordered series —
    * hi/lo/mid, premium/discount (last ≥ mid), directional bias from the
    * sign agreement of SMA(10)/SMA(20) slopes, and the 62–79% optimal
    * trade entry retracement zone of the hi→lo leg.
    *
    * One window stage (SMA columns) feeding one hash aggregate — two
    * shuffles total on the series key, independent of series count.
    */
  /** Rows-from-the-end rank (1 = newest) computed on the ASCENDING
    * window: `count(*) over partition − row_number + 1`. Identical to a
    * descending row_number (the order is total), but shares the ascending
    * sort already required by the frame aggregates — saves a second full
    * sort of the partition.
    */
  private def rankFromEnd(key: String, w: WindowSpec): Column =
    count(lit(1)).over(w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)) - row_number().over(w) + 1

  def analyzeICT(df: DataFrame, key: String, ord: Column, id: Column,
                 value: Column): DataFrame = {
    val w = ordered(key, ord, id)
    val withMa = df
      .withColumn("_ma10", sma(value, 10, w))
      .withColumn("_ma20", sma(value, 20, w))
      .withColumn("_rnd", rankFromEnd(key, w))

    val agg = withMa.groupBy(col(key)).agg(
      max(value).as("hi"),
      min(value).as("lo"),
      min_by(value, col("_rnd")).as("last"),
      // slope over the visible tail: ma[L-1] − ma[L-3] (main.js:350-351)
      max(when(col("_rnd") === 1, col("_ma10"))).as("_ma10_last"),
      max(when(col("_rnd") === 3, col("_ma10"))).as("_ma10_l3"),
      max(when(col("_rnd") === 1, col("_ma20"))).as("_ma20_last"),
      max(when(col("_rnd") === 3, col("_ma20"))).as("_ma20_l3"))

    agg
      .withColumn("mid", (col("hi") + col("lo")) / 2.0)
      .withColumn("premium", col("last") >= col("mid"))
      .withColumn("_s10", col("_ma10_last") - col("_ma10_l3"))
      .withColumn("_s20", col("_ma20_last") - col("_ma20_l3"))
      .withColumn("bias",
        when(col("_s10") > 0 && col("_s20") > 0, lit("bullish"))
          .when(col("_s10") < 0 && col("_s20") < 0, lit("bearish"))
          .otherwise(lit("neutral")))
      // OTE zone: 62%–79% retracement of the hi→lo impulse
      // (main.js:370-374): r(k) = legEnd − k·(legEnd − legStart)
      .withColumn("ote_62", round(col("lo") + (col("hi") - col("lo")) * 0.62, 6))
      .withColumn("ote_79", round(col("lo") + (col("hi") - col("lo")) * 0.79, 6))
      .select(key, "hi", "lo", "mid", "last", "premium", "bias",
        "ote_62", "ote_79")
  }

  /** P2 — `buildAltStrategies` (/root/reference/static/main.js:236-321):
    * per key over the ordered series, emit structured strategy rows
    * (strategy, direction, entry, stop, target):
    *  - trend pullback when MA20/MA50 slopes agree (entry at MA20,
    *    stop 2·ATR beyond, target 3·ATR from last)
    *  - range breakout from the 20-period hi/lo ± 0.5·ATR buffer,
    *    stop 1·ATR beyond the far side, scale at +2R
    *  - volatility contraction when rollingStd(14) is within 5% of its
    *    own 14-period minimum (±1.5·ATR triggers, 1·ATR stops)
    *  - momentum continuation when both slopes are non-zero
    * `atr` is the per-key volatility guess (X10). One window stage + one
    * hash aggregate + an in-row explode — two shuffles on the key total.
    */
  def altStrategies(df: DataFrame, key: String, ord: Column, id: Column,
                    value: Column, atr: Column): DataFrame = {
    val w = ordered(key, ord, id)
    val staged = df
      .withColumn("_ma20", sma(value, 20, w))
      .withColumn("_ma50", sma(value, 50, w))
      .withColumn("_sd14", rollingStd(value, 14, w))
      .withColumn("_hi20", max(value).over(w.rowsBetween(-19, 0)))
      .withColumn("_lo20", min(value).over(w.rowsBetween(-19, 0)))
      .withColumn("_minsd14", min(col("_sd14")).over(w.rowsBetween(-13, 0)))
      .withColumn("_rnd", rankFromEnd(key, w))

    val agg = staged.groupBy(col(key)).agg(
      min_by(value, col("_rnd")).as("_last"),
      max(when(col("_rnd") === 1, col("_ma20"))).as("_ma20_last"),
      max(when(col("_rnd") === 3, col("_ma20"))).as("_ma20_l3"),
      max(when(col("_rnd") === 1, col("_ma50"))).as("_ma50_last"),
      max(when(col("_rnd") === 6, col("_ma50"))).as("_ma50_l6"),
      max(when(col("_rnd") === 1, col("_hi20"))).as("_hi20"),
      max(when(col("_rnd") === 1, col("_lo20"))).as("_lo20"),
      max(when(col("_rnd") === 1, col("_sd14"))).as("_sd14_last"),
      max(when(col("_rnd") === 1, col("_minsd14"))).as("_minsd14"))

    val s20 = col("_ma20_last") - col("_ma20_l3")
    val s50 = col("_ma50_last") - col("_ma50_l6")
    val trendUp = s20 > 0 && s50 >= 0
    val trendDown = s20 < 0 && s50 <= 0
    val lowVol = col("_sd14_last") <= col("_minsd14") * 1.05
    val last = col("_last")
    val ma20e = coalesce(col("_ma20_last"), last) // reference `|| last`
    val hi20 = col("_hi20")
    val lo20 = col("_lo20")
    val a = atr

    def strat(cond: Column, name: String, dir: String, entry: Column,
              stop: Column, target: Column) =
      when(cond, struct(lit(name).as("strategy"), lit(dir).as("direction"),
        round(entry, 6).as("entry"), round(stop, 6).as("stop"),
        round(target, 6).as("target")))

    val longTrig = hi20 + a * 0.5
    val shortTrig = lo20 - a * 0.5
    val stopLong = lo20 - a
    val stopShort = hi20 + a
    val strategies = array(
      strat(trendUp, "trend_pullback", "Long",
        ma20e, ma20e - a * 2, last + a * 3),
      strat(trendDown, "trend_pullback", "Short",
        ma20e, ma20e + a * 2, last - a * 3),
      strat(lit(true), "range_breakout", "Long",
        longTrig, stopLong, longTrig + (longTrig - stopLong) * 2),
      strat(lit(true), "range_breakout", "Short",
        shortTrig, stopShort, shortTrig - (stopShort - shortTrig) * 2),
      strat(lowVol, "vol_contraction", "Long",
        last + a * 1.5, last - a, lit(null).cast("double")),
      strat(lowVol, "vol_contraction", "Short",
        last - a * 1.5, last + a, lit(null).cast("double")),
      strat(abs(s20) > 0 && abs(s50) > 0 && s20 > 0,
        "momentum", "Long", last - a, last - a * 3, last + a * 3),
      strat(abs(s20) > 0 && abs(s50) > 0 && s20 < 0,
        "momentum", "Short", last + a, last + a * 3, last - a * 3))

    agg.select(col(key), explode(filter(strategies, s => s.isNotNull))
        .as("_s"))
      .select(col(key), col("_s.strategy").as("strategy"),
        col("_s.direction").as("direction"), col("_s.entry").as("entry"),
        col("_s.stop").as("stop"), col("_s.target").as("target"))
  }

  /** Per-key ordinary-least-squares trend: slope and intercept of
    * `value` against TIME (seconds since `anchor`) — the quantitative
    * upgrade of W7's two-point MA slope, and the per-series linear
    * drift estimate a screening pipeline ranks by.
    *
    * Closed form from exact integer power sums:
    * `slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)`,
    * `intercept = (Σy − slope·Σx) / n`. x quantizes to anchor-rebased
    * MINUTE ticks and y to CENTS so every power sum stays below 2^53,
    * where int→double conversion is exact in every engine — the sums
    * themselves accumulate as DECIMAL(38,0) (exact,
    * order-independent), and past the conversion the combining
    * arithmetic is fixed-order IEEE double math, identical anywhere.
    * (Seconds × micro-units pushes Σxy to ~1e18, where e.g. DuckDB's
    * hugeint→double composes two roundings and can land one ulp off
    * Java's correctly-rounded decimal conversion.) Budget: per key
    * `n · (minutes · cents)² ≲ 9e15` — a month of minutes × 4-digit
    * prices holds to ~1e6 rows per key; beyond that coarsen the tick.
    * One hash aggregate on the key; no window, no sort.
    */
  /** Maximum drawdown per series — the risk metric every equity-curve
    * review reports: the worst peak-to-trough loss fraction
    * `max((running_peak − value) / running_peak)` over the ordered
    * series. The running peak is an integer micro-unit window max
    * (exact); the per-row ratio is one double division of two exact
    * integers (identical in any engine); the final per-key max of
    * deterministic doubles is order-independent. Guarded to non-positive
    * peaks (null — drawdown of a non-positive equity curve is
    * undefined). Window partitions by the series key: per-key state
    * stays partition-local, nothing global sorts.
    *
    * Output: `key, max_drawdown` (fraction), `peak` (series high,
    * value units).
    */
  def maxDrawdown(df: DataFrame, key: String, ord: Column, id: Column,
                  value: Column): DataFrame = {
    val w = ordered(key, ord, id)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_vc", Aggregates.cents(value))
      .withColumn("_peak", max(col("_vc")).over(w))
      .withColumn("_dd", when(col("_peak") > 0,
        (col("_peak") - col("_vc")).cast("double") /
          col("_peak").cast("double")))
      .groupBy(col(key))
      .agg(max(col("_dd")).as("max_drawdown"),
        Aggregates.fromCents(max(col("_peak"))).as("peak"))
  }

  def olsTrend(df: DataFrame, key: String, ts: Column, value: Column,
               anchor: String): DataFrame = {
    val dec = "decimal(19,0)"
    val x = floor((unix_seconds(ts) -
      unix_seconds(to_timestamp(lit(anchor)))) / 60.0).cast(dec)
    val y = round(value * 100).cast("long").cast(dec)
    df.groupBy(col(key))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"))
      .withColumn("slope_per_day",
        (col("n").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
        (col("n").cast("double") * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double"))
        * lit(1440.0) / lit(100.0))
      .withColumn("intercept",
        (col("sy").cast("double") / lit(100.0) -
          col("slope_per_day") / lit(1440.0) *
            col("sx").cast("double")) / col("n").cast("double"))
      .select(col(key), col("n"), col("slope_per_day"),
        col("intercept"))
  }

  // ------------------------------------------------ chart indicators
  // The reference charts raw price polylines plus client-computed
  // SMA/stddev/extrema (static/main.js:217-335). The indicators below
  // complete the standard charting set every market UI layers on the
  // same series — each one a composition of the window primitives
  // above, so per-key state stays partition-local and nothing global
  // sorts. Rounding discipline matches the rest of the file: rolling
  // means accumulate integer micro-units, derived ratios are one
  // fixed-order IEEE double expression over already-rounded inputs.

  /** Resample a tick series into fixed-interval OHLC bars — the
    * aggregation every charting backend runs before drawing candles,
    * and the first stage of bar-level indicators ([[atr]]). One hash
    * aggregate on (key, epoch-aligned bucket): open/close are
    * arg-min/arg-max over the total (ts, id) order via struct min/max
    * (deterministic under duplicate timestamps), high/low plain
    * min/max. `window()` is Spark's native epoch-aligned bucketing —
    * at cluster scale the aggregate hash-partitions on (key, bar) and
    * needs no sort at all.
    *
    * Output: `key, bar (bucket start), open, high, low, close, n`.
    */
  def ohlcBars(df: DataFrame, key: String, ts: Column, id: Column,
               value: Column, barDuration: String): DataFrame = {
    val ord = struct(ts.as("t"), id.as("i"), value.as("v"))
    df.groupBy(col(key), window(ts, barDuration).getField("start").as("bar"))
      .agg(
        min(ord).getField("v").as("open"),
        max(value).as("high"),
        min(value).as("low"),
        max(ord).getField("v").as("close"),
        count(lit(1)).as("n"))
  }

  /** Bollinger bands (Bollinger 1980s, public formula): mid = SMA(n),
    * band_up/band_dn = mid ± k·rolling sample stddev, and pct_b — where
    * the price sits inside the band. Composes [[sma]] and
    * [[rollingStd]] (both already rounded to 6), so the band edges and
    * ratio are fixed-order double math over deterministic inputs.
    *
    * Shaped as a DataFrame transform, NOT a Column factory: `mid` and
    * the stddev must be materialized as attributes BEFORE the band
    * arithmetic references them, because window expressions are
    * extracted per textual occurrence — inlining `mid` into
    * band_up/band_dn/pct_b plans 38 running window aggregates where
    * this form plans 6 (measured 2.8 s → sub-1 s at sf0.1). The
    * post-window projections collapse into cheap scalar CASE
    * arithmetic over the window attributes.
    *
    * Adds `mid, band_up, band_dn, pct_b`; all null through the n−1
    * warm-up, pct_b additionally null on a zero-width band.
    */
  def bollinger(df: DataFrame, value: Column, n: Int, k: Double,
                w: WindowSpec): DataFrame =
    df.withColumn("mid", sma(value, n, w))
      .withColumn("_sd", rollingStd(value, n, w))
      .withColumn("band_up", round(col("mid") + lit(k) * col("_sd"), 6))
      .withColumn("band_dn", round(col("mid") - lit(k) * col("_sd"), 6))
      .withColumn("pct_b", when(col("band_up") > col("band_dn"),
        round((value - col("band_dn")) /
          (col("band_up") - col("band_dn")), 6)))
      .drop("_sd")

  /** RSI, Cutler's variant (simple moving average of gains/losses —
    * the non-recursive RSI every SQL engine can mirror; Wilder's
    * exponential smoothing is [[emaTruncSql]] territory). Deltas
    * quantize to integer micro-units, the n-delta gain/loss sums stay
    * integer (order-independent, spill-safe), and the final
    * `100·gain/(gain+loss)` is one double division of two exact
    * integers. Null until n deltas exist and when the window moved
    * nowhere (gain+loss = 0).
    */
  def rsiCutler(df: DataFrame, value: Column, n: Int,
                w: WindowSpec): DataFrame = {
    // staged: delta once (one lag frame), then gain/loss/count once
    // each — the inlined form would run 8 frames for 4 distinct
    // (PlanAuditSpec bounds the surplus corpus-wide)
    val tw = trailing(w, n)
    df.withColumn("_delta", Aggregates.cents(value - lag(value, 1).over(w)))
      .withColumn("_nd", count(col("_delta")).over(tw))
      .withColumn("_gain",
        sum(when(col("_delta") > 0, col("_delta")).otherwise(0L)).over(tw))
      .withColumn("_loss",
        sum(when(col("_delta") < 0, -col("_delta")).otherwise(0L)).over(tw))
      .withColumn("rsi",
        when(col("_nd") >= n && (col("_gain") + col("_loss")) > 0,
          round(col("_gain").cast("double") * 100.0 /
            (col("_gain") + col("_loss")).cast("double"), 6)))
      .drop("_delta", "_nd", "_gain", "_loss")
  }

  /** Stochastic oscillator %K (raw) and %D (its SMA smoothing):
    * `%K = 100·(px − min_n)/(max_n − min_n)` — where price sits in
    * the trailing n-row range — and `%D = SMA(dn)` of the rounded %K
    * via the integer micro-unit [[sma]]. %K null through warm-up and
    * on a flat range; %D null until dn non-null %K values exist.
    * Both are frame aggregates over the SAME ordered window, so the
    * whole indicator is one sort-free-after-shuffle window stage plus
    * a second pass over the derived %K column (same ordering —
    * Catalyst reuses the sort).
    */
  def stochasticK(df: DataFrame, value: Column, n: Int,
                  w: WindowSpec): DataFrame = {
    // staged lo/hi/count (3 frames, not the 6 the inlined form plans)
    val tw = trailing(w, n)
    df.withColumn("_lo", min(value).over(tw))
      .withColumn("_hi", max(value).over(tw))
      .withColumn("_nk", count(value).over(tw))
      .withColumn("k_pct",
        when(col("_nk") >= n && col("_hi") > col("_lo"),
          round((value - col("_lo")) * 100.0 /
            (col("_hi") - col("_lo")), 6)))
      .drop("_lo", "_hi", "_nk")
  }

  /** The truncated-EMA kernel: K = 2·span weights (1−α)^j with
    * α = 2/(span+1), plus their sum for renormalization. THE single
    * source of truth — [[emaTrunc]], [[macd]], and the SQL oracle
    * builder (SparkEntry.emaSql) must all consume this so the
    * engine/oracle bit-lockstep cannot drift.
    */
  def emaWeights(span: Int): (IndexedSeq[Double], Double) = {
    val alpha = 2.0 / (span + 1)
    val ws = (0 until span * 2).map(j => math.pow(1.0 - alpha, j))
    (ws, ws.sum)
  }

  /** Truncated exponential moving average: the standard span-s EMA
    * (α = 2/(s+1)) with the recursion unrolled to its first K = 2s
    * lag terms and renormalized — a pure window expression (K
    * in-frame lags, one fixed-order weighted sum), where the true
    * recursive EMA would need a sequential scan no SQL engine
    * parallelizes (streaming state CAN run the true recursion — see
    * [[graft.streaming.IndicatorStream]]). K = 2s keeps ≥ 98% of the
    * weight mass; because the truncated weights are renormalized,
    * truncation changes the effective kernel, not the scale. Null
    * until all K lags exist. Weights come from [[emaWeights]] and are
    * embedded as literals so the oracle can embed the SAME doubles.
    */
  def emaTrunc(value: Column, span: Int, w: WindowSpec): Column = {
    val (weights, den) = emaWeights(span)
    val k = weights.size
    val num = weights.zipWithIndex.map { case (wt, j) =>
      lit(wt) * lag(value, j).over(w)
    }.reduceLeft(_ + _)
    when(count(value).over(trailing(w, k)) === k,
      round(num / lit(den), 6))
  }

  /** MACD from truncated EMAs: `macd = EMA(fast) − EMA(slow)` over
    * the price. Shaped as a DataFrame transform so the lag columns are
    * staged ONCE and shared — the fast EMA's 2·fast lags are a prefix
    * of the slow EMA's 2·slow, and window expressions extract per
    * textual occurrence, so the inlined form would run
    * 2·fast + 2·slow + 2 offset frames where this one runs
    * 2·slow + 2. The weighted sums then collapse into scalar
    * projections over the staged attributes — identical arithmetic,
    * identical results. Adds a rounded `macd` column (null until the
    * slow EMA warms).
    */
  def macd(df: DataFrame, value: Column, fast: Int, slow: Int,
           w: WindowSpec): DataFrame = {
    val kFast = fast * 2
    val kSlow = slow * 2
    val lagCols = (0 until kSlow).map(j => lag(value, j).over(w).as(s"_l$j"))
    val guards = Seq(
      count(value).over(trailing(w, kFast)).as("_cf"),
      count(value).over(trailing(w, kSlow)).as("_cs"))
    val staged = df.select(col("*") +: (lagCols ++ guards): _*)
    def emaFrom(span: Int, k: Int, guard: Column): Column = {
      val (ws, den) = emaWeights(span)
      val num = ws.zipWithIndex.map { case (wt, j) =>
        lit(wt) * col(s"_l$j")
      }.reduceLeft(_ + _)
      when(guard === k, round(num / lit(den), 6))
    }
    staged
      .withColumn("macd", round(emaFrom(fast, kFast, col("_cf")) -
        emaFrom(slow, kSlow, col("_cs")), 6))
      .drop(((0 until kSlow).map(j => s"_l$j") ++ Seq("_cf", "_cs")): _*)
  }

  /** Align a per-key tick series onto a regular time grid with
    * forward-fill — the resample/align primitive feature pipelines
    * run before cross-series math (correlation, spreads) so every
    * series shares one clock. Grid points span floor(min ts) to
    * max ts per key at `stepSec`; each grid point carries the LAST
    * observation at-or-before it (ties on ts resolved toward the
    * observation, multiple same-ts observations toward the highest
    * id). Implementation is a union + one `last_value(ignoreNulls)`
    * window pass — the classic sort-merge fill that needs no join at
    * all, and at cluster scale partitions by key exactly like every
    * other series operator here. Leading grid points before the first
    * observation stay null.
    */
  def resampleFfill(df: DataFrame, key: String, ts: Column, id: Column,
                    value: Column, stepSec: Long): DataFrame = {
    val step = expr(s"INTERVAL $stepSec SECONDS")
    val grid = df.groupBy(col(key))
      .agg(min(timestamp_seconds(floor(unix_micros(ts) /
          (stepSec * 1000000L)) * stepSec)).as("_t0"),
        max(ts).as("_t1"))
      .select(col(key), explode(sequence(col("_t0"), col("_t1"), step))
        .as("_ts"))
      .select(col(key), col("_ts"), lit(1).as("_is_grid"),
        lit(0L).as("_id"), lit(null).cast("double").as("_v"))
    val obs = df.select(col(key), ts.as("_ts"), lit(0).as("_is_grid"),
      id.as("_id"), value.as("_v"))
    val w = Window.partitionBy(col(key))
      .orderBy(col("_ts").asc, col("_is_grid").asc, col("_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    obs.unionByName(grid)
      .withColumn("_fill", last(col("_v"), ignoreNulls = true).over(w))
      .filter(col("_is_grid") === 1)
      .select(col(key), col("_ts").as("grid_ts"), col("_fill").as("value"))
  }

  /** Keltner channels over OHLC bars: mid = truncated EMA(emaSpan) of
    * the close, bands = mid ± k·ATR(atrSpan) — the volatility envelope
    * that pairs the [[emaTrunc]] kernel with [[atr]]'s true range.
    * Both components are staged columns (no duplicate window frames);
    * the band arithmetic is fixed-order double math over the two
    * already-rounded inputs. Null until BOTH components warm
    * (2·emaSpan bars for the EMA, atrSpan for the ATR).
    */
  def keltner(bars: DataFrame, key: String, emaSpan: Int, atrSpan: Int,
              k: Double): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col("bar").asc)
    atr(bars, key, atrSpan)
      .withColumn("kc_mid", emaTrunc(col("close"), emaSpan, w))
      .withColumn("kc_up", round(col("kc_mid") + lit(k) * col("atr"), 6))
      .withColumn("kc_dn", round(col("kc_mid") - lit(k) * col("atr"), 6))
  }

  /** Ichimoku Kinkō Hyō over OHLC bars (Hosoda's public system):
    * tenkan = 9-bar midrange, kijun = 26-bar midrange,
    * senkou A = (tenkan+kijun)/2 displaced 26 bars FORWARD (the value
    * at bar t is the average computed at t−26 — a lag over the staged
    * columns), senkou B = 52-bar midrange displaced likewise, chikou =
    * close displaced 26 bars BACK (a lead). Two window passes over one
    * (key, bar) ordering: pass 1 stages the six min/max frames + the
    * count guards, pass 2 displaces the derived lines. Midranges are
    * `(max+min)/2` over raw doubles — one deterministic IEEE op —
    * rounded to 6 on output.
    */
  def ichimoku(bars: DataFrame, key: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col("bar").asc)
    def tw(n: Int) = w.rowsBetween(-(n - 1), 0)
    def mid(n: Int): Column =
      when(count(col("close")).over(tw(n)) >= n,
        (max(col("high")).over(tw(n)) + min(col("low")).over(tw(n))) / 2.0)
    val staged = bars
      .withColumn("_t", mid(9))
      .withColumn("_k", mid(26))
      .withColumn("_b52", mid(52))
    staged
      .withColumn("tenkan", round(col("_t"), 6))
      .withColumn("kijun", round(col("_k"), 6))
      .withColumn("senkou_a",
        round(lag((col("_t") + col("_k")) / 2.0, 26).over(w), 6))
      .withColumn("senkou_b", round(lag(col("_b52"), 26).over(w), 6))
      .withColumn("chikou", round(lead(col("close"), 26).over(w), 6))
      .drop("_t", "_k", "_b52")
  }

  /** Average True Range over OHLC bars (Wilder 1978, Cutler-style
    * simple-average smoothing to stay SQL-mirrorable): per bar,
    * `TR = max(high−low, |high−prevClose|, |low−prevClose|)` (first
    * bar: high−low), then ATR = integer micro-unit SMA(n) of TR.
    * Runs on [[ohlcBars]] output — bar count is corpus-size /
    * bar-width, so the window input is already the reduced relation.
    */
  def atr(bars: DataFrame, key: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col("bar").asc)
    val prevClose = lag(col("close"), 1).over(w)
    val tw = w.rowsBetween(-(n - 1), 0)
    // ONE lag frame (staged _pc); the TR arithmetic over it is scalar,
    // so referencing it twice (tr output + integer quantization) costs
    // nothing — only duplicated WINDOW frames multiply work
    def trOver(pc: Column): Column =
      when(pc.isNull, col("high") - col("low"))
        .otherwise(greatest(col("high") - col("low"),
          abs(col("high") - pc), abs(col("low") - pc)))
    bars
      .withColumn("_pc", prevClose)
      .withColumn("_trc", Aggregates.cents(trOver(col("_pc"))))
      .withColumn("_cnt", count(col("_trc")).over(tw))
      .withColumn("_sum", sum(col("_trc")).over(tw))
      .withColumn("tr", round(trOver(col("_pc")), 6))
      .withColumn("atr", when(col("_cnt") >= n,
        round(col("_sum") / (lit(1000000.0) * col("_cnt")), 6)))
      .drop("_pc", "_trc", "_cnt", "_sum")
  }

  /** Williams %R over OHLC bars (Larry Williams' public oscillator):
    * `%R = −100·(hi_n − close)/(hi_n − lo_n)` with hi_n/lo_n the
    * trailing n-bar extremes of the high/low columns — where the close
    * sits in the recent TRUE range (the bar-range sibling of
    * [[stochasticK]], which only sees closes). Three staged frames
    * (hi, lo, count) over one (key, bar) ordering; null through the
    * n−1 warm-up and on a flat range. Runs on [[ohlcBars]] output, so
    * the window input is already the reduced bar relation.
    */
  def williamsR(bars: DataFrame, key: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col("bar").asc)
    val tw = w.rowsBetween(-(n - 1), 0)
    bars
      .withColumn("_hi", max(col("high")).over(tw))
      .withColumn("_lo", min(col("low")).over(tw))
      .withColumn("_nb", count(col("close")).over(tw))
      .withColumn("wr",
        when(col("_nb") >= n && col("_hi") > col("_lo"),
          round((col("_hi") - col("close")) * -100.0 /
            (col("_hi") - col("_lo")), 6)))
      .drop("_hi", "_lo", "_nb")
  }

  /** Donchian channel over OHLC bars (Richard Donchian's public
    * breakout envelope): upper/lower = trailing n-bar extreme of the
    * high/low columns, mid = their average — the third channel beside
    * [[keltner]] (EMA±ATR) and [[bollinger]] (SMA±σ), and the only
    * one defined by range extremes alone. The same three staged
    * frames as [[williamsR]]; `(up+dn)/2` is one deterministic IEEE
    * op over raw doubles, rounded on output; null through the n−1
    * warm-up.
    */
  def donchian(bars: DataFrame, key: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col("bar").asc)
    val tw = w.rowsBetween(-(n - 1), 0)
    bars
      .withColumn("_hi", max(col("high")).over(tw))
      .withColumn("_lo", min(col("low")).over(tw))
      .withColumn("_nb", count(col("close")).over(tw))
      .withColumn("dc_up", when(col("_nb") >= n, round(col("_hi"), 6)))
      .withColumn("dc_dn", when(col("_nb") >= n, round(col("_lo"), 6)))
      .withColumn("dc_mid", when(col("_nb") >= n,
        round((col("_hi") + col("_lo")) / 2.0, 6)))
      .drop("_hi", "_lo", "_nb")
  }

  /** On-balance volume over OHLC bars (Granville's public cumulative
    * flow line): `obv_t = Σ_{i≤t} sign(close_i − close_{i−1})·vol_i`
    * with the first bar contributing 0 (no prior close to vote on).
    * The close delta is micro-quantized BEFORE the sign so a
    * sub-micro float wiggle can't flip a vote differently across
    * engines, and the running sum is pure integer (`n`, the bar's
    * tick count, stands in for volume) — exact, order-independent,
    * spill-safe. One lag frame + one running-sum frame over the same
    * (key, bar) ordering.
    */
  def obv(bars: DataFrame, key: String, volume: Column): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col("bar").asc)
    bars
      .withColumn("_dc",
        Aggregates.cents(col("close") - lag(col("close"), 1).over(w)))
      .withColumn("_vote",
        when(col("_dc").isNull || col("_dc") === 0L, lit(0L))
          .otherwise(when(col("_dc") > 0, volume).otherwise(-volume)))
      .withColumn("obv",
        sum(col("_vote")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("_dc", "_vote")
  }

  /** Aroon oscillator over OHLC bars (Tushar Chande's public trend-age
    * indicator): `aroon_up = 100·(n − bars_since_high_n)/n`, mirrored
    * for lows — how recently the trailing n-bar extreme printed, on a
    * 0..100 scale. Bars-since counts from the LATEST occurrence of
    * the extreme, found by a single in-frame arg-extremum:
    * `max(struct(high, rn))` over the trailing frame compares (value,
    * position) lexicographically, so the winning struct carries the
    * frame max AND the most recent tying position in one pass. (A
    * staged `high === trailing_max` scan would compare each in-frame
    * row against ITS OWN trailing max, not the current frame's — any
    * in-frame extreme shadowed by a larger value just outside the
    * frame would fail the predicate and null the oscillator; the
    * struct form has no such cross-frame reference.) The low side
    * negates rn inside a `min(struct(low, -rn))` so the minimum
    * struct still carries the LATEST tying position. Null through
    * the n-bar warm-up; the ratio is exact: `100·k/n` with k, n
    * small integers, identical IEEE division in both engines.
    */
  def aroon(bars: DataFrame, key: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col("bar").asc)
    val tw = w.rowsBetween(-n, 0) // n+1 bars: current + n lookback
    bars
      .withColumn("_rn", row_number().over(w))
      .withColumn("_hpos",
        max(struct(col("high"), col("_rn").as("rn"))).over(tw)
          .getField("rn"))
      .withColumn("_lpos",
        -min(struct(col("low"), (-col("_rn")).as("nrn"))).over(tw)
          .getField("nrn"))
      .withColumn("_nb", count(col("close")).over(tw))
      .withColumn("aroon_up", when(col("_nb") >= n + 1,
        round((lit(n) - (col("_rn") - col("_hpos"))) * 100.0 / n, 6)))
      .withColumn("aroon_dn", when(col("_nb") >= n + 1,
        round((lit(n) - (col("_rn") - col("_lpos"))) * 100.0 / n, 6)))
      .drop("_rn", "_hpos", "_lpos", "_nb")
  }
}
