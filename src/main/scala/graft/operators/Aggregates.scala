package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation operators — SURVEY.md §2.4 (A1–A8) and the J1 latest-price
  * join. Everything is a hash aggregate with map-side partials (Spark
  * supplies partial+final automatically), and the J1 dimension side is
  * broadcast so the positions pipeline is a single shuffle on the group
  * key regardless of fact-table size.
  */
object Aggregates {

  /** Exact micro-unit column: `round(x*1e6)::long`. Money sums accumulate
    * in integer micro-units so results are order-independent and
    * bit-identical across engines — the double-summation nondeterminism
    * that plagues distributed fp aggregation simply disappears — while
    * staying faithful to 4-decimal products like qty(2dp)·price(2dp)
    * (cents would lose up to half a cent per row). Divide by 1e6 at the
    * end. Long capacity bounds the total at ~9.2e12 money units; beyond
    * that (full 100 TB totals) switch the accumulator to
    * `DecimalType(38, 6)` — same shape, wider lanes.
    */
  def cents(c: Column): Column = round(c * 1000000).cast("long")
  def fromCents(c: Column): Column = c / 1000000.0

  /** A1 — `compute_positions` conditional aggregation
    * (/root/reference/app/db.py:399-425): BUY adds qty/cost/fees/buys,
    * SELL subtracts qty and adds fees, DIV/CASH/FX ignored; finalize
    * avg_cost = cost/buys (0 when no buys).
    * One hash-agg over the group key; the BUY/SELL branching lives inside
    * the aggregate expressions so there is exactly one pass and one
    * shuffle.
    */
  def positions(txns: DataFrame, groupKey: String = "symbol",
                typeCol: String = "type"): DataFrame = {
    val t = col(typeCol)
    txns.groupBy(col(groupKey)).agg(
      fromCents(sum(when(t === "BUY", cents(col("qty")))
        .when(t === "SELL", -cents(col("qty")))
        .otherwise(lit(0L)))).as("qty"),
      fromCents(sum(when(t === "BUY", cents(col("qty") * col("price")))
        .otherwise(lit(0L)))).as("cost"),
      fromCents(sum(when(t.isin("BUY", "SELL"), cents(col("fees")))
        .otherwise(lit(0L)))).as("fees"),
      fromCents(sum(when(t === "BUY", cents(col("qty")))
        .otherwise(lit(0L)))).as("buys"))
      .withColumn("avg_cost",
        when(col("buys") === 0.0, lit(0.0))
          .otherwise(round(col("cost") / col("buys"), 6)))
      .drop("buys")
  }

  /** A2 — latest value per key, ties broken by id
    * (/root/reference/app/db.py:391-396): arg-max over (ord, id) in one
    * hash aggregate (no window, no second shuffle).
    */
  def latestPerKey(df: DataFrame, key: String, ord: Column, id: Column,
                   value: Column): DataFrame =
    df.groupBy(col(key)).agg(
      max_by(value, struct(ord, id)).as("latest"),
      max(ord).as("latest_at"))

  /** J1/P5 — positions × latest price, left outer, null-safe market value
    * (/root/reference/app/db.py:419-424). The reference runs an N+1
    * correlated lookup; here the lookup side is decorrelated into one
    * arg-max aggregate and broadcast (per-key cardinality is tiny
    * relative to the fact table).
    */
  def positionsWithMarketValue(txns: DataFrame, prices: DataFrame,
                               key: String = "symbol"): DataFrame = {
    val latest = latestPerKey(prices, key, col("as_of"), col("id"),
      col("price")).withColumnRenamed("latest", "last")
      .drop("latest_at")
    positions(txns, key)
      .join(broadcast(latest), Seq(key), "left")
      .withColumn("market_value",
        when(col("last").isNotNull, round(col("last") * col("qty"), 6)))
  }

  /** A3/A4 — journal overview statistics
    * (/root/reference/static/main.js:938-947, 1123-1129): n, wins,
    * winrate (whole percent, Math.round), total PnL, mean R.
    */
  def overviewStats(journal: DataFrame, pnl: Column, r: Column,
                    groupKey: Seq[Column] = Nil): DataFrame = {
    val g = if (groupKey.isEmpty) journal.groupBy()
            else journal.groupBy(groupKey: _*)
    g.agg(
      count(lit(1)).as("n"),
      count(when(pnl > 0, 1)).as("wins"),
      fromCents(sum(cents(pnl))).as("total_pnl"),
      round(avg(r), 6).as("avg_r"))
      .withColumn("winrate",
        when(col("n") === 0, lit(0.0))
          .otherwise(round(col("wins") * 100.0 / col("n"))))
  }

  /** A5 — fixed 10-bin equal-width histogram
    * (/root/reference/static/main.js:1002-1017):
    * idx = clamp(floor((v−min)/step), 0, 9), step = (max−min)/10
    * (1 when max == min). Two passes: a global min/max aggregate
    * broadcast back into the binning scan — same shape the reference
    * uses, but each pass is fully parallel.
    */
  def histogram10(df: DataFrame, v: Column): DataFrame = {
    val bounds = df.agg(min(v).as("mn"), max(v).as("mx"))
    val binned = df.crossJoin(broadcast(bounds))
      .withColumn("step",
        when(col("mx") === col("mn"), lit(1.0))
          .otherwise((col("mx") - col("mn")) / 10.0))
      .withColumn("bin",
        least(lit(9L), greatest(lit(0L),
          floor((v - col("mn")) / col("step")))).cast("int"))
    binned.groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
  }

  /** Mergeable approximate percentiles from a fixed-bin histogram —
    * the scale substitute for exact percentiles (a10), whose global
    * sort is the thing that does NOT survive 100 TB. Two fully
    * parallel aggregation passes (global min/max/count, then bin
    * counts — both map-side combinable and mergeable across
    * partitions/files/days), a ≤`bins`-row driver collect, and linear
    * interpolation inside the target bin:
    * `est = lo + (bin + (p·n − cdf_before)/cnt_bin) · (hi − lo)/bins`.
    * Binning mirrors [[histogram10]] (clamp, degenerate max==min →
    * bin 0). Error is bounded by one bin width; the result is exact
    * integer-count arithmetic plus a fixed-order float expression, so
    * it is bit-reproducible across partitionings and engines.
    */
  def approxPercentilesHist(df: DataFrame, v: Column, ps: Seq[Double],
                            bins: Int = 1000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val b = df.agg(min(v).cast("double").as("mn"),
      max(v).cast("double").as("mx"), count(v).as("n")).collect()(0)
    // empty (or all-null-value) input: the oracle formulation yields
    // zero rows — return the same, not an NPE on the null min
    if (b.isNullAt(0)) return Seq.empty[(Double, Double)].toDF("p", "est")
    val (mn, mx, n) = (b.getDouble(0), b.getDouble(1), b.getLong(2))
    val step = if (mx == mn) 1.0 else (mx - mn) / bins
    val counts = df.where(v.isNotNull).select(
        least(lit(bins - 1L), greatest(lit(0L),
          floor((v.cast("double") - mn) / step))).cast("int").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    percentilesFromHist(counts, n, mn, mx, bins, ps).toDF("p", "est")
  }

  /** Per-GROUP histogram percentiles, fully declarative — where the
    * global sketch above collects its ≤bins-row histogram to the
    * driver, a grouped variant cannot (10⁸ groups × bins rows is not a
    * driver structure), so every step here stays a distributed plan:
    * per-group bounds are one aggregate joined back on the group key
    * (shuffle join; AQE broadcasts when the group count is genuinely
    * small), binning is scan-side arithmetic, the CDF is a window
    * partitioned BY GROUP (never a single task), percentile targets
    * explode from a literal array, and the interpolation runs in-row
    * using `cdf − cnt` for the cumulative-before term. Same
    * fixed-order arithmetic as the shared fold, so estimates are
    * bit-reproducible across partitionings and engines.
    *
    * Returns `(key, p, est_micro)` — one row per group × requested
    * percentile, the estimate in integer micro-units via FLOOR of the
    * double product (not a 6-decimal round: Java's BigDecimal HALF_UP
    * and C-library scaled rounding disagree on representation ties at
    * the .5 boundary, while floor of the bit-identical product is
    * engine-portable).
    */
  def groupedApproxPercentiles(df: DataFrame, key: Column, v: Column,
                               ps: Seq[Double], bins: Int = 1000)
      : DataFrame = {
    val b = df.groupBy(key.as("k"))
      .agg(min(v).cast("double").as("lo"),
        max(v).cast("double").as("hi"), count(v).as("n"))
      .withColumn("step",
        when(col("hi") === col("lo"), lit(1.0))
          .otherwise((col("hi") - col("lo")) / bins))
    val h = df.where(v.isNotNull)
      .select(key.as("k"), v.cast("double").as("v"))
      .join(b, "k")
      .select(col("k"),
        least(lit(bins - 1L), greatest(lit(0L),
          floor((col("v") - col("lo")) / col("step")))).as("bin"))
    val cum = h.groupBy("k", "bin").agg(count(lit(1)).as("cnt"))
      .withColumn("cdf", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("k")
          .orderBy("bin")))
    val picked = cum
      .join(b.select(col("k"), col("n")), "k")
      .withColumn("p", explode(array(ps.map(lit): _*)))
      .where(col("cdf") >= col("p") * col("n"))
      .groupBy("k", "p").agg(min(col("bin")).as("b"))
    picked
      .join(cum.withColumnRenamed("bin", "b"), Seq("k", "b"))
      .join(b, "k")
      .select(col("k").as("key"), col("p"),
        floor((col("lo") +
          (col("b") + (col("p") * col("n") - (col("cdf") - col("cnt")))
            / col("cnt"))
          * (col("hi") - col("lo")) / lit(bins)) * 1e6)
          .cast("long").as("est_micro"))
  }

  /** The CDF-interpolation fold shared by every consumer of a fixed-bin
    * histogram — the batch sketch above, and the streaming delta-log
    * reconstruction ([[graft.streaming.HistStream.estimate]]). Fixed
    * ascending-bin order and BigDecimal HALF_UP rounding keep the
    * estimate bit-reproducible across partitionings and engines.
    */
  private[graft] def percentilesFromHist(counts: Map[Int, Long], n: Long,
      mn: Double, mx: Double, bins: Int, ps: Seq[Double])
      : Seq[(Double, Double)] = {
    val cdf = (0 until bins)
      .scanLeft(0L)((acc, i) => acc + counts.getOrElse(i, 0L)).tail
    ps.map { p =>
      val target = p * n
      val bIx = cdf.indexWhere(_ >= target) match {
        case -1 => bins - 1
        case i  => i
      }
      val cumBefore = if (bIx == 0) 0L else cdf(bIx - 1)
      val cnt = counts.getOrElse(bIx, 0L)
      val frac = if (cnt == 0) 0.0 else (target - cumBefore) / cnt.toDouble
      val est = mn + (bIx + frac) * (mx - mn) / bins
      // Spark round() semantics (BigDecimal HALF_UP) so the driver-side
      // arithmetic hashes identically to the oracle's round(x, 6)
      (p, java.math.BigDecimal.valueOf(est)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
    }
  }

  /** Deterministic HyperLogLog distinct-count sketch (Flajolet et al.
    * 2007): registers from the salted 60-bit md5 — low `p` bits pick
    * the register (exact bit ops, no float division), the remaining
    * bits' leading-zero rank updates it via `max` (fully mergeable
    * across partitions/files/days — the point of the sketch). Estimate
    * = `α·m²/Σ2^-M_j` with the standard small-range linear-counting
    * correction, computed driver-side over the m-row collected
    * register table in FIXED ascending-register order, so the float
    * sum — and therefore the estimate — is bit-reproducible across
    * partitionings and engines. Unlike
    * `approx_count_distinct` (whose HLL++ bias tables are
    * implementation-specific), every step here is mirrorable in the
    * DuckDB oracle.
    */
  def approxCountDistinctHll(df: DataFrame, key: Column, p: Int = 8)
      : DataFrame = {
    require(p >= 4 && p <= 16, s"p out of range: $p")
    val spark = df.sparkSession
    import spark.implicits._
    val m = 1 << p
    val wBits = 60 - p
    val h = graft.functions.MarketFunctions.md5Hash60(key.cast("string"))
    // null keys are ignored, matching countDistinct and the oracle
    // (whose register join drops the null-hash group)
    val regs = df.where(key.isNotNull)
      .select(h.bitwiseAND(lit((m - 1).toLong)).cast("int")
          .as("idx"),
        shiftrightunsigned(h, p).as("w"))
      .withColumn("rho",
        when(col("w") === 0, lit(wBits + 1))
          .otherwise(lit(wBits + 1) - length(bin(col("w")))))
      .groupBy("idx").agg(max(col("rho")).as("rho"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    Seq(hllEstimate(regs, p)).toDF("est")
  }

  /** Driver-side HLL estimate from a register table: `α·m²/Σ2^-M_j`
    * with the small-range linear-counting correction, summed in FIXED
    * ascending-register order so the float fold is bit-reproducible.
    * Shared by the batch sketch above and the streaming register log
    * ([[graft.streaming.HllStream]]), which must agree bit-for-bit.
    */
  def hllEstimate(regs: Map[Int, Int], p: Int): Double = {
    val m = 1 << p
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    var z = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val mi = regs.getOrElse(i, 0)
      if (mi == 0) zeros += 1
      z += math.pow(2.0, -mi)
      i += 1
    }
    val raw = alpha * m * m / z
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    java.math.BigDecimal.valueOf(est)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** Count-Min sketch heavy-hitter estimation (Cormode & Muthukrishnan
    * 2005) — the third of the mergeable-sketch trio (percentiles:
    * [[approxPercentilesHist]], distincts: [[approxCountDistinctHll]]).
    * The sketch is a d×w counter grid updated by salted md5 hashes:
    * one grouped aggregate over the d-fold-exploded item stream (map-
    * side combinable, mergeable across partitions/files/days — d·w
    * counters summarize an unbounded stream). `estimate(x) = min over
    * rows of cell(x)` NEVER undercounts (only collisions inflate).
    * Returns the exact top-`k` items (the candidate set) with their
    * true counts, sketch estimates, and the overestimate invariant —
    * this batch form deliberately uses the exact aggregate as its
    * candidate source so the oracle can check the estimates against
    * ground truth; the candidate path that needs NO exact global
    * counts (bounded space-saving maps per item shard, unioned, then
    * grid-estimated) is [[graft.streaming.HeavyHitters]] (st4), whose
    * single-batch replay is bit-equal to this sketch's estimates.
    * Every hash is deterministic md5, so estimates are bit-identical
    * across engines and partitionings.
    */
  def countMinTopK(items: DataFrame, item: Column, k: Int,
                   d: Int = 4, w: Int = 1024): DataFrame = {
    import graft.functions.MarketFunctions.md5Hash60
    val base = items.select(item.cast("string").as("item"))
      .where(col("item").isNotNull)
    def cellOf(it: Column, i: Column): Column =
      md5Hash60(concat(lit("cms"), i.cast("string"), lit("#"), it)) % w
    // one explode+aggregate over the occurrence stream; the d-fold
    // expansion then runs over the VOCAB-sized count table (cell count
    // = Σ counts of items hashing there — algebraically identical to
    // exploding every occurrence d times, at 1/|avg count| the rows)
    val wordCounts = graft.Caches.persist(
      base.groupBy("item").agg(count(lit(1)).as("n_true")))
    val exact = wordCounts
      .orderBy(col("n_true").desc, col("item").asc).limit(k)
    val cells = wordCounts
      .select(col("item"), col("n_true"),
        explode(sequence(lit(0), lit(d - 1))).as("i"))
      .select(col("i"), cellOf(col("item"), col("i")).as("cell"),
        col("n_true"))
      .groupBy("i", "cell").agg(sum(col("n_true")).as("c"))
    val cand = exact
      .select(col("item"), col("n_true"),
        explode(sequence(lit(0), lit(d - 1))).as("i"))
      .withColumn("cell", cellOf(col("item"), col("i")))
    cand.join(cells, Seq("i", "cell"))
      .groupBy("item", "n_true").agg(min(col("c")).as("cms_est"))
      .withColumn("overestimates", col("cms_est") >= col("n_true"))
  }

  /** A6 — watchlist quote + delta (/root/reference/static/main.js:554-570):
    * per key the two most recent values; delta = last − prev.
    * One window pass; the per-key series is bounded so the window state
    * is O(1) per key.
    */
  def quoteDelta(prices: DataFrame, key: String, ord: Column,
                 id: Column, value: Column): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(ord.desc, id.desc)
    prices
      .withColumn("_rn", row_number().over(w))
      .withColumn("_prev", lead(value, 1).over(w))
      .filter(col("_rn") === 1)
      .select(col(key), value.as("price"),
        round(value - col("_prev"), 6).as("delta"))
  }

  /** A7 — window-range change (/root/reference/static/main.js:64-67):
    * over the last-N slice per key: first/last/diff/pct (guard first≠0).
    */
  def rangeChange(prices: DataFrame, key: String, ord: Column, id: Column,
                  value: Column, lastN: Int): DataFrame = {
    val recent = Window.partitionBy(col(key)).orderBy(ord.desc, id.desc)
    val sliced = prices.withColumn("_rn", row_number().over(recent))
      .filter(col("_rn") <= lastN)
    sliced.groupBy(col(key)).agg(
      min_by(value, col("_rn")).as("last"),
      max_by(value, col("_rn")).as("first"))
      .withColumn("diff", round(col("last") - col("first"), 6))
      .withColumn("pct",
        when(col("first") =!= 0.0,
          round((col("last") - col("first")) / col("first") * 100.0, 6)))
  }

  /** A8 — hi/lo/mid of a series (/root/reference/static/main.js:342-345). */
  def hiLoMid(df: DataFrame, key: String, value: Column): DataFrame =
    df.groupBy(col(key)).agg(max(value).as("hi"), min(value).as("lo"))
      .withColumn("mid", (col("hi") + col("lo")) / 2.0)

  /** Ordered conversion funnel over an event stream: a user reaches
    * stage `i` when an event of type `stages(i)` exists STRICTLY AFTER
    * the timestamp at which they reached stage `i−1` (first-touch
    * semantics — each stage binds to its earliest qualifying event, so
    * membership is uniquely determined and engine-independent). The
    * classic product-analytics question ("of everyone who signed up,
    * how many went on to view, then to buy?") that a naive per-user
    * sequence scan answers only by sorting every user's history.
    *
    * Plan shape per stage: one filtered hash aggregate (min over the
    * stage's events) joined to the previous stage's survivor set on
    * the user key. Every join and aggregate hash-partitions on
    * `user` — no global sort, no window over a user's whole history,
    * and the survivor side shrinks monotonically stage over stage. At
    * 100 TB the event scan is filtered to one stage's type BEFORE the
    * shuffle (pushdown-eligible), so each stage moves only its own
    * type's rows.
    *
    * Output: one row per stage — `stage` (1-based), `stage_name`,
    * `users` (count reaching it in order).
    */
  def eventFunnel(events: DataFrame, user: Column, ts: Column,
                  etype: Column, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "eventFunnel: at least one stage")
    val ev = events.select(user.as("u"), ts.as("t"), etype.as("e"))
    // survivors(i): (u, ts_i) — earliest instant at which u completed
    // the prefix stages(0..i)
    val first = ev.filter(col("e") === stages.head)
      .groupBy("u").agg(min(col("t")).as("ts"))
    val survivors = stages.zipWithIndex.tail.scanLeft(first) {
      case (prev, (st, _)) =>
        ev.filter(col("e") === st)
          .join(prev, "u")
          .filter(col("t") > col("ts"))
          .groupBy("u").agg(min(col("t")).as("ts"))
    }
    survivors.zip(stages).zipWithIndex.map { case ((s, name), i) =>
      s.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("stage"), lit(name).as("stage_name"),
          col("users"))
    }.reduce(_.union(_))
  }

  /** Cohort retention over an event stream: users are grouped into
    * weekly cohorts by their FIRST event of any type, and each later
    * week of activity increments their cohort's (cohort_week,
    * week_offset) cell — the retention triangle every growth dashboard
    * renders. Weeks are integer `(date − anchor) / 7` so the bucketing
    * is pure arithmetic, identical in any engine and any session
    * timezone (no locale-dependent week-of-year semantics); events
    * before the anchor are out of contract (require the anchor ≤ the
    * data's min date at call sites that can't guarantee it).
    *
    * Plan shape: distinct (user, week) projection → per-user min
    * aggregate → one join back on user → one hash aggregate on
    * (cohort, offset). Every exchange keys on `u` until the final
    * (cohort, offset) aggregate, whose cardinality is weeks² — tiny
    * no matter the corpus. Because (u, week) is distinct and cohort
    * is a function of u, the final `count(*)` IS the distinct-user
    * count, so no count-distinct shuffle is needed.
    */
  /** Pairwise Pearson correlation between keyed time series, aligned
    * on fixed time buckets — the co-movement matrix (which symbols
    * move together?) behind pairs screening and portfolio
    * diversification checks.
    *
    * Alignment: each series collapses to (bucket → Σ micro-units) —
    * an EXACT integer per cell, so the bucketed series is
    * order-independent before any float touches it. Pairs come from a
    * self-join of the AGGREGATED relation on the bucket (|keys|·|buckets|
    * rows, not corpus-sized) with `key_a < key_b` deduplicating the
    * symmetric pair; only co-observed buckets correlate (inner join).
    * The five power sums accumulate as DECIMAL(38,0) — exact — and
    * the Pearson formula
    * `(n·Σxy − Σx·Σy) / (√(n·Σxx − Σx²) · √(n·Σyy − Σy²))`
    * runs once per pair in fixed-order double arithmetic, so the
    * result is bit-identical across engines and partitionings.
    *
    * Cells quantize to CENTS (1e2), not micro-units: the bit-exactness
    * argument needs every exact integer sum to stay below 2^53, where
    * int→double conversion is exact in EVERY engine (above it, e.g.
    * DuckDB's hugeint→double composes two roundings and can land one
    * ulp off the correctly-rounded Java decimal conversion — observed
    * on micro-unit Σxy at 1e21). Budget: |Σx²| < 2^53 means per-pair
    * `n·(cell cents)² ≲ 9e15`; beyond that (very hot cells at full
    * corpus scale) drop `unitScale` a decade — correlation is
    * scale-invariant, so the result is unchanged up to quantization.
    */
  def pairCorrelation(events: DataFrame, key: Column, ts: Column,
                      value: Column, bucketSeconds: Long,
                      unitScale: Int = 100): DataFrame = {
    val dec = "decimal(19,0)"
    val bucketed = events
      .groupBy(key.as("k"),
        floor(unix_seconds(ts) / bucketSeconds.toDouble).cast("long")
          .as("bucket"))
      .agg(sum(round(value * unitScale).cast("long")).as("v"))
    val l = bucketed.select(col("k").as("key_a"), col("bucket"),
      col("v").cast(dec).as("x"))
    val r = bucketed.select(col("k").as("key_b"), col("bucket"),
      col("v").cast(dec).as("y"))
    l.join(r, Seq("bucket")).filter(col("key_a") < col("key_b"))
      .groupBy(col("key_a"), col("key_b"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("corr_xy",
        (col("n_buckets").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
        (sqrt(col("n_buckets").cast("double") *
            col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double")) *
         sqrt(col("n_buckets").cast("double") *
            col("syy").cast("double") -
          col("sy").cast("double") * col("sy").cast("double"))))
      .select(col("key_a"), col("key_b"), col("n_buckets"),
        col("corr_xy"))
  }

  /** Beta to a benchmark series — `cov(y, x) / var(x)` with `x` the
    * benchmark's bucketed cells and `y` each other key's — the
    * sensitivity coefficient portfolio risk models regress per asset.
    * Same machinery as [[pairCorrelation]]: exact integer cents cells
    * per (key, bucket), every key's cells joined to the benchmark's on
    * the bucket (the benchmark side is a filtered slice of the same
    * AGGREGATED relation — broadcastable when buckets are few, keyed
    * on the bucket otherwise), DECIMAL power sums, one fixed-order
    * double formula per key under the 2^53 conversion budget. The
    * benchmark regressed on itself yields exactly 1.0 — a built-in
    * sanity row.
    */
  def betaToBenchmark(events: DataFrame, key: Column, ts: Column,
                      value: Column, benchmarkKey: String,
                      bucketSeconds: Long,
                      unitScale: Int = 100): DataFrame = {
    val dec = "decimal(19,0)"
    val bucketed = events
      .groupBy(key.as("k"),
        floor(unix_seconds(ts) / bucketSeconds.toDouble).cast("long")
          .as("bucket"))
      .agg(sum(round(value * unitScale).cast("long")).as("v"))
    val bench = bucketed.filter(col("k") === benchmarkKey)
      .select(col("bucket"), col("v").cast(dec).as("x"))
    bucketed.select(col("k"), col("bucket"), col("v").cast(dec).as("y"))
      .join(bench, "bucket")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .withColumn("beta",
        (col("n_buckets").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
        (col("n_buckets").cast("double") * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double")))
      .select(col("k").as("key"), col("n_buckets"), col("beta"))
  }

  /** Time-series completeness audit: per key, the observed distinct
    * bucket count against the full first→last span — the missing-data
    * report a 100 TB ingestion pipeline publishes before anyone
    * trusts a downstream aggregate. Pure integer bucket arithmetic
    * (`expected = last − first + 1`), one distinct projection + one
    * aggregate — no per-bucket row generation anywhere, so the audit
    * costs O(observed cells) regardless of span length.
    */
  def seriesGapAudit(events: DataFrame, key: Column, ts: Column,
                     bucketSeconds: Long): DataFrame =
    events
      .select(key.as("key"),
        floor(unix_seconds(ts) / bucketSeconds.toDouble).cast("long")
          .as("bucket"))
      .distinct()
      .groupBy(col("key"))
      .agg(min(col("bucket")).as("first_bucket"),
        max(col("bucket")).as("last_bucket"),
        count(lit(1)).as("observed"))
      .withColumn("expected",
        col("last_bucket") - col("first_bucket") + 1)
      .withColumn("missing", col("expected") - col("observed"))
      .select(col("key"), col("first_bucket"), col("last_bucket"),
        col("expected"), col("observed"), col("missing"))

  /** Per-key (per-period) Sharpe ratio: mean/σ of consecutive-tick
    * returns in the (ts, id) order — the risk-adjusted-performance
    * number every portfolio review leads with (annualize by √periods
    * outside). Returns quantize to integer CENTS (same budget as
    * [[Series.olsTrend]]: per key `n · cents² ≲ 9e15`, i.e. ~7e5 rows
    * of 4-digit prices — coarsen the unit beyond), the power sums
    * accumulate as DECIMAL (exact, order-independent), and the
    * mean/σ/ratio is one fixed-order double expression over the exact
    * sums with an IEEE-correctly-rounded sqrt — bit-identical in any
    * engine. The lag window and the aggregate share the key
    * partitioning, so the whole operator is ONE shuffle.
    *
    * Output: `key, n_ret, mean_ret (value units), sharpe` — null
    * sharpe for constant series (σ = 0) or n < 2.
    */
  def sharpe(events: DataFrame, key: String, ts: Column, id: Column,
             value: Column): DataFrame = {
    val dec = "decimal(19,0)"
    val w = Series.ordered(key, ts, id)
    val rc = round((value - lag(value, 1).over(w)) * 100).cast("long")
    val nD = col("n_ret").cast("double")
    val s1D = col("_s1").cast("double")
    val s2D = col("_s2").cast("double")
    val varN = nD * s2D - s1D * s1D // n²·(n−1)·σ² in cents²
    events
      .withColumn("_rc", rc.cast(dec))
      .groupBy(col(key))
      .agg(count(col("_rc")).as("n_ret"),
        sum(col("_rc")).as("_s1"),
        sum(col("_rc") * col("_rc")).as("_s2"))
      .withColumn("mean_ret", round(s1D / nD / 100.0, 6))
      .withColumn("sharpe",
        when(col("n_ret") >= 2 && varN > 0,
          round((s1D / nD) / sqrt(varN / (nD * (nD - 1.0))), 6)))
      .select(col(key), col("n_ret"), col("mean_ret"), col("sharpe"))
  }

  /** Pearson's SECOND skewness coefficient per key:
    * `3·(mean − median)/σ` over cent-quantized values — the
    * nonparametric asymmetry diagnostic. Chosen over moment skewness
    * deliberately: third/fourth power sums of quantized values blow
    * past 2^53, where the exact-integer → double conversion stops
    * being engine-identical (the hugeint double-rounding trap
    * [[Series.olsTrend]] documents), while mean/σ need only second
    * powers and the exact median interpolates between two integers —
    * every input to the final expression stays bit-reproducible.
    * One hash aggregate on the key (percentile sorts per key inside
    * the aggregate, partition-local).
    */
  def nonparamSkew(events: DataFrame, key: String, value: Column)
      : DataFrame = {
    val dec = "decimal(19,0)"
    val vc = round(value * 100).cast("long")
    val nD = col("n").cast("double")
    val s1D = col("_s1").cast("double")
    val s2D = col("_s2").cast("double")
    val varN = nD * s2D - s1D * s1D
    events
      .withColumn("_vc", vc)
      .groupBy(col(key))
      // square in DECIMAL space (like sharpe): LONG _vc·_vc silently
      // wraps past ~3e7 in value units while the oracle's HUGEINT
      // multiply doesn't — the engines would diverge instead of both
      // being exact
      .agg(count(lit(1)).as("n"),
        sum(col("_vc").cast(dec)).as("_s1"),
        sum(col("_vc").cast(dec) * col("_vc").cast(dec)).as("_s2"),
        expr("percentile(_vc, 0.5)").as("_med"))
      .withColumn("skew",
        when(col("n") >= 2 && varN > 0,
          round(lit(3.0) * (s1D / nD - col("_med")) /
            sqrt(varN / (nD * (nD - 1.0))), 6)))
      .select(col(key), col("n"), round(col("_med") / 100.0, 6).as("median"),
        col("skew"))
  }

  /** Welch's unequal-variance t per key, each key's values against
    * the REST of the corpus (one-vs-rest): `t = (m₁ − m₂) /
    * √(s₁²/n₁ + s₂²/n₂)` with the Welch–Satterthwaite degrees of
    * freedom — the "is this slice's mean actually different" test an
    * A/B readout or a data-drift monitor runs per segment, correct
    * when group variances differ (which one-vs-rest guarantees).
    *
    * Exactness discipline ([[sharpe]]'s): values quantize to integer
    * cents, per-key count/sum/sum-of-squares accumulate as DECIMAL
    * (exact, order-independent, spill-safe), and the REST side is the
    * global totals minus the key's own sums — one extra 1-row
    * broadcast aggregate instead of a second corpus pass or an
    * anti-join per key. Every t/df input is an exact integer cast to
    * double in a fixed expression order, so the statistic is
    * bit-identical in any engine. t and df are invariant to the cents
    * scaling (it cancels); the reported mean rescales to value units.
    *
    * Plan: one hash aggregate on the key + one 1-row global aggregate
    * broadcast beside it — two map-side-combined passes, no window,
    * no join keyed wider than the key itself.
    */
  def welchTvsRest(events: DataFrame, key: String, value: Column)
      : DataFrame = {
    val dec = "decimal(19,0)"
    val vc = round(value * 100).cast("long")
    val perKey = events
      .withColumn("_vc", vc.cast(dec))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n"),
        sum(col("_vc")).as("_s1"),
        sum(col("_vc") * col("_vc")).as("_s2"))
    val totals = perKey
      .agg(sum(col("n")).as("_tn"), sum(col("_s1")).as("_t1"),
        sum(col("_s2")).as("_t2"))
    val nD = col("n").cast("double")
    val rnD = col("_rn").cast("double")
    perKey.crossJoin(broadcast(totals))
      .withColumn("_rn", col("_tn") - col("n"))
      .withColumn("_r1", (col("_t1") - col("_s1")).cast("double"))
      .withColumn("_r2", (col("_t2") - col("_s2")).cast("double"))
      .withColumn("_m1", col("_s1").cast("double") / nD)
      .withColumn("_m2", col("_r1") / rnD)
      .withColumn("_v1",
        (nD * col("_s2").cast("double") -
          col("_s1").cast("double") * col("_s1").cast("double")) /
          (nD * (nD - 1.0)))
      .withColumn("_v2",
        (rnD * col("_r2") - col("_r1") * col("_r1")) /
          (rnD * (rnD - 1.0)))
      .withColumn("_u1", col("_v1") / nD)
      .withColumn("_u2", col("_v2") / rnD)
      .withColumn("_se2", col("_u1") + col("_u2"))
      .withColumn("mean", round(col("_m1") / 100.0, 6))
      .withColumn("t_welch",
        when(col("n") >= 2 && col("_rn") >= 2 && col("_se2") > 0,
          round((col("_m1") - col("_m2")) / sqrt(col("_se2")), 6)))
      .withColumn("df_welch",
        when(col("n") >= 2 && col("_rn") >= 2 && col("_se2") > 0,
          round(col("_se2") * col("_se2") /
            (col("_u1") * col("_u1") / (nD - 1.0) +
             col("_u2") * col("_u2") / (rnD - 1.0)), 6)))
      .select(col(key), col("n"), col("mean"), col("t_welch"),
        col("df_welch"))
  }

  /** Lag-k autocorrelation of consecutive-tick returns per key —
    * Pearson correlation between the return series and itself shifted
    * k steps, the mean-reversion/momentum diagnostic a signal desk
    * checks before fitting anything autoregressive. Returns quantize
    * to integer cents ([[sharpe]]'s budget), the pair (x = r_{t−k},
    * y = r_t) comes from a SECOND lag over the same (ts, id) window
    * (Catalyst plans both lags in one window stage — same partitioning
    * AND ordering), the five power sums accumulate as DECIMAL (exact,
    * order-independent), and the final correlation is one fixed-order
    * double expression with IEEE sqrt — bit-identical in any engine.
    * The windows and the aggregate share the key partitioning: ONE
    * shuffle end-to-end.
    *
    * Output: `key, n_pairs, autocorr` — null for degenerate series
    * (either side constant, or fewer than 2 pairs).
    */
  def autocorr(events: DataFrame, key: String, ts: Column, id: Column,
               value: Column, lagK: Int): DataFrame = {
    val dec = "decimal(19,0)"
    val w = Series.ordered(key, ts, id)
    val rc = round((value - lag(value, 1).over(w)) * 100).cast("long")
    val nD = col("n_pairs").cast("double")
    def d(c: String) = col(c).cast("double")
    val varX = nD * d("_sxx") - d("_sx") * d("_sx")
    val varY = nD * d("_syy") - d("_sy") * d("_sy")
    events
      .withColumn("_rc", rc.cast(dec))
      .withColumn("_x", lag(col("_rc"), lagK).over(w))
      // both sides non-null: the first return AND the first k pairs of
      // each key drop, exactly the textbook pair set
      .filter(col("_rc").isNotNull && col("_x").isNotNull)
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("_x")).as("_sx"), sum(col("_rc")).as("_sy"),
        sum(col("_x") * col("_rc")).as("_sxy"),
        sum(col("_x") * col("_x")).as("_sxx"),
        sum(col("_rc") * col("_rc")).as("_syy"))
      .withColumn("autocorr",
        when(col("n_pairs") >= 2 && varX > 0 && varY > 0,
          round((nD * d("_sxy") - d("_sx") * d("_sy")) /
            (sqrt(varX) * sqrt(varY)), 6)))
      .select(col(key), col("n_pairs"), col("autocorr"))
  }

  /** Variance-ratio diagnostic per key (Lo & MacKinlay 1988's public
    * random-walk test, in its plain sample-variance form):
    * `VR(k) = Var(k-period returns) / (k · Var(1-period returns))` —
    * ≈1 for a random walk, >1 under momentum, <1 under mean
    * reversion; the aggregate-level complement of [[autocorr]]'s
    * per-lag correlation. Both return series come from lags over the
    * SAME (ts, id) window (one window stage), quantize to integer
    * cents, and feed ONE hash aggregate of six DECIMAL power sums;
    * the ratio is one fixed-order double expression over the exact
    * sums. ONE shuffle end-to-end. Overlapping k-period returns (the
    * standard construction — dropping to non-overlapping wastes
    * (k−1)/k of the sample).
    *
    * Output: `key, n_1, n_k, vr` — vr null when either side has <2
    * returns or the 1-period variance is 0.
    */
  def varianceRatio(events: DataFrame, key: String, ts: Column,
                    id: Column, value: Column, k: Int): DataFrame = {
    val dec = "decimal(19,0)"
    val w = Series.ordered(key, ts, id)
    def ret(lagN: Int): Column =
      round((value - lag(value, lagN).over(w)) * 100).cast("long").cast(dec)
    def d(c: String) = col(c).cast("double")
    val n1D = col("n_1").cast("double")
    val nkD = col("n_k").cast("double")
    // n²·(n−1)·σ² forms — positive iff the sample variance is
    val var1N = n1D * d("_a2") - d("_a1") * d("_a1")
    val varkN = nkD * d("_b2") - d("_b1") * d("_b1")
    events
      .withColumn("_r1", ret(1))
      .withColumn("_rk", ret(k))
      .groupBy(col(key))
      .agg(count(col("_r1")).as("n_1"),
        sum(col("_r1")).as("_a1"),
        sum(col("_r1") * col("_r1")).as("_a2"),
        count(col("_rk")).as("n_k"),
        sum(col("_rk")).as("_b1"),
        sum(col("_rk") * col("_rk")).as("_b2"))
      .withColumn("vr",
        when(col("n_1") >= 2 && col("n_k") >= 2 && var1N > 0,
          round((varkN / (nkD * (nkD - 1.0))) /
            (lit(k.toDouble) * (var1N / (n1D * (n1D - 1.0)))), 6)))
      .select(col(key), col("n_1"), col("n_k"), col("vr"))
  }

  /** Seasonality profile: mean value per (key, day-of-week,
    * hour-of-day) — the weekly/diurnal template behavioral and market
    * series both repeat. Day numbering is 0 = Sunday (engine- and
    * locale-independent by explicit arithmetic). One hash aggregate;
    * output is |keys|·168 rows regardless of corpus size.
    */
  def seasonality(events: DataFrame, key: String, ts: Column,
                  value: Column): DataFrame =
    events
      .groupBy(col(key), (dayofweek(ts) - 1).as("dow"),
        hour(ts).as("hod"))
      .agg(count(lit(1)).as("n"), sum(cents(value)).as("_s"))
      .withColumn("mean_value",
        round(col("_s") / (lit(1000000.0) * col("n")), 6))
      .drop("_s")

  /** Benford first-significant-digit audit: observed leading-digit
    * shares of the positive values against the log10(1 + 1/d) law —
    * the classic fabricated-data / quality screen. The digit comes
    * from the DECIMAL STRING of the exact integer MICRO-units
    * ([[cents]] is ×10⁶; the ≥1 positivity gate therefore admits
    * values down to 1e-6 — long→string renders identically in every
    * engine; no log10 of a double, whose 1-ulp libm differences could
    * flip the digit at exact powers of ten). Expected shares are
    * Scala-computed literals embedded in both engine and oracle.
    * 9-row output; the total joins back as a broadcast single row.
    */
  def benford(events: DataFrame, value: Column): DataFrame = {
    val expected = (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d))
    val digits = events
      .withColumn("_vc", cents(value))
      .filter(col("_vc") >= 1)
      .withColumn("digit",
        substring(col("_vc").cast("string"), 1, 1).cast("int"))
    val counts = digits.groupBy("digit").agg(count(lit(1)).as("n"))
    val total = digits.agg(count(lit(1)).as("_total"))
    val expCol = expected.tail.foldLeft(
      when(col("digit") === 1, lit(expected.head._2))) {
      case (acc, (d, e)) => acc.when(col("digit") === d, lit(e))
    }
    counts.crossJoin(broadcast(total))
      .withColumn("obs_share",
        round(col("n").cast("double") / col("_total").cast("double"), 6))
      .withColumn("exp_share", round(expCol, 6))
      .withColumn("dev", round(col("obs_share") - col("exp_share"), 6))
      .select(col("digit"), col("n"), col("obs_share"), col("exp_share"),
        col("dev"))
  }

  def cohortRetention(events: DataFrame, user: Column, ts: Column,
                      anchor: String): DataFrame = {
    val wk = events
      .select(user.as("u"),
        floor(datediff(to_date(ts), to_date(lit(anchor))) / 7.0)
          .cast("long").as("week"))
      .filter(col("week") >= 0)
      .distinct()
    val cohorts = wk.groupBy("u").agg(min(col("week")).as("cohort_week"))
    wk.join(cohorts, "u")
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("active_users"))
  }

  /** Per-group Gini concentration of a non-negative integer value, in
    * exact integer ppm — the corpus-balance measure behind mixing
    * decisions: a source whose character mass concentrates in a few
    * giant documents (G → 1) contributes far less diversity per byte
    * than its row count suggests, so it mixes differently from a
    * uniform one (G → 0).
    *
    * Exactness: the rank form `G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx)`
    * over ascending ranks is computed entirely in BIGINTs and reported
    * as one truncating division to ppm (Spark `div` ≡ DuckDB `//`) —
    * no doubles anywhere. Ranks come from a per-group window ordered
    * by (value, id tiebreak); ties cannot change the result because
    * the coefficient sum over a tie block is fixed while x is
    * constant inside it, so the formula is permutation-invariant
    * within ties. One window pass + one group aggregate, both keyed
    * on the group — nothing corpus-crossed. Groups with zero total
    * mass report null.
    */
  def giniPpm(rows: DataFrame, groupCol: String, valCol: String,
              idCol: String): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy("_x", idCol)
    rows.select(col(groupCol), col(idCol),
        col(valCol).cast("long").as("_x"))
      .withColumn("_i", row_number().over(w).cast("long"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"), sum(col("_x")).as("_s0"),
        sum(col("_i") * col("_x")).as("_s1"))
      .select(col(groupCol), col("n"),
        when(col("_s0") > 0, expr(
          "((2 * _s1 - (n + 1) * _s0) * 1000000) div (n * _s0)"))
          .as("gini_ppm"))
  }
}
