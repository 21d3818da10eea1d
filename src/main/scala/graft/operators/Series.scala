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
        (lit(100.0) * count(value).over(tw)), 6))
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

  /** P1 — `analyzeICT` (/root/reference/static/main.js:336-383), the
    * reference's flagship composite: per key over the ordered series —
    * hi/lo/mid, premium/discount (last ≥ mid), directional bias from the
    * sign agreement of SMA(10)/SMA(20) slopes, and the 62–79% optimal
    * trade entry retracement zone of the hi→lo leg.
    *
    * One window stage (SMA columns) feeding one hash aggregate — two
    * shuffles total on the series key, independent of series count.
    */
  def analyzeICT(df: DataFrame, key: String, ord: Column, id: Column,
                 value: Column): DataFrame = {
    val w = ordered(key, ord, id)
    val withMa = df
      .withColumn("_ma10", sma(value, 10, w))
      .withColumn("_ma20", sma(value, 20, w))
      .withColumn("_rnd", row_number().over(
        Window.partitionBy(col(key)).orderBy(ord.desc, id.desc)))

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
}
