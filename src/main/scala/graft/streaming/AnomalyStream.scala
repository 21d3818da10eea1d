package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StreamingQuery, Trigger}

/** Streaming EWMA anomaly detector over closed candles: ticks → hourly
  * bars → recursive (ema, ew-variance) state → a z-score per bar close,
  * flagged when the close sits more than `k` EW standard deviations
  * from where the recursion predicted it — the alerting tail of a
  * market-data ingestion pipeline (RiskMetrics-style EWMA volatility,
  * a public formula).
  *
  * Like [[IndicatorStream]] (whose bar-close machinery this shares),
  * the point is the recursion: BOTH accumulators are sequential folds
  * (`ema += α·diff`, `evar = (1−α)·(evar + α·diff²)`) that no batch
  * SQL engine parallelizes, while per-symbol streaming state advances
  * them in O(1) per bar. The z-score is computed against the state
  * BEFORE the closing bar folds in — the causal form: an alert
  * compares the new observation to what the PAST implied, never to a
  * variance the observation itself already inflated.
  *
  * Semantics (shared bit-for-bit with the DuckDB recursive-CTE
  * oracle):
  *  - bars close exactly as in [[IndicatorStream]]: a strictly later
  *    bucket's first tick closes the open bar; per-symbol sentinel
  *    rows close the books; late rows drop at the monotone (ts, id)
  *    gate;
  *  - the first closed bar seeds `ema = close, evar = 0` and emits a
  *    null z; bar n (1-indexed) emits
  *    `z = |close − ema|/√evar` only once `n−1 ≥ minBars` prior bars
  *    warmed the state AND `evar > 0` (a constant series has no scale
  *    to score against — null, not ∞);
  *  - `anom` compares the UNROUNDED z to `k` (both engines see the
  *    identical doubles); the emitted z is rounded to 6.
  */
object AnomalyStream {

  case class AnomState(barUs: Long, close: Double, lastTsUs: Long,
                       lastId: Long, ema: Double, evar: Double,
                       nBars: Long)
  case class BarAnom(symbol: String, bar_us: Long, close: Double,
                     z: Option[Double], anom: Boolean)

  private def tUs(t: Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** Fold one symbol's micro-batch: close bars, score each close
    * against the pre-update (ema, evar), then fold it in. `lateDrops`
    * (when given) counts rows the monotone gate rejects — see
    * [[StreamMetrics]].
    */
  def foldSymbol(alpha: Double, k: Double, minBars: Int, barSec: Long,
                 lateDrops: Option[org.apache.spark.util.LongAccumulator]
                   = None)(
      symbol: String, rows: Iterator[IndicatorStream.Tick],
      state: GroupState[AnomState]): Iterator[BarAnom] = {
    val barLenUs = barSec * 1000000L
    val sorted = rows.toArray.sortBy(t => (tUs(t.ts), t.event_id))
    var st = state.getOption
    val out = scala.collection.mutable.ArrayBuffer.empty[BarAnom]
    def closeBar(s: AnomState): AnomState = {
      val zRaw =
        if (s.nBars >= minBars && s.evar > 0)
          Some(math.abs(s.close - s.ema) / math.sqrt(s.evar))
        else None
      out += BarAnom(symbol, s.barUs, s.close,
        zRaw.map(IndicatorStream.round6), zRaw.exists(_ > k))
      if (s.nBars == 0L)
        s.copy(ema = s.close, evar = 0.0, nBars = 1L)
      else {
        val diff = s.close - s.ema
        s.copy(ema = s.ema + alpha * diff,
          evar = (1.0 - alpha) * (s.evar + alpha * diff * diff),
          nBars = s.nBars + 1L)
      }
    }
    sorted.foreach { t =>
      val us = tUs(t.ts)
      val late = st.exists(s =>
        us < s.lastTsUs || (us == s.lastTsUs && t.event_id <= s.lastId))
      if (late) lateDrops.foreach(_.add(1L))
      if (!late) {
        val bucket = Math.floorDiv(us, barLenUs) * barLenUs
        st = st match {
          case None =>
            Some(AnomState(bucket, t.value, us, t.event_id, 0.0, 0.0, 0L))
          case Some(s) if bucket == s.barUs =>
            Some(s.copy(close = t.value, lastTsUs = us, lastId = t.event_id))
          case Some(s) =>
            val folded = closeBar(s)
            Some(folded.copy(barUs = bucket, close = t.value,
              lastTsUs = us, lastId = t.event_id))
        }
      }
    }
    st.foreach(state.update)
    out.iterator
  }

  /** Streaming transform: ticks → (bar, close, z, anomaly flag) rows,
    * append mode, each closed bar exactly once.
    */
  def barAnomRows(incoming: Dataset[IndicatorStream.Tick], alpha: Double,
                  k: Double, minBars: Int, barSec: Long,
                  lateDrops: Option[org.apache.spark.util.LongAccumulator]
                    = None): Dataset[BarAnom] = {
    import incoming.sparkSession.implicits._
    incoming.groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(
        foldSymbol(alpha, k, minBars, barSec, lateDrops))
  }

  /** Micro-batch file-source pipeline over a landing dir of tick rows
    * (same contract as [[IndicatorStream.start]]).
    */
  def start(spark: SparkSession, landingDir: String, sinkDir: String,
            checkpointDir: String, alpha: Double, k: Double,
            minBars: Int, barSec: Long,
            trigger: Trigger = Trigger.AvailableNow(),
            maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    import spark.implicits._
    val ss = graft.sources.Adaptive.streamSession(spark, landingDir)
    val reader = ss.readStream.schema(IndicatorStream.tickSchema)
    val bounded = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
    barAnomRows(bounded.parquet(landingDir).as[IndicatorStream.Tick],
        alpha, k, minBars, barSec,
        Some(StreamMetrics.lateRows(spark, checkpointDir)))
      .writeStream
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .start()
  }
}
