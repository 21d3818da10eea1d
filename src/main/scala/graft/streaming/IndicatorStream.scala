package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType,
  StructField, StructType, TimestampType}

/** Streaming indicator engine: ticks → closed hourly candles → TRUE
  * Wilder-style recursive EMA, all in one stateful pass.
  *
  * This is the operator that motivates streaming state in the first
  * place: the exact recursion `ema_t = ema_{t-1} + α·(close_t −
  * ema_{t-1})` is a sequential dependency no batch SQL engine
  * parallelizes — the batch library ships a TRUNCATED EMA
  * ([[graft.operators.Series.emaTrunc]], a K-lag FIR approximation)
  * precisely because the infinite-memory recursion would serialize a
  * window — while per-key streaming state makes the true recursion a
  * trivial O(1) fold: the state store carries (open bar, last applied
  * (ts, id), running ema) per symbol, and each micro-batch advances it.
  *
  * Semantics:
  *  - bars are epoch-aligned `barSec` buckets; a bar CLOSES (and its
  *    EMA emits, exactly once, append-mode) when a strictly later
  *    bucket's first tick arrives for that symbol — so the last real
  *    bar needs the close-the-books punctuation row the other
  *    streaming operators also use (one sentinel PER SYMBOL here,
  *    since state is per-key: stamp ≥ one bucket past the horizon;
  *    the sentinel's own bar never closes and never emits);
  *  - late data: a row at-or-before the symbol's last applied
  *    (ts, id) is DROPPED (monotone processing — the deterministic
  *    policy; a watermark-buffered variant would trade state size for
  *    reordering tolerance);
  *  - within a micro-batch rows are sorted by (ts, id) before the
  *    fold, so replaying the whole history as ONE batch (AvailableNow
  *    backfill) gives the identical result to any in-order split into
  *    many batches — the restart spec proves the split case. Batch
  *    sorting buffers one symbol's micro-batch, which is fine at tick
  *    cadence; bound backfill batches with maxFilesPerTrigger.
  *
  * The first closed bar seeds `ema = close` (the standard convention,
  * and the DuckDB oracle's recursive seed). The state carries the
  * UNROUNDED ema; rounding to 6 happens only on emit, mirroring the
  * oracle's final `round(ema, 6)`.
  */
object IndicatorStream {

  case class Tick(symbol: String, ts: Timestamp, event_id: Long,
                  value: Double)
  case class BarState(barUs: Long, close: Double, lastTsUs: Long,
                      lastId: Long, ema: Double, hasEma: Boolean)
  case class BarEma(symbol: String, bar_us: Long, close: Double,
                    ema: Double)

  val tickSchema: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("ts", TimestampType),
    StructField("event_id", LongType),
    StructField("value", DoubleType)))

  def alphaFor(span: Int): Double = 2.0 / (span + 1)

  /** HALF_UP to 6 decimals — the same rounding `round(x, 6)` performs
    * in both Spark and DuckDB on (positive) doubles.
    */
  def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def tUs(t: Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** Fold one symbol's micro-batch into the running (bar, ema) state,
    * emitting every bar the batch closes. `lateDrops` (when given)
    * counts rows the monotone gate rejects — see [[StreamMetrics]].
    */
  def foldSymbol(span: Int, barSec: Long,
                 lateDrops: Option[org.apache.spark.util.LongAccumulator]
                   = None)(
      symbol: String, rows: Iterator[Tick],
      state: GroupState[BarState]): Iterator[BarEma] = {
    val alpha = alphaFor(span)
    val barLenUs = barSec * 1000000L
    val sorted = rows.toArray.sortBy(t => (tUs(t.ts), t.event_id))
    var st = state.getOption
    val out = scala.collection.mutable.ArrayBuffer.empty[BarEma]
    sorted.foreach { t =>
      val us = tUs(t.ts)
      val late = st.exists(s =>
        us < s.lastTsUs || (us == s.lastTsUs && t.event_id <= s.lastId))
      if (late) lateDrops.foreach(_.add(1L))
      if (!late) {
        val bucket = Math.floorDiv(us, barLenUs) * barLenUs
        st = st match {
          case None =>
            Some(BarState(bucket, t.value, us, t.event_id, 0.0,
              hasEma = false))
          case Some(s) if bucket == s.barUs =>
            Some(s.copy(close = t.value, lastTsUs = us, lastId = t.event_id))
          case Some(s) =>
            // bucket > s.barUs (an earlier bucket would have failed the
            // late gate: s.lastTsUs lies inside s.barUs). Close the bar.
            val e =
              if (s.hasEma) s.ema + alpha * (s.close - s.ema) else s.close
            out += BarEma(symbol, s.barUs, s.close, round6(e))
            Some(BarState(bucket, t.value, us, t.event_id, e,
              hasEma = true))
        }
      }
    }
    st.foreach(state.update)
    out.iterator
  }

  /** Streaming transform: ticks → closed (bar, close, true-EMA) rows.
    * Append mode: each closed bar emits exactly once.
    */
  def barEmaRows(incoming: Dataset[Tick], span: Int, barSec: Long,
                 lateDrops: Option[org.apache.spark.util.LongAccumulator]
                   = None): Dataset[BarEma] = {
    import incoming.sparkSession.implicits._
    incoming.groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(foldSymbol(span, barSec, lateDrops))
  }

  /** Micro-batch file-source pipeline over a landing dir of tick rows.
    * `maxFilesPerTrigger` bounds how much history one micro-batch
    * buffers (the per-key fold sorts its batch in memory) — set it for
    * large backfills whose landing files are written in time order;
    * leave it unset only when a single batch is intended (e.g. the
    * oracle replay, where one batch guarantees global order).
    */
  def start(spark: SparkSession, landingDir: String, sinkDir: String,
            checkpointDir: String, span: Int, barSec: Long,
            trigger: Trigger = Trigger.AvailableNow(),
            maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    import spark.implicits._
    val ss = graft.sources.Adaptive.streamSession(spark, landingDir)
    val reader = ss.readStream.schema(tickSchema)
    val bounded = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
    barEmaRows(bounded.parquet(landingDir).as[Tick], span, barSec,
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
