package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{DoubleType, StructField, StructType,
  TimestampType}

/** Streaming fixed-bin histogram percentiles — the third streaming
  * member of the mergeable-sketch trio (Count-Min top-k in
  * [[HeavyHitters]], HLL distinct in [[HllStream]]): an unbounded
  * value stream summarized as per-time-window bin counts whose
  * percentile read-out is the batch sketch's own CDF interpolation
  * (`Aggregates.approxPercentilesHist`, a13).
  *
  * Unlike the batch sketch, a stream cannot derive bin bounds from a
  * global min/max it has not seen yet, so the bounds are FIXED a
  * priori (the production pattern: the value domain is known —
  * latencies, scores in [0,1], prices) and out-of-range values clamp
  * into the edge bins, exactly as the batch clamp does.
  *
  * State shape: a declarative tumbling-window count — Spark holds only
  * the IN-FLIGHT windows' (window, bin) partial counts (≤ windows ×
  * bins rows, never stream-sized) and the watermark evicts each window
  * as it finalizes into the append-mode sink. The sink is a mergeable
  * log: counts are exact counters, windows partition event time, so
  * reconstruction is a plain SUM per bin that commutes across batches
  * and restarts. Closing the books uses st6's punctuation pattern —
  * one sentinel row stamped past `horizon + window` drags the
  * watermark over every real window's end (all emit) while its own
  * window stays open and unemitted.
  */
object HistStream {

  val valueSchema: StructType = StructType(Seq(
    StructField("ts", TimestampType),
    StructField("value", DoubleType)))

  /** (ts, value) stream → finalized `(win_us, bin, cnt)` rows. */
  def binRows(incoming: DataFrame, lo: Double, hi: Double, bins: Int,
              windowDur: String = "1 day"): DataFrame = {
    require(bins >= 1 && hi > lo, s"bad histogram spec [$lo,$hi)/$bins")
    val step = (hi - lo) / bins
    incoming
      .withWatermark("ts", "0 seconds")
      .where(col("value").isNotNull)
      .select(col("ts"),
        least(lit(bins - 1L), greatest(lit(0L),
          floor((col("value").cast("double") - lo) / step)))
          .cast("int").as("bin"))
      .groupBy(window(col("ts"), windowDur), col("bin"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros(col("window.start")).as("win_us"),
        col("bin"), col("cnt"))
  }

  /** Micro-batch file-source pipeline over a landing dir of
    * (ts, value) rows.
    */
  def start(spark: SparkSession, landingDir: String, sinkDir: String,
            checkpointDir: String, lo: Double, hi: Double, bins: Int,
            windowDur: String = "1 day",
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    binRows(
        graft.sources.Adaptive.streamSession(spark, landingDir)
          .readStream.schema(valueSchema).parquet(landingDir),
        lo, hi, bins, windowDur)
      .writeStream
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .start()

  /** Batch read-back: bin counts = SUM over the window log (windows
    * partition time, so the sum is the exact corpus histogram), then
    * the batch sketch's shared CDF fold. The collect is bins-bounded,
    * never stream-sized.
    */
  def estimate(sinkRows: DataFrame, lo: Double, hi: Double, bins: Int,
               ps: Seq[Double]): DataFrame = {
    val spark = sinkRows.sparkSession
    import spark.implicits._
    val counts = sinkRows.groupBy("bin")
      .agg(sum(col("cnt")).as("cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = counts.valuesIterator.sum
    graft.operators.Aggregates
      .percentilesFromHist(counts, n, lo, hi, bins, ps).toDF("p", "est")
  }
}
