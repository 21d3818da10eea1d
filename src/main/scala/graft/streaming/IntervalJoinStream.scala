package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType,
  StructField, StructType, TimestampType}

/** Stream-stream event-time interval join — the streaming twin of
  * [[graft.operators.AsOf.rangeJoin]] (reference query: events landing
  * inside an impulse's 2-hour impact window, `j7_range_join`): an
  * impulse stream and an event stream join on key equality plus
  * `ts ∈ [i_ts, i_ts + window]`, with BOTH sides watermarked so Spark
  * derives state-retention bounds from the time-range condition — an
  * impulse evicts once the event watermark passes `i_ts + window`, an
  * event evicts once it can no longer fall in any live impulse's
  * window. State is O(in-flight window), never O(stream).
  *
  * Replay semantics: with a generous watermark delay nothing evicts and
  * a full `AvailableNow` replay reproduces the batch range join exactly
  * (`st7_stream_join`'s oracle). With a tight delay the join FORGETS —
  * an impulse whose window the watermark has passed no longer matches a
  * late event; StreamingSpec proves both the checkpoint-restart match
  * and that eviction (the bounded-state guarantee, not a bug).
  */
object IntervalJoinStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("event_type", StringType),
    StructField("ts", TimestampType),
    StructField("value", DoubleType)))

  val impulseSchema: StructType = StructType(Seq(
    StructField("iv_id", LongType),
    StructField("i_type", StringType),
    StructField("i_ts", TimestampType)))

  /** Joined pairs `(iv_id, event_id, event_type, ts)` for events inside
    * `[i_ts, i_ts + windowSec]` of a same-key impulse.
    */
  def joinedPairs(events: DataFrame, impulses: DataFrame,
                  windowSec: Long, watermarkDelay: String): DataFrame = {
    val e = events.withWatermark("ts", watermarkDelay)
    val i = impulses.withWatermark("i_ts", watermarkDelay)
    e.join(i,
        e("event_type") === i("i_type") &&
          e("ts") >= i("i_ts") &&
          e("ts") <= i("i_ts") + expr(s"INTERVAL $windowSec SECONDS"),
        "inner")
      .select(col("iv_id"), col("event_id"), col("event_type"),
        col("ts"))
  }

  /** Micro-batch pipeline over two landing dirs (events, impulses) →
    * parquet sink of joined pairs.
    */
  def start(spark: SparkSession, eventsDir: String, impulsesDir: String,
            sinkDir: String, checkpointDir: String, windowSec: Long,
            watermarkDelay: String = "30 days",
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    {
      // both sources must come from ONE session (the join is planned
      // on it); the events landing dominates the pair volume, so it
      // sizes the state-store count
      val ss = graft.sources.Adaptive.streamSession(spark, eventsDir)
      joinedPairs(
        ss.readStream.schema(eventSchema).parquet(eventsDir),
        ss.readStream.schema(impulseSchema).parquet(impulsesDir),
        windowSec, watermarkDelay)
    }
      .writeStream
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .start()
}
