package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType,
  TimestampType}

/** Streaming gap sessionization — Spark's native `session_window`
  * aggregation under a watermark: per user, events closer than `gap`
  * merge into one growing session held in state; a session emits (and
  * its state evicts) only once the watermark passes its end, so the
  * append-mode sink receives each session exactly once, closed.
  *
  * Closing the books: a session that includes the stream's newest
  * event can never finalize on its own (the watermark sits at max
  * event time). The operational pattern is a PUNCTUATION row — one
  * sentinel event stamped `gap` past the real horizon under a user id
  * outside the real key space. It drags the global watermark past
  * every real session's end (all emit) while its own session stays
  * open and unemitted. [[sessionRows]] is the operator;
  * `st6_session_stream` replays the events table through it and must
  * reproduce the batch gaps-and-islands sessionization row-for-row —
  * with `session_window`'s boundary convention (a gap of EXACTLY
  * `gap` starts a new session, mirrored by `>=` in the oracle).
  */
object SessionStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("user_id", LongType),
    StructField("ts", TimestampType),
    StructField("event_id", LongType)))

  /** (user_id, ts) stream → closed sessions:
    * `(user_id, n, start_us, end_us)`.
    */
  def sessionRows(incoming: DataFrame, gapSec: Long): DataFrame =
    incoming
      .withWatermark("ts", "0 seconds")
      .groupBy(session_window(col("ts"), s"$gapSec seconds"),
        col("user_id"))
      .agg(count(lit(1)).as("n"),
        unix_micros(min(col("ts"))).as("start_us"),
        unix_micros(max(col("ts"))).as("end_us"))
      .select("user_id", "n", "start_us", "end_us")

  /** Micro-batch file-source pipeline over a landing dir of
    * (user_id, ts, event_id) rows.
    */
  def start(spark: SparkSession, landingDir: String, sinkDir: String,
            checkpointDir: String, gapSec: Long,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    sessionRows(
        graft.sources.Adaptive.streamSession(spark, landingDir)
          .readStream.schema(eventSchema).parquet(landingDir),
        gapSec)
      .writeStream
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .start()
}
