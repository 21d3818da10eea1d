package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming ingest — SURVEY.md §2.9. The reference approximates
  * continuous processing with a 15-second client polling loop
  * (/root/reference/static/main.js:592-596, `INTERVAL_MS = 15000`) and
  * relies on the UNIQUE(symbol, as_of, source) key to drop late
  * duplicates (/root/reference/app/db.py:44,255). Here that becomes a
  * Structured Streaming micro-batch pipeline: file source → watermarked
  * `dropDuplicates` on the unique key → append sink, triggered every
  * 15 s. Out-of-order `as_of` values are accepted (the reference sorts by
  * `as_of` at query time, not arrival time) — the watermark bounds only
  * the dedup state, mirroring ST3.
  */
object PriceStream {

  val priceSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("symbol", StringType),
    StructField("price", DoubleType),
    StructField("as_of", TimestampType),
    StructField("currency", StringType),
    StructField("source", StringType)))

  /** Watermarked dedup transform shared by batch parity tests and the
    * live stream.
    */
  def dedupe(incoming: DataFrame, watermark: String = "1 hour"): DataFrame =
    incoming
      .withWatermark("as_of", watermark)
      .dropDuplicates(Seq("symbol", "as_of", "source"))

  /** ST1 — 15-second micro-batch ingest from a landing directory into a
    * parquet prices table. `watermark` bounds the dedup state window: at
    * quote cadence "1 hour" is ample; pass a large value for exact
    * replay-dedup over historical backfills (state is then never
    * evicted, so a key landing in any later micro-batch still dedups).
    */
  def start(spark: SparkSession, landingDir: String, tableDir: String,
            checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime("15 seconds"),
            watermark: String = "1 hour")
      : StreamingQuery = {
    // data-proportional state-store count (guide §2): the stateful
    // dedup runs one state store per shuffle partition, each paying a
    // per-micro-batch checkpoint commit — size the count to the
    // landing's bytes instead of the session constant (AQE can't:
    // it is disabled for stateful streams). Same rows out — dedup is
    // partition-count-invariant — so only the overhead moves.
    val ss = graft.sources.Adaptive.streamSession(spark, landingDir)
    dedupe(ss.readStream.schema(priceSchema).parquet(landingDir),
        watermark)
      .writeStream
      .format("parquet")
      .option("path", tableDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** Windowed per-symbol OHLC-style aggregate over the stream — the
    * streaming generalization of the reference's quote-refresh loop:
    * tumbling event-time windows with late data bounded by the watermark.
    */
  def windowedQuotes(incoming: DataFrame, windowDur: String = "1 hour",
                     watermark: String = "1 hour"): DataFrame =
    quotesAgg(incoming.withWatermark("as_of", watermark), windowDur)

  /** The windowed aggregate itself, shared between the stream above and
    * batch parity checks (identical results over the same rows — the
    * batch/stream unification Structured Streaming promises).
    */
  def quotesAgg(df: DataFrame, windowDur: String = "1 hour"): DataFrame =
    df.groupBy(window(col("as_of"), windowDur), col("symbol"))
      .agg(
        min_by(col("price"), col("as_of")).as("open"),
        max_by(col("price"), col("as_of")).as("close"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        count(lit(1)).as("n"))

  /** Stream-stream interval join: each price tick picks up the news items
    * for its symbol published within the preceding `lookback`. The time
    * bound plus watermarks on BOTH sides is what lets Structured
    * Streaming expire join state — an unbounded stream-stream join would
    * buffer forever. Works identically on batch frames (no watermark
    * needed there), which the parity spec exercises.
    */
  def newsForTicks(prices: DataFrame, news: DataFrame,
                   lookback: String = "1 hour",
                   watermark: String = "2 hours"): DataFrame = {
    val p = (if (prices.isStreaming) prices.withWatermark("as_of", watermark)
             else prices)
    val n = (if (news.isStreaming) news.withWatermark("published", watermark)
             else news)
      .withColumnRenamed("symbol", "n_symbol")
    p.join(n,
      col("symbol") === col("n_symbol") &&
        col("published") >= col("as_of") - expr(s"INTERVAL $lookback") &&
        col("published") <= col("as_of"))
      .drop("n_symbol")
  }
}
