package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet testdata (TESTDATA.md) plus
  * adapters that re-shape the synthetic tables into the reference's domain
  * relations (prices / journal / transactions — see SURVEY.md §1.1,
  * reference DDL at /root/reference/app/db.py:33-163).
  *
  * All loads are plain parquet scans so Catalyst pushes filters and prunes
  * columns into the scan; at cluster scale the same code path works over a
  * partitioned table root instead of a single file.
  */
final case class Tables(spark: SparkSession, dir: String) {
  // The driver may hand us a session without the nanos conf (see events);
  // it is a runtime SQL conf, so set it before the first scan. Native
  // sketch expressions register here too, so any session that reaches a
  // table can resolve graft_* functions.
  try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
  catch { case _: Throwable => () }
  try graft.expressions.GraftFunctions.register(spark)
  catch { case _: Throwable => () }

  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** `events.parquet` stores `ts` as INT64 TIMESTAMP(NANOS), which Spark
    * cannot read as a timestamp; with
    * `spark.sql.legacy.parquet.nanosAsLong=true` it surfaces as LongType
    * nanos, which we truncate to a micros TimestampType (the data is
    * micro-aligned; DuckDB's `epoch_us` truncates identically).
    */
  def events: DataFrame = {
    val raw = t("events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")

  /** `prices`-shaped view of `events` (symbol ≈ event_type, price ≈ value,
    * as_of ≈ ts, id ≈ event_id) — the reference's quote time-series
    * (/root/reference/app/db.py:36-45). `source` keyed off user_id parity
    * so dedup/source semantics are exercisable.
    */
  def pricesFromEvents: DataFrame =
    events.select(
      col("event_id").as("id"),
      col("event_type").as("symbol"),
      col("value").as("price"),
      col("ts").as("as_of"),
      lit("USD").as("currency"),
      concat(lit("src"), (col("user_id") % 2).cast("string")).as("source"))

  /** `transactions`-shaped view of `events` (portfolio ≈ user_id bucket,
    * BUY/SELL/DIV mapped from event_type) mirroring
    * /root/reference/app/db.py:93-107.
    */
  def txnsFromEvents: DataFrame =
    events.select(
      col("event_id").as("id"),
      (col("user_id") % 10).as("portfolio_id"),
      col("ts").as("date"),
      concat(lit("U"), col("user_id").cast("string")).as("symbol"),
      when(col("event_type") === "purchase", lit("BUY"))
        .when(col("event_type") === "click", lit("SELL"))
        .when(col("event_type") === "view", lit("DIV"))
        .when(col("event_type") === "signup", lit("CASH"))
        .otherwise(lit("FX")).as("type"),
      (col("value") % 10.0 + 1.0).as("qty"),
      col("value").as("price"),
      lit(0.0).as("fees"))

  /** `journal`-shaped view of `events` mirroring the reference trade
    * journal (/root/reference/app/db.py:50-64): deterministic direction /
    * entry / stop / exit derived from event fields so PnL and R algebra
    * (static/main.js:901-916) is exercisable with a SQL oracle.
    */
  def journalFromEvents: DataFrame =
    events.select(
      col("event_id").as("id"),
      col("event_type").as("symbol"),
      col("ts").as("date"),
      when(col("event_id") % 2 === 0, lit("Long")).otherwise(lit("Short"))
        .as("direction"),
      (col("event_id") % 5 + 1).cast("double").as("qty"),
      col("value").as("entry"),
      (col("value") * 0.95).as("stop"),
      when(col("event_id") % 7 === 0, lit(null).cast("double"))
        .otherwise(col("value") * 1.1).as("exit"),
      (col("value") * 0.001).as("fees"),
      concat(col("event_type"), lit(","), lit("demo")).as("tags"))
}
