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

  /** Fail fast — with the table and column named — when the driver
    * regenerates the testdata with a shape the adapters don't produce.
    * Round 8 burned entirely on silent drift (events.ts flipped from
    * INT64-nanos to tz-naive micros and 12 queries died in analysis);
    * one require here turns the next drift into a one-line diagnosis.
    */
  private def assertTypes(name: String, df: DataFrame,
                          expected: (String, org.apache.spark.sql.types.DataType)*): DataFrame = {
    expected.foreach { case (c, dt) =>
      val actual = df.schema(c).dataType
      require(actual == dt,
        s"testdata drift: $name.$c is $actual, expected $dt after adaptation " +
        s"— update Tables.$name's adapter for the new parquet shape")
    }
    df
  }

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** `events.parquet` has shipped `ts` in two physical shapes across
    * driver regenerations, both normalized here to a micros
    * `TimestampType` so every downstream `unix_micros`/`window` call
    * resolves:
    *   - INT64 TIMESTAMP(NANOS): unreadable as a timestamp by Spark;
    *     with `spark.sql.legacy.parquet.nanosAsLong=true` it surfaces
    *     as LongType nanos, truncated to micros (the data is
    *     micro-aligned; DuckDB's `epoch_us` truncates identically);
    *   - tz-naive timestamp[us] (the 2026-08-13 regen): Spark 4 reads
    *     it as TIMESTAMP_NTZ; the session TZ is pinned UTC, so
    *     `cast(TimestampType)` preserves the instant and the DuckDB
    *     oracle (which reads the naive micros directly) sees identical
    *     values.
    */
  def events: DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = t("events")
    val adapted = raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
    assertTypes("events", adapted,
      "event_id" -> LongType, "ts" -> TimestampType)
  }
  def documents: DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType}
    assertTypes("documents", t("documents"),
      "doc_id" -> LongType, "text" -> StringType)
  }
  def embeddings: DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}
    val df = assertTypes("embeddings", t("embeddings"), "vec_id" -> LongType)
    val et = df.schema("embedding").dataType
    require(et match { case ArrayType(FloatType, _) => true; case _ => false },
      s"testdata drift: embeddings.embedding is $et, expected array<float> " +
      "— update Tables.embeddings' adapter for the new parquet shape")
    df
  }

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

object Tables {
  /** The thin SQL-queryable view layer SURVEY §7.1 calls for: every
    * base table plus the reference's three domain relations registered
    * as temp views, so a SQL-only client — a Thrift/Connect frontend
    * with `spark.sql.extensions=graft.GraftExtensions` and ZERO
    * driver-side Scala in its query path — can `SELECT * FROM prices`
    * (or call any `graft_*` native function over `documents`) exactly
    * as the reference's REST layer queries SQLite. Views are lazy
    * logical plans over the parquet scans: registration reads nothing,
    * Catalyst still pushes filters/prunes columns into each scan, and
    * re-installation (a new `dir`) simply re-points the names.
    * Returns the registered view names.
    */
  def installViews(spark: SparkSession, dir: String): Seq[String] = {
    val tbl = Tables(spark, dir)
    val views: Seq[(String, DataFrame)] = Seq(
      "region"       -> tbl.region,
      "nation"       -> tbl.nation,
      "customer"     -> tbl.customer,
      "supplier"     -> tbl.supplier,
      "part"         -> tbl.part,
      "orders"       -> tbl.orders,
      "lineitem"     -> tbl.lineitem,
      "events"       -> tbl.events,
      "documents"    -> tbl.documents,
      "embeddings"   -> tbl.embeddings,
      "prices"       -> tbl.pricesFromEvents,
      "transactions" -> tbl.txnsFromEvents,
      "journal"      -> tbl.journalFromEvents)
    views.foreach { case (name, df) => df.createOrReplaceTempView(name) }
    views.map(_._1)
  }
}
