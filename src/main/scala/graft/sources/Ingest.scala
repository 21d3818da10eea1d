package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}

import graft.functions.MarketFunctions.{md5Hash48, pairBase, pairQuote}

/** Ingest connectors — SURVEY.md §2.1 (S2–S4, S9, S11–S12). The reference
  * fetches provider payloads over HTTP and parses them in Python
  * (/root/reference/ingest/); here each parser is a pure
  * payload-DataFrame → rows-DataFrame transform (`from_json` /
  * `get_json_object` + alternates), so the same code path serves batch
  * backfills and the streaming micro-batch ingest in
  * [[graft.streaming.PriceStream]]. HTTP itself stays outside the engine,
  * exactly like the reference's tests mock `requests.get`.
  */
object Ingest {

  /** S2 — Alpha Vantage GLOBAL_QUOTE parser
    * (/root/reference/ingest/alpha_vantage.py:15-48): alternate key
    * spellings (`Global Quote`/`globalQuote`, `05. price`/`05_price`),
    * date-only timestamps normalized to `T00:00:00Z`.
    */
  def parseAlphaVantageQuote(payloads: DataFrame,
                             payloadCol: String = "payload"): DataFrame = {
    val p = col(payloadCol)
    def alt(paths: String*): Column =
      coalesce(paths.map(get_json_object(p, _)): _*)
    val rawDate = alt("$['Global Quote']['07. latest trading day']",
      "$.globalQuote['07_latest trading day']",
      "$.globalQuote.latestTradingDay")
    payloads.select(
      alt("$['Global Quote']['01. symbol']", "$.globalQuote['01_symbol']",
        "$.globalQuote.symbol").as("symbol"),
      alt("$['Global Quote']['05. price']", "$.globalQuote['05_price']",
        "$.globalQuote.price").cast("double").as("price"),
      to_timestamp(when(rawDate.rlike("^\\d{4}-\\d{2}-\\d{2}$"),
        concat(rawDate, lit("T00:00:00Z"))).otherwise(rawDate))
        .as("as_of"),
      lit(null).cast("string").as("currency"),
      lit("alpha_vantage").as("source"),
      // rate-limit / error surfacing (alpha_vantage.py notes) — callers
      // route rows with a non-null error to the 502 path
      coalesce(get_json_object(p, "$.Note"),
        get_json_object(p, "$['Error Message']")).as("error"))
  }

  /** S3 — Alpha Vantage FX parser
    * (/root/reference/ingest/alpha_vantage_fx.py:16-62): pair split 3+3,
    * three timestamp formats normalized, rate-limit note surfaced.
    */
  def parseAlphaVantageFx(payloads: DataFrame, pairCol: String = "pair",
                          payloadCol: String = "payload"): DataFrame = {
    val p = col(payloadCol)
    val r = "$['Realtime Currency Exchange Rate']"
    val rawTs = get_json_object(p, s"$r['6. Last Refreshed']")
    val normTs = coalesce(
      to_timestamp(when(rawTs.rlike("^\\d{4}-\\d{2}-\\d{2}$"),
          concat(rawTs, lit("T00:00:00Z")))
        .when(rawTs.contains(" "), regexp_replace(rawTs, " ", "T"))
        .otherwise(rawTs)),
      current_timestamp())
    payloads.select(
      pairBase(col(pairCol)).as("base"),
      pairQuote(col(pairCol)).as("quote"),
      concat(pairBase(col(pairCol)), pairQuote(col(pairCol))).as("symbol"),
      get_json_object(p, s"$r['5. Exchange Rate']").cast("double")
        .as("price"),
      normTs.as("as_of"),
      pairQuote(col(pairCol)).as("currency"),
      lit("alpha_vantage_fx").as("source"),
      coalesce(get_json_object(p, "$.Note"),
        get_json_object(p, "$['Error Message']")).as("error"))
  }

  /** S4 — Yahoo chart parser (/root/reference/ingest/yahoo.py:7-47):
    * last timestamp + last non-null close (backward scan), meta currency.
    */
  def parseYahooChart(payloads: DataFrame,
                      payloadCol: String = "payload"): DataFrame = {
    val p = col(payloadCol)
    val res = "$.chart.result[0]"
    val closes = from_json(
      get_json_object(p, s"$res.indicators.quote[0].close"),
      ArrayType(DoubleType))
    val stamps = from_json(get_json_object(p, s"$res.timestamp"),
      ArrayType(LongType))
    val nonNull = filter(arrays_zip(stamps.as("ts"), closes.as("close")),
      s => s.getField("close").isNotNull)
    val lastGood = element_at(nonNull, -1)
    payloads.select(
      get_json_object(p, s"$res.meta.symbol").as("symbol"),
      lastGood.getField("close").as("price"),
      to_timestamp(lastGood.getField("ts")).as("as_of"),
      get_json_object(p, s"$res.meta.currency").as("currency"),
      lit("yahoo").as("source"))
  }

  /** S9 — demo seed source (/root/reference/app/seed_demo.py:28-55):
    * deterministic random-walk hourly prices, nSymbols × nPoints.
    * md5-seeded steps instead of `random.uniform` so fixtures are
    * reproducible across engines; the walk is a running window sum.
    */
  def seedPrices(spark: SparkSession, symbols: Seq[(String, Double)],
                 nPoints: Int = 25, startIso: String = "2025-01-01")
      : DataFrame = {
    import spark.implicits._
    // symbol ordinal assigned driver-side so the id is pure arithmetic —
    // a row_number over Window.orderBy(symbol, i) would funnel the whole
    // output through one partition just to mint ids
    val base = symbols.zipWithIndex
      .map { case ((sym, lvl), ix) => (sym, lvl, ix.toLong) }
      .toDF("symbol", "base_level", "_six")
    val idx = spark.range(nPoints.toLong).toDF("i")
    val stepPct = (md5Hash48(concat(col("symbol"), lit("#"),
      col("i").cast("string"))) % 1000L - 500L) / 100000.0
    val w = Window.partitionBy(col("symbol")).orderBy(col("i"))
    base.crossJoin(idx)
      .withColumn("_step", col("base_level") * stepPct)
      .withColumn("price",
        round(col("base_level") + sum(col("_step")).over(w), 6))
      .withColumn("as_of",
        to_timestamp(lit(startIso)) + make_interval(lit(0), lit(0), lit(0), lit(0), col("i").cast("int")))
      .withColumn("source", lit("demo"))
      .withColumn("currency", lit(null).cast("string"))
      .withColumn("id", (col("_six") * nPoints + col("i") + 1).cast("int"))
      .select("id", "symbol", "price", "as_of", "currency", "source")
  }

  /** S11/S12 — static news / macro-calendar sources
    * (/root/reference/app/main.py:638-667).
    */
  def news(spark: SparkSession, symbol: Option[String]): DataFrame = {
    import spark.implicits._
    val base = Seq(
      ("Markets steady as traders await CPI data", "wire", "US"),
      ("Central banks hold rates; guidance mixed", "wire", "EU"))
    val extra = symbol.map(s =>
      (s"$s in focus: technicals at key level", "synthetic", "US")).toSeq
    (base ++ extra).toDF("title", "source", "country")
  }

  def calendar(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("2025-01-03T13:30:00Z", "US", "Nonfarm Payrolls"),
      ("2025-01-09T09:00:00Z", "EU", "ECB Rate Decision"))
      .toDF("when_ts", "country", "event")
  }
}
