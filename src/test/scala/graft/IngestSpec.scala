package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Ingest

/** S2–S4 payload parsers with fake provider payloads — mirrors the
  * reference's mocked-HTTP tests (/root/reference/tests/test_ingest.py,
  * test_alpha_vantage.py): key-spelling alternates, date normalization,
  * rate-limit surfacing, last-non-null-close backward scan.
  */
class IngestSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("alpha vantage quote: canonical keys, date-only → T00:00:00Z") {
    val payload =
      """{"Global Quote": {"01. symbol": "IBM", "05. price": "212.5",
        |"07. latest trading day": "2024-03-01"}}""".stripMargin
    val got = Ingest.parseAlphaVantageQuote(Seq(payload).toDF("payload"))
      .collect()(0)
    assert(got.getAs[String]("symbol") === "IBM")
    assert(got.getAs[Double]("price") === 212.5)
    assert(got.getAs[java.sql.Timestamp]("as_of").toString ===
      "2024-03-01 00:00:00.0")
    assert(got.isNullAt(got.fieldIndex("error")))
  }

  test("alpha vantage quote: alternate camelCase key spelling") {
    val payload =
      """{"globalQuote": {"01_symbol": "MSFT", "05_price": "411.1",
        |"latestTradingDay": "2024-03-02"}}""".stripMargin
    val got = Ingest.parseAlphaVantageQuote(Seq(payload).toDF("payload"))
      .collect()(0)
    assert(got.getAs[String]("symbol") === "MSFT")
    assert(got.getAs[Double]("price") === 411.1)
  }

  test("alpha vantage quote: rate-limit Note surfaces in error column") {
    val payload = """{"Note": "Thank you for using Alpha Vantage! 5 calls"}"""
    val got = Ingest.parseAlphaVantageQuote(Seq(payload).toDF("payload"))
      .collect()(0)
    assert(got.getAs[String]("error").contains("Alpha Vantage"))
    assert(got.isNullAt(got.fieldIndex("price")))
  }

  test("fx parser: pair split, space→T timestamp, quote currency") {
    val payload =
      """{"Realtime Currency Exchange Rate": {
        |"5. Exchange Rate": "1.0845", "6. Last Refreshed": "2024-03-01 14:30:00"}}"""
        .stripMargin
    val got = Ingest.parseAlphaVantageFx(
      Seq(("EUR/USD", payload)).toDF("pair", "payload")).collect()(0)
    assert(got.getAs[String]("base") === "EUR")
    assert(got.getAs[String]("quote") === "USD")
    assert(got.getAs[String]("symbol") === "EURUSD")
    assert(got.getAs[Double]("price") === 1.0845)
    assert(got.getAs[String]("currency") === "USD")
    assert(got.getAs[java.sql.Timestamp]("as_of").toString ===
      "2024-03-01 14:30:00.0")
  }

  test("fx parser: missing timestamp falls back to current_timestamp") {
    val payload =
      """{"Realtime Currency Exchange Rate": {"5. Exchange Rate": "1.1"}}"""
    val got = Ingest.parseAlphaVantageFx(
      Seq(("EURUSD", payload)).toDF("pair", "payload")).collect()(0)
    assert(!got.isNullAt(got.fieldIndex("as_of")))
  }

  test("yahoo parser: last NON-NULL close wins (yahoo.py:33-38)") {
    val payload =
      """{"chart": {"result": [{
        |  "meta": {"symbol": "EURUSD=X", "currency": "USD"},
        |  "timestamp": [1700000000, 1700000060, 1700000120],
        |  "indicators": {"quote": [{"close": [1.07, 1.08, null]}]}}]}}"""
        .stripMargin
    val got = Ingest.parseYahooChart(Seq(payload).toDF("payload"))
      .collect()(0)
    assert(got.getAs[String]("symbol") === "EURUSD=X")
    assert(got.getAs[Double]("price") === 1.08) // skips trailing null
    assert(got.getAs[java.sql.Timestamp]("as_of").getTime / 1000 ===
      1700000060L)
    assert(got.getAs[String]("currency") === "USD")
  }

  test("seedPrices: deterministic random-walk fixture (seed_demo.py)") {
    val a = Ingest.seedPrices(spark, Seq("EURUSD" -> 1.1, "AAPL" -> 190.0),
      nPoints = 5)
    val b = Ingest.seedPrices(spark, Seq("EURUSD" -> 1.1, "AAPL" -> 190.0),
      nPoints = 5)
    assert(a.count() === 10)
    assert(a.orderBy("id").collect().toSeq ===
      b.orderBy("id").collect().toSeq) // reproducible
    assert(a.select("symbol").distinct().count() === 2)
  }

  test("news source: symbol appends a synthesized row (app/main.py:638-643)") {
    assert(Ingest.news(spark, None).count() === 2)
    val withSym = Ingest.news(spark, Some("EURUSD"))
    assert(withSym.count() === 3)
    assert(withSym.filter($"title".contains("EURUSD")).count() === 1)
  }
}
