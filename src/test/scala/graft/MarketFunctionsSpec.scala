package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MarketFunctions._

/** X1–X15 scalar algebra — unit cases mirroring the reference's JS
  * (/root/reference/static/main.js:901-916, 41-47, 230) plus
  * property checks from SURVEY.md §5 (Long/Short symmetry, fee
  * monotonicity, zero-risk guard) over a seeded random sample.
  */
class MarketFunctionsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def onerow(cols: org.apache.spark.sql.Column*): Seq[Any] =
    Seq(1).toDF("x").select(cols: _*).collect()(0).toSeq

  test("pnl: Long vs Short, fees subtracted, nulls coerce to 0") {
    val rows = Seq(
      ("Long", 2.0, 10.0, Some(15.0), 1.0, 9.0),   // (15-10)*2 - 1
      ("Short", 2.0, 10.0, Some(15.0), 1.0, -11.0), // (10-15)*2 - 1
      ("Long", 3.0, 10.0, None, 0.5, -30.5))        // exit null -> 0
    val df = rows.toDF("direction", "qty", "entry", "exit", "fees", "expect")
    val got = df.select(
      pnl($"direction", $"qty", $"entry", $"exit", $"fees").as("pnl"),
      $"expect").collect()
    got.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("pnl property: short gross mirrors long gross; fees monotone") {
    val rng = new scala.util.Random(42)
    val sample = Seq.fill(200)((rng.nextDouble() * 100 + 0.5,
      rng.nextDouble() * 500 + 1, rng.nextDouble() * 500 + 1,
      rng.nextDouble() * 10))
    val df = sample.toDF("qty", "entry", "exit", "fees")
    val rows = df.select($"fees",
      pnl(lit("Long"), $"qty", $"entry", $"exit", $"fees"),
      pnl(lit("Short"), $"qty", $"entry", $"exit", $"fees"),
      pnl(lit("Long"), $"qty", $"entry", $"exit", $"fees" + 1.0)).collect()
    rows.foreach { r =>
      val (f, long, short, longMoreFees) =
        (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(math.abs((long + f) + (short + f)) < 1e-9) // gross symmetry
      assert(longMoreFees < long)
    }
  }

  test("rMultiple: zero risk (entry==stop or qty==0) yields 0") {
    val r0 = onerow(rMultiple(lit(5.0), lit(10.0), lit(10.0), lit(2.0)))
    val r1 = onerow(rMultiple(lit(5.0), lit(10.0), lit(9.0), lit(0.0)))
    val r2 = onerow(rMultiple(lit(5.0), lit(10.0), lit(9.0), lit(2.0)))
    assert(r0.head === 0.0 && r1.head === 0.0)
    assert(r2.head === 5.0 / (1.0 * 2.0))
  }

  test("scoreImpact: reference keyword tiers (app/main.py:645-653)") {
    val df = Seq("CPI inflation shock", "Retail PMI beats", "quiet day")
      .toDF("title")
    assert(df.select(scoreImpact($"title")).as[String].collect().toSeq ===
      Seq("High", "Medium", "Low"))
  }

  test("priceDecimals / atrGuess class routing (main.js:41-47,230)") {
    val df = Seq("USDJPY", "XAUUSD", "EURUSD", "AAPL").toDF("s")
    assert(df.select(priceDecimals($"s")).as[Int].collect().toSeq ===
      Seq(3, 2, 5, 4))
    assert(df.select(atrGuess($"s")).as[Double].collect().toSeq ===
      Seq(0.3, 10.0, 0.005, 0.005))
  }

  test("pair parse strips slash and splits 3+3 (alpha_vantage_fx.py:9-13)") {
    val df = Seq("eur/usd", "GBPJPY").toDF("p")
    assert(df.select(pairBase($"p"), pairQuote($"p")).as[(String, String)]
      .collect().toSeq === Seq(("EUR", "USD"), ("GBP", "JPY")))
  }

  test("isFxLike matches 6-letter and XxxUSD metals (main.js:636)") {
    val df = Seq("EURUSD", "XAGUSD", "AAPL", "eurusd").toDF("s")
    assert(df.select(isFxLike($"s")).as[Boolean].collect().toSeq ===
      Seq(true, true, false, false))
  }

  test("email normalization + validity (app/main.py:436-438)") {
    val df = Seq("  Bob@Example.COM ", "nope").toDF("e")
    assert(df.select(normalizeEmail($"e"), isValidEmail($"e"))
      .as[(String, Boolean)].collect().toSeq ===
      Seq(("bob@example.com", true), ("nope", false)))
  }

  test("tagBadges splits, trims, drops empties (main.js:958)") {
    val df = Seq(" swing, breakout ,,fx ").toDF("t")
    assert(df.select(tagBadges($"t")).as[Seq[String]].collect().head ===
      Seq("swing", "breakout", "fx"))
  }

  test("sixDigitCode is 6 digits and deterministic per seed") {
    val df = Seq("a@x.com", "a@x.com", "b@y.org").toDF("s")
    val codes = df.select(sixDigitCode($"s")).as[String].collect()
    assert(codes.forall(_.matches("^\\d{6}$")))
    assert(codes(0) === codes(1))
  }

  test("contentSignature shape symbol|date16|direction|entry|exit") {
    val df = Seq(("EURUSD", java.sql.Timestamp.valueOf("2024-01-05 08:36:11"),
      "Long", 1.1, 1.2)).toDF("s", "d", "dir", "en", "ex")
    val sig = df.select(contentSignature($"s", $"d", $"dir", $"en", $"ex"))
      .as[String].collect().head
    assert(sig === "EURUSD|2024-01-05T08:36|Long|1.1|1.2")
  }

  test("md5Hash60/48 stable known value") {
    // md5("abc") = 900150983cd24fb0d6963f7d28e17f72
    val h60 = onerow(md5Hash60(lit("abc"))).head.asInstanceOf[Long]
    val h48 = onerow(md5Hash48(lit("abc"))).head.asInstanceOf[Long]
    assert(h60 === java.lang.Long.parseLong("900150983cd24fb", 16))
    assert(h48 === java.lang.Long.parseLong("900150983cd2", 16))
  }
}
