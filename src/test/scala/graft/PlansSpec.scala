package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Series
import graft.pipelines.Plans

/** P2 strategies, P3 plan text, P7 insights demo summary. */
class PlansSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(i: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00")

  private def series(vals: Double*) =
    vals.zipWithIndex.map { case (v, i) => (i.toLong, "K", ts(i), v) }
      .toDF("id", "k", "t", "v")

  test("altStrategies: rising series yields long pullback + momentum") {
    val df = series((1 to 60).map(i => 100.0 + i * 0.5): _*)
    val got = Series.altStrategies(df, "k", $"t", $"id", $"v", lit(1.0))
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(got.contains(("trend_pullback", "Long")))
    assert(got.contains(("momentum", "Long")))
    assert(got.contains(("range_breakout", "Long")))
    assert(got.contains(("range_breakout", "Short")))
    assert(!got.contains(("trend_pullback", "Short")))
  }

  test("altStrategies: falling series mirrors short; levels use ATR algebra") {
    val df = series((1 to 60).map(i => 200.0 - i * 0.5): _*)
    val rows = Series.altStrategies(df, "k", $"t", $"id", $"v", lit(2.0))
      .collect().map(r => (r.getString(1), r.getString(2)) -> r).toMap
    val mom = rows(("momentum", "Short"))
    val last = 200.0 - 60 * 0.5
    assert(mom.getAs[Double]("entry") === last + 2.0)
    assert(mom.getAs[Double]("stop") === last + 6.0)
    assert(mom.getAs[Double]("target") === last - 6.0)
  }

  test("entryPlanText: bullish narrative includes OTE zone and stops") {
    val df = series((1 to 25).map(_ * 1.0): _*)
    val ict = Series.analyzeICT(df, "k", $"t", $"id", $"v")
    val plan = Plans.entryPlanText(ict, "k").select("plan")
      .as[String].collect().head
    assert(plan.startsWith("Symbol: K\nBias: bullish | PD Array: premium"))
    assert(plan.contains("OTE zone: 15.88 - 19.96"))
    assert(plan.contains("sweep of sell-side liquidity"))
    assert(plan.contains("Stop: below recent swing low 1.0"))
    assert(plan.contains("Killzones (EST)"))
  }

  test("insightsDemoSummary matches the reference fallback contract") {
    val df = Seq(("EURUSD", "intraday", Some("watch CPI"), true),
      ("AAPL", "swing", None, false))
      .toDF("sym", "horizon", "notes", "img")
    val got = df.select(Plans.insightsDemoSummary($"sym", $"horizon",
      $"notes", $"img")).as[String].collect()
    assert(got(0) === "[Demo] Provide a intraday view for EURUSD with " +
      "risks and potential trade setups. watch CPI" +
      "\n\nNote: Set OPENAI_API_KEY to enable live GPT insights." +
      "\n\n[Note] Vision inputs not processed in demo mode.")
    assert(got(1) === "[Demo] Provide a swing view for AAPL with risks " +
      "and potential trade setups." +
      "\n\nNote: Set OPENAI_API_KEY to enable live GPT insights.")
  }

  test("journalCoachPrompt embeds stats and a JSON trade sample") {
    val stats = Seq((3L, 2L, 67.0, 12.5, 0.8))
      .toDF("n", "wins", "winrate", "total_pnl", "avg_r")
    val trades = Seq(("EURUSD", "Long", 1.0)).toDF("symbol", "direction",
      "qty")
    val p = Plans.journalCoachPrompt(stats, trades,
      Plans.tradeJson(Seq("symbol", "direction"), Seq("qty")))
      .as[String].collect().head
    assert(p.contains("n=3") && p.contains("winrate=67.0"))
    assert(p.contains("{\"symbol\":\"EURUSD\",\"direction\":\"Long\",\"qty\":1.0}"))
    assert(p.endsWith("Give 3 concrete improvements and 1 strength."))
  }
}
