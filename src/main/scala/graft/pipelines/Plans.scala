package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P3/P4/P7 — text-assembly pipelines: the ICT entry-plan narrative, the
  * journal-coach prompt, and the env-gated insights call's demo path.
  * All pure column expressions (concat/format) so plan generation is a
  * scan-side projection at any scale.
  */
object Plans {

  /** 4-decimal price formatting, cross-engine stable: quantize to 1e-4 in
    * integer space, then render the double.
    */
  def fmtPrice(x: Column): Column =
    (round(x * 10000).cast("long") / 10000.0).cast("string")

  /** P3 — `buildEntryPlan` narrative
    * (/root/reference/static/main.js:413-472) from the P1 ICT columns
    * (`bias`, `premium`, `mid`, `ote_62`, `ote_79`, `lo`, `hi`): bias
    * line, OTE zone, bias-dependent entry/stop/target narrative, risk
    * guidance, killzones.
    */
  def entryPlanText(ict: DataFrame, key: String): DataFrame = {
    val oteRange =
      concat(fmtPrice(col("ote_62")), lit("-"), fmtPrice(col("ote_79")))
    val bull = concat_ws("\n",
      concat(lit("Entry: wait for a sweep of sell-side liquidity, " +
        "displacement up, then refine entry in OTE ("), oteRange,
        lit(")")),
      concat(lit("Stop: below recent swing low "), fmtPrice(col("lo")),
        lit(" (beyond liquidity).")),
      concat(lit("Targets: take buy-side liquidity at "),
        fmtPrice(col("hi")), lit(" and partials at CE/previous highs.")))
    val bear = concat_ws("\n",
      concat(lit("Entry: wait for a sweep of buy-side liquidity, " +
        "displacement down, then refine entry in OTE ("), oteRange,
        lit(")")),
      concat(lit("Stop: above recent swing high "), fmtPrice(col("hi")),
        lit(" (beyond liquidity).")),
      concat(lit("Targets: take sell-side liquidity at "),
        fmtPrice(col("lo")), lit(" and partials at CE/previous lows.")))
    val neutral = concat(
      lit("Bias unclear: wait for a market structure shift and " +
        "displacement before engaging. Use OTE "), oteRange,
      lit(" once bias forms."))

    ict.select(col(key),
      concat_ws("\n",
        concat(lit("Symbol: "), col(key)),
        concat(lit("Bias: "), col("bias"), lit(" | PD Array: "),
          when(col("premium"), lit("premium")).otherwise(lit("discount")),
          lit(" (mid "), fmtPrice(col("mid")), lit(")")),
        concat(lit("OTE zone: "), fmtPrice(col("ote_62")), lit(" - "),
          fmtPrice(col("ote_79")), lit(" (62-79% of last impulse)")),
        when(col("bias") === "bullish", bull)
          .when(col("bias") === "bearish", bear)
          .otherwise(neutral),
        lit("Risk: 0.5-1.0% per idea; partials at 1R/2R; move stop to " +
          "breakeven after liquidity take."),
        lit("Killzones (EST): London 2:00-5:00 | NY 7:00-10:00 " +
          "(news-sensitive around 8:30).")).as("plan"))
  }

  /** P7 — insights call, demo path (/root/reference/app/main.py:684-688):
    * prompt template + the exact demo-mode fallback summary when no API
    * key is configured (the live HTTP call stays outside the engine,
    * like the reference's mocked tests).
    */
  def insightsPrompt(symbol: Column, horizon: Column,
                     notes: Column): Column =
    trim(concat(lit("Provide a "), horizon, lit(" view for "), symbol,
      lit(" with risks and potential trade setups. "),
      coalesce(notes, lit(""))))

  def insightsDemoSummary(symbol: Column, horizon: Column, notes: Column,
                          hasImages: Column): Column =
    concat(lit("[Demo] "), insightsPrompt(symbol, horizon, notes),
      lit("\n\nNote: Set OPENAI_API_KEY to enable live GPT insights."),
      when(hasImages, lit("\n\n[Note] Vision inputs not processed in " +
        "demo mode.")).otherwise(lit("")))

  /** X6 — `parseLevelsFromText` (/root/reference/static/main.js:474-492):
    * split plan text on newline/period/semicolon (yes, a literal '.'
    * splits decimals — faithfully reproduced), take each line's FIRST
    * number, and label by keyword. Assignment order semantics: the last
    * keyword line wins per label, except `risk` only sets `stop` when no
    * `stop` line exists anywhere (the reference's sequential
    * `!levels.stop` guard collapses to: stop-lines win; else first
    * risk-line).
    */
  def parseLevels(df: DataFrame, idCol: String, text: Column): DataFrame = {
    val lines = df.select(col(idCol),
      posexplode(split(text, "\n|\\.|;")).as(Seq("pos", "line")))
    val raw = regexp_extract(col("line"), "([0-9]+(\\.[0-9]+)?)", 1)
    val staged = lines
      .withColumn("num", when(length(raw) > 0, raw.cast("double")))
      .withColumn("t", lower(col("line")))
    val hasNum = col("num").isNotNull
    def lastWhere(cond: Column) =
      max(when(hasNum && cond, struct(col("pos"), col("num"))))
        .getField("num")
    def firstWhere(cond: Column) =
      min(when(hasNum && cond, struct(col("pos"), col("num"))))
        .getField("num")
    val t = col("t")
    staged.groupBy(col(idCol)).agg(
      lastWhere(t.contains("entry")).as("entry"),
      coalesce(lastWhere(t.contains("stop")),
        firstWhere(t.contains("risk"))).as("stop"),
      lastWhere(t.contains("target") || t.contains("tp")).as("target"),
      lastWhere(t.contains("resistance")).as("resistance"),
      lastWhere(t.contains("support")).as("support"))
  }

  /** Deterministic JSON object for one trade: string fields quoted, the
    * numeric field rendered by the engine's double→string cast (identical
    * shortest-repr in Spark and DuckDB). `to_json` is NOT used — its
    * struct formatting is engine-specific, which would make the coach
    * prompt unverifiable against the SQL oracle.
    */
  def tradeJson(strCols: Seq[String], numCols: Seq[String]): Column = {
    val parts =
      strCols.map(c => concat(lit("\"" + c + "\":\""), col(c), lit("\""))) ++
        numCols.map(c => concat(lit("\"" + c + "\":"), col(c).cast("string")))
    concat(lit("{"), concat_ws(",", parts: _*), lit("}"))
  }

  /** P4 — journal-coach prompt (/root/reference/static/main.js:1131-1144):
    * summary stats + a JSON-packed sample of trades. `tradeJsonCol` is the
    * per-trade JSON (see [[tradeJson]]); trades must arrive deterministic-
    * ordered (single sorted partition) for a stable packed list.
    */
  def journalCoachPrompt(stats: DataFrame, trades: DataFrame,
                         tradeJsonCol: Column): DataFrame = {
    val packed = trades
      .select(tradeJsonCol.as("_j"))
      .agg(concat_ws(",", collect_list(col("_j"))).as("_trades"))
    stats.crossJoin(packed).select(
      concat(
        lit("You are a trading performance coach. Stats: n="), col("n"),
        lit(", wins="), col("wins"), lit(", winrate="), col("winrate"),
        lit("%, totalPnL="), col("total_pnl"), lit(", avgR="),
        col("avg_r"),
        lit(". Trades: ["), col("_trades"), lit("]"),
        lit(" Give 3 concrete improvements and 1 strength.")).as("prompt"))
  }
}
