package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar-function library — SURVEY.md §2.10 (X1–X16). Every function is a
  * pure `Column => Column` built from `org.apache.spark.sql.functions._`
  * so it stays inside whole-stage codegen (no UDFs, no serialization
  * boundaries) — the whole library is a set of Catalyst expression trees.
  */
object MarketFunctions {

  /** X1 — trade PnL (reference: /root/reference/static/main.js:901-908).
    * Long: (exit-entry)*qty − fees; Short: (entry-exit)*qty − fees.
    * Null inputs coerce to 0 as in the JS `Number(...) || 0` idiom.
    */
  def pnl(direction: Column, qty: Column, entry: Column, exit: Column,
          fees: Column): Column = {
    val q = coalesce(qty, lit(0.0))
    val en = coalesce(entry, lit(0.0))
    val ex = coalesce(exit, lit(0.0))
    val f = coalesce(fees, lit(0.0))
    val gross = when(direction === "Long", (ex - en) * q)
      .otherwise((en - ex) * q)
    gross - f
  }

  /** X2 — R-multiple (reference: /root/reference/static/main.js:909-916).
    * pnl / (|entry−stop|·|qty|); 0 when per-unit or total risk is 0.
    */
  def rMultiple(pnlCol: Column, entry: Column, stop: Column,
                qty: Column): Column = {
    val risk = abs(coalesce(entry, lit(0.0)) - coalesce(stop, lit(0.0)))
    val total = risk * abs(coalesce(qty, lit(0.0)))
    when(risk === 0.0 || total === 0.0, lit(0.0)).otherwise(pnlCol / total)
  }

  /** Reference keyword sets for impact scoring
    * (/root/reference/app/main.py:645-653).
    */
  val HighImpactKeywords: Seq[String] = Seq(
    "nfp", "nonfarm", "cpi", "inflation", "fomc", "rate", "ecb", "fed",
    "gdp", "payrolls")
  val MediumImpactKeywords: Seq[String] = Seq(
    "pmi", "retail", "claims", "confidence", "ppi", "ifo")

  /** X3 — keyword impact classifier (High/Medium/Low). Keyword lists are
    * parameters; defaults are the reference's macro-news terms.
    */
  def scoreImpact(title: Column,
                  high: Seq[String] = HighImpactKeywords,
                  medium: Seq[String] = MediumImpactKeywords): Column = {
    def anyOf(words: Seq[String]): Column =
      words.map(w => lower(title).contains(w)).reduce(_ || _)
    when(anyOf(high), lit("High"))
      .when(anyOf(medium), lit("Medium"))
      .otherwise(lit("Low"))
  }

  /** X4 — display decimals by symbol class
    * (/root/reference/static/main.js:41-47): JPY→3, XA→2, 6-letter FX→5,
    * else 4.
    */
  def priceDecimals(symbol: Column): Column =
    when(symbol.endsWith("JPY"), lit(3))
      .when(symbol.startsWith("XA"), lit(2))
      .when(length(symbol) === 6, lit(5))
      .otherwise(lit(4))

  /** X5 — FX pair parse (/root/reference/ingest/alpha_vantage_fx.py:9-13):
    * strip '/', upper-case; base = chars 1-3, quote = chars 4-6.
    */
  def normalizePair(pair: Column): Column =
    upper(regexp_replace(pair, "/", ""))
  def pairBase(pair: Column): Column = substring(normalizePair(pair), 1, 3)
  def pairQuote(pair: Column): Column = substring(normalizePair(pair), 4, 3)

  /** X7 — canonical ISO-8601 UTC output form (reference stores ISO text,
    * /root/reference/app/db.py:280-282).
    */
  def isoUtc(ts: Column): Column =
    date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")

  /** X8 — timezone chips (/root/reference/static/main.js:125-137): wall
    * clock HH:mm in a target zone.
    */
  def tzChip(ts: Column, zone: String): Column =
    date_format(from_utc_timestamp(ts, zone), "HH:mm")

  /** X9 — date + day-of-week extraction
    * (/root/reference/static/main.js:144-159).
    */
  def isoDate(ts: Column): Column = date_format(ts, "yyyy-MM-dd")
  def dayName(ts: Column): Column = date_format(ts, "E")

  /** X10 — per-class volatility guess
    * (/root/reference/static/main.js:230).
    */
  def atrGuess(symbol: Column): Column =
    when(symbol.endsWith("JPY"), lit(0.3))
      .when(symbol.startsWith("XA"), lit(10.0))
      .otherwise(lit(0.005))

  /** X11 — journal content signature
    * (/root/reference/static/main.js:854,893):
    * symbol|date[:16]|direction|entry|exit.
    */
  def contentSignature(symbol: Column, date: Column, direction: Column,
                       entry: Column, exit: Column): Column =
    concat_ws("|", symbol, substring(isoUtc(date), 1, 16), direction,
      entry.cast("string"), exit.cast("string"))

  /** X13 — tags → badge list (/root/reference/static/main.js:958):
    * split on ',', trim, drop empties.
    */
  def tagBadges(tags: Column): Column =
    filter(transform(split(tags, ","), t => trim(t)), t => t =!= "")

  /** X14 — email normalization (/root/reference/app/main.py:436-438). */
  def normalizeEmail(email: Column): Column = lower(trim(email))
  def isValidEmail(email: Column): Column =
    normalizeEmail(email).contains("@")

  /** X15 — 6-digit sign-in code (/root/reference/app/main.py:439).
    * Deterministic variant takes a seed column for testability. Derived
    * from the 48-bit md5 prefix (always non-negative — murmur `hash()`
    * could return Int.MinValue whose abs stays negative) so the DuckDB
    * oracle reproduces the code bit-for-bit.
    */
  def sixDigitCode(seed: Column): Column =
    lpad((md5Hash48(seed) % 1000000).cast("string"), 6, "0")

  /** F9 — FX-like symbol classifier
    * (/root/reference/static/main.js:636,1194).
    */
  def isFxLike(symbol: Column): Column =
    symbol.rlike("^[A-Z]{6}$") || symbol.rlike("^X[A-Z]{2}USD$")

  /** Deterministic 60-bit content hash shared with the DuckDB oracle:
    * the first 15 hex digits of md5, parsed base-16. Used wherever the
    * engine and the oracle must agree on a hash value (dedup keys,
    * minhash permutations, fingerprints).
    */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 48-bit md5 prefix — small enough that division by powers of two is
    * exact in IEEE double, which SimHash bit extraction relies on.
    */
  def md5Hash48(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")
}
