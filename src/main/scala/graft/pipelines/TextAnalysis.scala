package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.MarketFunctions.{md5Hash48, md5Hash60}

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, n-gram language ID, and document
  * fingerprinting. All pure column expressions (codegen-friendly, no
  * UDFs) over a `text` column, so a 100 TB corpus processes as a single
  * scan-project with no shuffle.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column =
    size(filter(split(text, "\\s+"), t => t =!= ""))

  /** BPE-ish token count: word pieces + digits + punctuation as separate
    * tokens (regex approximation of a byte-pair tokenizer's pre-split).
    */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"),
      lit(0)))

  /** Character class matching the no-whitespace CJK scripts — Hiragana +
    * Katakana, CJK Unified (+ Ext A), Hangul syllables. `\x{...}` hex
    * escapes parse identically in Java's engine and the oracle's RE2, so
    * the SAME string serves both sides. One CJK code point ≈ one word
    * for gating purposes (see [[qualityRules]]).
    */
  val CjkClass: String =
    "[\\x{3040}-\\x{30FF}\\x{3400}-\\x{4DBF}" +
      "\\x{4E00}-\\x{9FFF}\\x{AC00}-\\x{D7A3}]"

  /** Script → character-class table for the script-ratio features (the
    * multilingual-crawl audit columns: a document's dominant script is
    * the cheapest routing signal there is — it needs no model, no token
    * table, and shortcuts language-ID for non-Latin text). Portable
    * `\x{...}` ranges, shared verbatim with the DuckDB oracle.
    */
  val ScriptClasses: Seq[(String, String)] = Seq(
    "han" -> "[\\x{3400}-\\x{4DBF}\\x{4E00}-\\x{9FFF}]",
    "kana" -> "[\\x{3040}-\\x{30FF}]",
    "hangul" -> "[\\x{AC00}-\\x{D7A3}]",
    "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
    "arabic" -> "[\\x{0600}-\\x{06FF}]")

  /** Per-script code-point fractions: one `<script>_ratio` column per
    * [[ScriptClasses]] entry (0.0 on empty text). One counting regex
    * pass per script, all scan-side — no shuffle, no UDF.
    */
  def scriptRatios(df: DataFrame, text: Column): DataFrame = {
    val nChars = length(text)
    ScriptClasses.foldLeft(df) { case (acc, (scriptName, cls)) =>
      acc.withColumn(s"${scriptName}_ratio",
        when(nChars > 0,
          round(size(regexp_extract_all(text, lit(cls), lit(0)))
            / nChars.cast("double"), 6))
          .otherwise(0.0))
    }
  }

  /** Quality signals: length, alpha ratio, punctuation ratio, stopword
    * ratio, mean word length — the standard cheap pre-filter features for
    * corpus curation.
    */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

  /** All char/word counters in one compiled pass (see
    * [[graft.expressions.TextSketches.TextStats]]):
    * `[n_words, n_chars, n_alpha, n_punct, tok_bpe]`. The repeated
    * `element_at` extractions share the single underlying scan via
    * codegen subexpression elimination.
    */
  def textCounts(text: Column): Column =
    call_function("graft_text_stats", text)

  /** Words whose lowercase form is in `set` — one compiled pass (see
    * [[graft.expressions.TextSketches.WordHits]]).
    */
  def wordHits(text: Column, set: Seq[String]): Column =
    call_function("graft_word_hits", text, array(set.map(lit(_)): _*))

  def qualityFeatures(df: DataFrame, text: Column): DataFrame = {
    graft.expressions.GraftFunctions.register(df.sparkSession)
    val st = textCounts(text)
    val nWords = element_at(st, 1)
    val nChars = element_at(st, 2)
    val nAlpha = element_at(st, 3)
    val nPunct = element_at(st, 4)
    val stopHits = wordHits(text, Stopwords)
    df.withColumn("n_words", nWords)
      .withColumn("alpha_ratio",
        when(nChars > 0, round(nAlpha / nChars.cast("double"), 6))
          .otherwise(0.0))
      .withColumn("punct_ratio",
        when(nChars > 0, round(nPunct / nChars.cast("double"), 6))
          .otherwise(0.0))
      .withColumn("stopword_ratio",
        when(nWords > 0, round(stopHits / nWords.cast("double"), 6))
          .otherwise(0.0))
      .withColumn("mean_word_len",
        when(nWords > 0,
          round((nChars - nWords + 1) / nWords.cast("double"), 6))
          .otherwise(0.0))
  }

  /** Declarative twin of [[qualityFeatures]] — pure `functions._`
    * (interpreted HOFs, ~6× slower at sf0.1); kept as the readable
    * specification and for the native/declarative parity spec.
    */
  def qualityFeaturesDeclarative(df: DataFrame, text: Column): DataFrame = {
    val words = filter(split(text, "\\s+"), t => t =!= "")
    val nWords = size(words).cast("long")
    val nChars = length(text).cast("long")
    val nAlpha = length(regexp_replace(text, "[^A-Za-z]", "")).cast("long")
    val nPunct = length(regexp_replace(text, "[^.,;:!?]", "")).cast("long")
    val stopHits = size(filter(words,
      wrd => lower(wrd).isin(Stopwords.map(lit(_)): _*))).cast("long")
    df.withColumn("n_words", nWords)
      .withColumn("alpha_ratio",
        when(nChars > 0, round(nAlpha / nChars.cast("double"), 6))
          .otherwise(0.0))
      .withColumn("punct_ratio",
        when(nChars > 0, round(nPunct / nChars.cast("double"), 6))
          .otherwise(0.0))
      .withColumn("stopword_ratio",
        when(nWords > 0, round(stopHits / nWords.cast("double"), 6))
          .otherwise(0.0))
      .withColumn("mean_word_len",
        when(nWords > 0,
          round((nChars - nWords + 1) / nWords.cast("double"), 6))
          .otherwise(0.0))
  }

  /** Composite [0,1] quality score from the features above. Accumulated
    * in integer micro-units (term-wise round to 1e-6, weights 0.4/0.3/0.3
    * as 4/3/3 over 1e7) so the result is bit-identical across engines —
    * a float-sum-then-round would differ in the last ulp at .5 boundaries.
    */
  def qualityScore(df: DataFrame, text: Column): DataFrame =
    qualityFeatures(df, text).withColumn("quality",
      (round(least(lit(1.0), col("n_words") / 100.0) * 1e6).cast("long") * 4
        + round(col("alpha_ratio") * 1e6).cast("long") * 3
        + round(least(lit(1.0), col("stopword_ratio") * 5.0) * 1e6)
            .cast("long") * 3) / 1e7)

  /** Rule-based document gate — the Gopher/C4-style curation filter
    * (Rae et al. 2021 §A1.1 "quality filtering" heuristics, re-expressed
    * as one scan-side projection): word-count bounds, mean-word-length
    * bounds, symbol-to-word ratio ("#"/"..." stuffing), a minimum
    * stopword presence (gibberish/navigation pages carry none), and the
    * structural-repetition trio (duplicate-line fraction,
    * duplicate-paragraph fraction, top-bigram character fraction). Emits
    * the measured features, one boolean per rule, and the conjunction
    * `keep` — keeping flags rather than filtering in place is what lets
    * a curation run audit WHICH rule dropped a document. All features
    * ride the one-pass compiled [[textCounts]]/[[wordHits]]
    * expressions, so a 100 TB corpus pays a single scan and no shuffle.
    *
    * CJK-safe: `n_words` counts whitespace tokens, which on Chinese/
    * Japanese/Korean text is ≈1 per paragraph — an English-tuned gate
    * would silently discard essentially all CJK content in a
    * multilingual crawl. Instead, the unit count `n_units = n_words +
    * n_cjk` treats each CJK code point as one word-like unit (the same
    * compiled pass supplies both counters), `pass_words` and the symbol
    * denominator use units, and the three Latin-specific rules
    * (mean word length, English stopwords, alpha-word fraction) are
    * bypassed when `cjk_ratio ≥ cjkRatioMin` — the per-language
    * re-tuning a multilingual pipeline would plug in per shard. The
    * emitted `cjk_ratio` column keeps the routing auditable.
    */
  def qualityRules(df: DataFrame, text: Column,
                   minWords: Int = 50, maxWords: Int = 100000,
                   minMeanWordLen: Double = 3.0,
                   maxMeanWordLen: Double = 10.0,
                   maxSymbolRatio: Double = 0.1,
                   minStopHits: Int = 2,
                   maxBulletRatio: Double = 0.9,
                   maxEllipsisRatio: Double = 0.3,
                   minAlphaWordRatio: Double = 0.8,
                   maxRepetition: Double = 0.3,
                   repWindow: Int = 3,
                   stops: Seq[String] = Stopwords,
                   cjkRatioMin: Double = 0.3,
                   maxDupLineFrac: Double = 0.3,
                   maxDupParaFrac: Double = 0.3,
                   maxTopBigramFrac: Double = 0.2): DataFrame = {
    graft.expressions.GraftFunctions.register(df.sparkSession)
    val st = textCounts(text)
    val nWords = element_at(st, 1)
    val nChars = element_at(st, 2)
    val nCjk = element_at(st, 6)
    val nUnits = nWords + nCjk
    val cjkRatio = when(nChars > 0,
      round(nCjk / nChars.cast("double"), 6)).otherwise(0.0)
    val isCjk = cjkRatio >= cjkRatioMin
    val meanWl = when(nWords > 0,
      round((nChars - nWords + 1) / nWords.cast("double"), 6))
      .otherwise(0.0)
    val symbols =
      size(regexp_extract_all(text, lit("#|\\.\\.\\.|…"), lit(0)))
    val symRatio = when(nUnits > 0,
      round(symbols / nUnits.cast("double"), 6)).otherwise(1.0)
    val stopHits = wordHits(text, stops)
    // line-shape rules (Gopher's formatting heuristics): lines counted
    // with a -1 split limit (trailing empties survive → denominator is
    // the true line count); bullet/ellipsis hits counted by (?m)
    // multiline regex — explicit [ \t] classes, not \s, so Java and the
    // oracle's RE2 agree on every span. Non-\n line terminators are
    // stripped first: Java's (?m) anchors fire around \r, U+0085
    // (NEL), U+2028 (LS) and U+2029 (PS) while RE2's fire only at \n,
    // so texts carrying any of them would otherwise count differently
    // in the two engines
    val lineText =
      regexp_replace(text, "[\\r\\u0085\\u2028\\u2029]", "")
    val nLines = size(split(lineText, "\n", -1))
    val bulletHits = size(regexp_extract_all(lineText,
      lit("(?m)^[ \\t]*[-*•]"), lit(0)))
    val bulletRatio = round(bulletHits / nLines.cast("double"), 6)
    val ellipsisHits = size(regexp_extract_all(lineText,
      lit("(?m)(\\.\\.\\.|…)$"), lit(0)))
    val ellipsisRatio = round(ellipsisHits / nLines.cast("double"), 6)
    // fraction of words containing at least one alphabetic character —
    // the regex cannot cross whitespace, so its matches are exactly the
    // whitespace tokens with ≥1 alpha (same tokenization as n_words;
    // \x0B included because Java's \s+ split treats it as a separator)
    val alphaWords = size(regexp_extract_all(text,
      lit("[^ \\t\\n\\r\\f\\x0B]*[A-Za-z][^ \\t\\n\\r\\f\\x0B]*"), lit(0)))
    val alphaWordRatio = when(nWords > 0,
      round(alphaWords / nWords.cast("double"), 6)).otherwise(0.0)
    // duplicate-n-gram rule: rides the same compiled shingle-hash pass
    // as the standalone repetition operator (t9)
    val repRatio = repetitionRatio(text, repWindow)
    // Gopher's structural-repetition trio: the fraction of non-empty
    // lines (and of blank-line-separated paragraphs) that repeat an
    // earlier one — mirror/template pages — and the fraction of the
    // document's characters claimed by its single most frequent word
    // bigram (keyword stuffing). Both ride compiled one-pass
    // expressions ([[graft.expressions.TextSketches.DupStructure]] /
    // [[graft.expressions.TextSketches.TopShingleFreq]]): the
    // declarative split+filter+array_distinct form measured 2.5× the
    // whole gate's cost in interpreted HOF overhead at sf0.1
    val ds = call_function("graft_dup_structure", text)
    val nNeLines = element_at(ds, 1)
    val dupLineFrac = when(nNeLines > 0,
      round((nNeLines - element_at(ds, 2))
        / nNeLines.cast("double"), 6)).otherwise(0.0)
    val nParas = element_at(ds, 3)
    val dupParaFrac = when(nParas > 0,
      round((nParas - element_at(ds, 4))
        / nParas.cast("double"), 6)).otherwise(0.0)
    val topBg = call_function("graft_top_shingle", text, lit(2))
    val topBigramFrac = when(nChars > 0,
      least(lit(1.0), round(element_at(topBg, 1) * element_at(topBg, 2)
        / nChars.cast("double"), 6))).otherwise(0.0)
    df.withColumn("n_words", nWords)
      .withColumn("n_units", nUnits)
      .withColumn("cjk_ratio", cjkRatio)
      .withColumn("mean_word_len", meanWl)
      .withColumn("symbol_ratio", symRatio)
      .withColumn("stop_hits", stopHits)
      .withColumn("bullet_ratio", bulletRatio)
      .withColumn("ellipsis_ratio", ellipsisRatio)
      .withColumn("alpha_word_ratio", alphaWordRatio)
      .withColumn("rep_ratio", repRatio)
      .withColumn("dup_line_frac", dupLineFrac)
      .withColumn("dup_para_frac", dupParaFrac)
      .withColumn("top_bigram_frac", topBigramFrac)
      .withColumn("pass_words",
        nUnits >= minWords && nUnits <= maxWords)
      .withColumn("pass_word_len",
        isCjk || (meanWl >= minMeanWordLen && meanWl <= maxMeanWordLen))
      .withColumn("pass_symbols", symRatio <= maxSymbolRatio)
      .withColumn("pass_stops", isCjk || stopHits >= minStopHits)
      .withColumn("pass_bullets", bulletRatio <= maxBulletRatio)
      .withColumn("pass_ellipsis", ellipsisRatio <= maxEllipsisRatio)
      .withColumn("pass_alpha_words",
        isCjk || alphaWordRatio >= minAlphaWordRatio)
      .withColumn("pass_repetition", repRatio <= maxRepetition)
      .withColumn("pass_dup_lines", dupLineFrac <= maxDupLineFrac)
      .withColumn("pass_dup_paras", dupParaFrac <= maxDupParaFrac)
      .withColumn("pass_top_bigram", topBigramFrac <= maxTopBigramFrac)
      .withColumn("keep",
        col("pass_words") && col("pass_word_len") &&
          col("pass_symbols") && col("pass_stops") &&
          col("pass_bullets") && col("pass_ellipsis") &&
          col("pass_alpha_words") && col("pass_repetition") &&
          col("pass_dup_lines") && col("pass_dup_paras") &&
          col("pass_top_bigram"))
  }

  /** Language-ID by stopword-profile hit rate: score(text, lang) =
    * fraction of the language's marker words present. The marker lists
    * are parameters; real deployments plug in per-language n-gram
    * profiles — the operator shape (map over languages → arg-max) is the
    * scalable part.
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est"),
    "es" -> Seq("el", "la", "los", "que", "de", "es"))

  def languageId(df: DataFrame, text: Column,
                 markers: Map[String, Seq[String]] = LangMarkers)
      : DataFrame = {
    graft.expressions.GraftFunctions.register(df.sparkSession)
    val nWords = element_at(textCounts(text), 1)
    val scored = markers.toSeq.sortBy(_._1).map { case (langName, ms) =>
      val hits = wordHits(text, ms)
      struct(
        when(nWords > 0, round(hits / nWords.cast("double"), 6))
          .otherwise(0.0).as("score"),
        lit(langName).as("lang"))
    }
    // arg-max over languages; ties resolve to the lexically greatest
    // language name (deterministic).
    val best = greatest(scored: _*)
    df.withColumn("lang_pred", best.getField("lang"))
      .withColumn("lang_score", best.getField("score"))
  }

  /** Character-trigram profiles per language — the train-free n-gram
    * language-ID tables (Cavnar–Trenkle style, trimmed to the head of
    * each language's trigram frequency rank). Trigrams are over the
    * lowercased, whitespace-collapsed text, spaces included — the
    * word-boundary grams (" de", "en ") carry most of the signal.
    * Unlike the stopword profiles, these fire on short fragments and on
    * morphology ("sch", "cht", "ión") even when no function word is
    * present.
    */
  val LangTrigrams: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "he ", " th", "ing", "ng ", "and", "nd ", " an",
      " of", "of ", " to", "to ", "ed ", " in", "in ", "ion", " is",
      "is ", " it", "it ", "at ", "es ", "er ", " re", "re ", "on ",
      "ent", "tio", " a ", "or "),
    "de" -> Seq("en ", "er ", "der", " de", "ie ", "die", " di", "ch ",
      "sch", " sc", "ein", " ei", "ich", "und", " un", "cht", "ung",
      "gen", "ten", " ge", "das", " da", "ist", " is", "st ", "ber",
      "nde", "ne ", "ter", "hen"),
    "fr" -> Seq(" de", "de ", "es ", "le ", " le", "ent", "nt ", "la ",
      " la", "et ", " et", "ion", "que", " qu", "ue ", "re ", " re",
      "les", " co", "des", "ais", "ait", "eur", "our", " pa", "tio",
      "ns ", "on ", "ur ", "ite"),
    "es" -> Seq(" de", "de ", "os ", " la", "la ", "el ", " el", "en ",
      " en", "as ", "es ", " es", "que", " qu", "ue ", "ar ", " co",
      "ión", "ado", "los", " lo", "del", "ien", "nte", "con", " se",
      "ra ", "da ", "ció", " y "),
    // no-whitespace scripts profile on 1–2-char function grams instead
    // of space-boundary trigrams (there are no spaces to anchor on):
    // zh = the high-frequency hanzi function words; ja = the hiragana
    // particles/auxiliaries that wrap every sentence (kanji overlap
    // with zh is fine — the ja profile outscoring zh on kana is what
    // disambiguates); ru = ordinary Cyrillic trigrams, spaces included
    "zh" -> Seq("的", "是", "了", "在", "不", "有", "我", "他", "这",
      "中", "大", "上", "国", "个", "到", "们", "来", "时", "为", "和",
      "地", "年", "出", "就", "人", "也", "对", "能", "会", "说"),
    "ja" -> Seq("の", "に", "は", "を", "た", "が", "で", "て", "と",
      "し", "れ", "さ", "ある", "いる", "する", "から", "こと", "です",
      "ます", "した", "ない", "って", "など", "まで", "もの", "という",
      "られ", "その", "これ", "なっ"),
    "ru" -> Seq(" пр", " не", " на", " по", " в ", " и ", " с ", " то",
      " ко", " ра", " за", " об", "ого", "ени", "ост", "ств", "ать",
      "ние", "ет ", "ли ", "на ", "то ", "про", "ова", "ая ", "ый ",
      "ть ", "ния", "ных", "ции"))

  /** N-gram language ID: score(doc, lang) = fraction of the language's
    * profile trigrams present in the doc — arg-max over languages, ties
    * to the lexically greatest name. A profile trigram is "present" iff
    * it is a SUBSTRING of the normalized text, which is exactly
    * membership in the doc's trigram set but needs no trigram
    * materialization: the plan is ~120 codegen'd `Contains` probes per
    * row (literal needles, tight byte search), not a per-doc array
    * explode + 4 hash intersections (the array form measured 14s at
    * sf0.1; this form is sub-second). Scan-side, no shuffle. Robust
    * where [[languageId]]'s stopword profiles fail — short fragments
    * and texts that happen to avoid function words.
    */
  def languageIdNgram(df: DataFrame, text: Column,
                      profiles: Map[String, Seq[String]] = LangTrigrams)
      : DataFrame = {
    // null text coalesces to "" (score 0 everywhere) — a null would
    // otherwise propagate into the struct comparison, where Spark's
    // greatest and the oracle's CASE-over-greatest break ties
    // differently
    val s = regexp_replace(lower(trim(coalesce(text, lit("")))),
      "\\s+", " ")
    val scored = profiles.toSeq.sortBy(_._1).map { case (langName, grams) =>
      val prof = grams.distinct
      val hits = prof.map(g => s.contains(lit(g)).cast("int"))
        .reduce(_ + _)
      struct(
        round(hits / lit(prof.size.toDouble), 6).as("score"),
        lit(langName).as("lang"))
    }
    val best = greatest(scored: _*)
    df.withColumn("lang_pred", best.getField("lang"))
      .withColumn("lang_score", best.getField("score"))
  }

  /** The [[languageIdNgram]] scoring for one language rendered as
    * DuckDB SQL over normalized-text expression `s` — interpolated into
    * oracle twins so both engines share one profile table.
    */
  def langScoreSql(s: String, lang: String): String = {
    val prof = LangTrigrams(lang).distinct
    val arr = prof.map(g => s"'$g'").mkString("[", ", ", "]")
    // `+ 0.0` is the corpus-wide signed-zero normalization every
    // oracle round carries (here the ratio is non-negative anyway,
    // but the SparkEntrySpec guard is deliberately unconditional)
    s"(round(len(list_filter($arr, p -> contains($s, p))) / ${prof.size}.0, 6) + 0.0)"
  }

  /** Declarative twin of [[languageId]] — kept for the parity spec. */
  def languageIdDeclarative(df: DataFrame, text: Column,
                            markers: Map[String, Seq[String]] = LangMarkers)
      : DataFrame = {
    val words = filter(split(lower(text), "\\s+"), t => t =!= "")
    val scored = markers.toSeq.sortBy(_._1).map { case (langName, ms) =>
      val hits = size(filter(words, wrd => wrd.isin(ms.map(lit(_)): _*)))
      struct(
        when(size(words) > 0, round(hits / size(words).cast("double"), 6))
          .otherwise(0.0).as("score"),
        lit(langName).as("lang"))
    }
    val best = greatest(scored: _*)
    df.withColumn("lang_pred", best.getField("lang"))
      .withColumn("lang_score", best.getField("score"))
  }

  /** Unigram log-probability scoring — the perplexity-proxy quality
    * filter (what CCNet runs a KenLM for, reduced to the train-free
    * unigram case): score(doc) = mean over tokens of −ln p(word), with
    * p estimated from the corpus itself. Out-of-distribution documents
    * (gibberish, wrong language, boilerplate soup) score high and get
    * filtered; a threshold is the caller's policy.
    *
    * Plan shape: two word-explode passes (one building the vocab, one
    * feeding the scoring join — the classic two-pass LM estimate), a
    * broadcast 1-row total summed from the |vocab|-sized aggregate
    * (NOT a third corpus pass), and one shuffle join on word (the same
    * shape as TF-IDF). Each token's −ln p is rounded to integer
    * MICRO-UNITS before the per-doc sum, so the aggregate is
    * order-independent and bit-reproducible across partitionings and
    * engines — a float sum would differ in the last ulp per shuffle
    * layout.
    */
  def unigramLogProb(df: DataFrame, idCol: String, text: Column)
      : DataFrame = {
    val words = df.select(col(idCol),
      explode(Dedup.words(text)).as("word"))
    val vocab = words.groupBy("word").agg(count(lit(1)).as("wc"))
    val total = vocab.agg(sum(col("wc")).as("tot"))
    words.join(vocab, "word").crossJoin(broadcast(total))
      .withColumn("nll_u",
        round(-log(col("wc").cast("double") / col("tot").cast("double"))
          * 1e6).cast("long"))
      .groupBy(idCol)
      .agg((sum(col("nll_u")).cast("double") / count(lit(1)) / 1e6)
          .as("avg_nll"),
        count(lit(1)).as("n_words"))
  }

  /** Bigram log-probability scoring — one Markov order up from
    * [[unigramLogProb]], the closest train-free approximation of the
    * KenLM perplexity filter CCNet actually runs: score(doc) = mean
    * over tokens of −ln p(wᵢ | wᵢ₋₁), with the conditional estimated
    * from the corpus itself under add-one smoothing
    * (p = (c(prev,w)+1) / (c(prev·)+|V|); the first token of each
    * document conditions on a BOS sentinel). Unlike the unigram score
    * it penalizes improbable TRANSITIONS — shuffled-word salad built
    * from common words scores high here but normal there.
    *
    * Plan shape: token pairs come from a `lag` over the per-document
    * window (partitioned by doc — never a single task; measured 12×
    * FASTER than the shuffle-free in-row adjacent-pair `transform`,
    * whose interpreted HOF dominates the saved exchange); the bigram
    * model is one (prev,word) shuffle aggregate, context totals are a
    * second aggregate OVER THE MODEL (|bigrams|-sized, not a corpus
    * re-pass), vocab size is a broadcast 1-row aggregate, and scoring
    * is one shuffle join on (prev,word). Model size is O(distinct
    * bigrams) rows distributed across executors — nothing
    * vocab-squared materializes anywhere. Per-token −ln p rounds to
    * integer MICRO-UNITS before the per-doc sum (order-independent,
    * bit-reproducible across partitionings and engines).
    */
  def bigramLogProb(df: DataFrame, idCol: String, text: Column)
      : DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("pos")
    val pairs = df
      .select(col(idCol), posexplode(Dedup.words(text))
        .as(Seq("pos", "word")))
      .withColumn("prev", lag(col("word"), 1, "<s>").over(w))
      .drop("pos")
    val bg = pairs.groupBy("prev", "word").agg(count(lit(1)).as("c2"))
    val ctx = bg.groupBy("prev").agg(sum(col("c2")).as("c1"))
    val vocab = bg.select("word").distinct()
      .agg(count(lit(1)).as("nv"))
    pairs.join(bg, Seq("prev", "word")).join(ctx, Seq("prev"))
      .crossJoin(broadcast(vocab))
      .withColumn("nll_u",
        round(-log((col("c2") + 1).cast("double") /
          (col("c1") + col("nv")).cast("double")) * 1e6).cast("long"))
      .groupBy(idCol)
      .agg((sum(col("nll_u")).cast("double") / count(lit(1)) / 1e6)
          .as("avg_nll_bigram"),
        count(lit(1)).as("n_tokens"))
  }

  /** Stupid-backoff LM scoring (Brants et al. 2007, "Large Language
    * Models in Machine Translation") — the production shape
    * [[bigramLogProb]] only approximates: the model is trained on a
    * REFERENCE slice (`isTrain` — the curated/high-quality subset) and
    * scores the WHOLE corpus, so unseen transitions actually occur and
    * the backoff path is exercised. Per token:
    * `S(w|prev) = c₂(prev,w)/c₁(prev)` when the bigram was seen in
    * training, else `0.4 · (c(w)+1)/(N+|V|)` — the stupid-backoff
    * unigram with an add-one floor so OOV words score finitely
    * (Brants' α = 0.4; no normalization, which is the point — scores,
    * not probabilities). Output per doc: mean −ln S, token count, and
    * how many tokens backed off (the "novelty vs the reference"
    * diagnostic a curation run reads alongside the score).
    *
    * Plan shape: one per-doc `lag` window builds token pairs for the
    * corpus; the train-slice pairs aggregate into the bigram model (one
    * (prev,word) shuffle), context totals and the unigram model are
    * aggregates OVER that model and over the train tokens; scoring is
    * LEFT joins (bigram on (prev,word), unigram on word — unseen keys
    * must survive to the backoff branch, which an inner join would
    * silently drop) plus one broadcast 1-row (N,|V|) total. Per-token
    * −ln S rounds to integer MICRO-UNITS before the per-doc sum, so the
    * score is bit-reproducible under any partitioning. Model size is
    * O(distinct train bigrams) rows, distributed — nothing vocab² ever
    * materializes, and the corpus-side cost is the same two shuffles at
    * 100 TB as [[bigramLogProb]].
    */
  def backoffLogProb(df: DataFrame, idCol: String, text: Column,
                     isTrain: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("pos")
    val pairs = df
      .select(col(idCol), isTrain.as("_is_t"),
        posexplode(Dedup.words(text)).as(Seq("pos", "word")))
      .withColumn("prev", lag(col("word"), 1, "<s>").over(w))
      .drop("pos")
    val tp = pairs.filter(col("_is_t"))
    val bg = tp.groupBy("prev", "word").agg(count(lit(1)).as("c2"))
    val ctx = bg.groupBy("prev").agg(sum(col("c2")).as("c1"))
    val uni = tp.groupBy("word").agg(count(lit(1)).as("cw"))
    val tot = uni.agg(sum(col("cw")).as("n"), count(lit(1)).as("nv"))
    pairs
      .join(bg, Seq("prev", "word"), "left")
      .join(ctx, Seq("prev"), "left")
      .join(uni.withColumnRenamed("cw", "cw_u"), Seq("word"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("nll_u",
        round(when(col("c2").isNotNull,
            -log(col("c2").cast("double") / col("c1").cast("double")))
          .otherwise(-log(lit(0.4) *
            ((coalesce(col("cw_u"), lit(0L)) + 1).cast("double") /
              (col("n") + col("nv")).cast("double")))) * 1e6)
          .cast("long"))
      .groupBy(idCol)
      .agg((sum(col("nll_u")).cast("double") / count(lit(1)) / 1e6)
          .as("avg_nll_backoff"),
        count(lit(1)).as("n_tokens"),
        sum(when(col("c2").isNull, 1L).otherwise(0L)).as("n_backoff"))
  }

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): hash every word
    * into `buckets` feature buckets, fit add-one-smoothed bag-of-words
    * models over the TARGET slice (`isTarget`) and the RAW corpus (all
    * rows), and score each document by the summed per-occurrence
    * log-likelihood ratio `Σ count(w) · [ln p̂_target(b(w)) −
    * ln p̂_raw(b(w))]`. Documents that look like the target distribution
    * score high; training-data curation keeps the top slice.
    *
    * Scale shape: one explode → 64-group partial aggregate (a
    * bucket-count vector, NOT a vocabulary — the collect is
    * `buckets` rows regardless of corpus size), then one scan where
    * each doc's weight is in-row arithmetic over its compiled
    * [[graft.expressions.TextSketches.TermCounts]] map against the
    * broadcast log-ratio array. Weights are integer micro-units
    * (per-bucket ratio rounded BEFORE the per-doc sum), so the result
    * is bit-identical under any partitioning — the float-sum trap the
    * quality score documents.
    */
  def dsirWeights(df: DataFrame, idCol: String, text: Column,
                  isTarget: Column, buckets: Int = 64): DataFrame = {
    graft.expressions.GraftFunctions.register(df.sparkSession)
    val bucketOf = (w: Column) =>
      pmod(md5Hash48(w), lit(buckets.toLong)).cast("int")
    val occ = df.select(isTarget.as("_is_t"),
        explode(Dedup.words(text)).as("_w"))
      .select(col("_is_t"), bucketOf(col("_w")).as("_b"))
    // bounded driver collect: exactly `buckets` rows of partial sums
    val counts = occ.groupBy("_b")
      .agg(sum(when(col("_is_t"), 1L).otherwise(0L)).as("tc"),
        count(lit(1)).as("rc"))
      .collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2)))).toMap
    val tTot = counts.valuesIterator.map(_._1).sum.toDouble
    val rTot = counts.valuesIterator.map(_._2).sum.toDouble
    // HALF_UP (away from zero), not math.round (toward +∞): log-ratios
    // go negative and the two modes differ there at exact .5 ties
    val ratioMicro: Array[Long] = Array.tabulate(buckets) { b =>
      val (tc, rc) = counts.getOrElse(b, (0L, 0L))
      BigDecimal((math.log((tc + 1.0) / (tTot + buckets))
          - math.log((rc + 1.0) / (rTot + buckets))) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val tc = call_function("graft_term_counts", text)
    val weight = aggregate(map_entries(tc), lit(0L), (acc, e) =>
      acc + e.getField("value").cast("long")
        * element_at(typedLit(ratioMicro), bucketOf(e.getField("key")) + 1))
    df.withColumn("weight_micro", weight)
  }

  /** A trained quality-classifier model: per-bucket log-likelihood-
    * ratio weights over [[dsirWeights]]'s hashed unigram feature space
    * plus the class-prior log-ratio, all in integer micro-units so
    * scoring is bit-deterministic under any partitioning. The whole
    * model is `buckets + 1` longs — broadcastable as a literal array
    * and small enough to mirror into an oracle query verbatim.
    */
  final case class QualityClfModel(ratioMicro: Array[Long],
                                   priorMicro: Long, buckets: Int)

  /** Train a multinomial Naive-Bayes quality classifier (the learned
    * half of a CCNet/GPT-3-lineage quality gate — rules catch
    * structural junk, the classifier catches fluent spam) on a labeled
    * corpus: `label` true = high quality. Feature extraction is the
    * DSIR pipeline's: every word hashes into `buckets` buckets, and
    * per-class add-one-smoothed bucket models yield
    * `ratio(b) = ln p̂(b|hi) − ln p̂(b|lo)` (micro-units, HALF_UP —
    * rounded per bucket BEFORE any doc sum). The driver collect is
    * exactly `buckets` partial-count rows plus one doc-count row,
    * regardless of corpus size — 100 TB-safe by construction.
    */
  def trainQualityClf(labeled: DataFrame, text: Column, label: Column,
                      buckets: Int = 64): QualityClfModel = {
    graft.expressions.GraftFunctions.register(labeled.sparkSession)
    val bucketOf = (w: Column) =>
      pmod(md5Hash48(w), lit(buckets.toLong)).cast("int")
    val occ = labeled.select(label.as("_pos"),
        explode(Dedup.words(text)).as("_w"))
      .select(col("_pos"), bucketOf(col("_w")).as("_b"))
    val counts = occ.groupBy("_b")
      .agg(sum(when(col("_pos"), 1L).otherwise(0L)).as("pc"),
        count(lit(1)).as("tc"))
      .collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2) - r.getLong(1))))
      .toMap
    val pTot = counts.valuesIterator.map(_._1).sum.toDouble
    val nTot = counts.valuesIterator.map(_._2).sum.toDouble
    val ratioMicro: Array[Long] = Array.tabulate(buckets) { b =>
      val (pc, nc) = counts.getOrElse(b, (0L, 0L))
      BigDecimal((math.log((pc + 1.0) / (pTot + buckets))
          - math.log((nc + 1.0) / (nTot + buckets))) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val dc = labeled.agg(
      sum(when(label, 1L).otherwise(0L)).as("np"),
      sum(when(label, 0L).otherwise(1L)).as("nn")).collect()(0)
    val priorMicro = BigDecimal(
        math.log((dc.getLong(0) + 1.0) / (dc.getLong(1) + 1.0)) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    QualityClfModel(ratioMicro, priorMicro, buckets)
  }

  /** Score documents against a trained [[QualityClfModel]] in-row:
    * `clf_micro = prior + Σ count(w) · ratio(b(w))` over the compiled
    * [[graft.expressions.TextSketches.TermCounts]] map and the literal
    * weight array (scan-side arithmetic, no shuffle, no model join);
    * `clf_pass = clf_micro ≥ 0` is the NB decision. A wordless doc
    * scores exactly the prior.
    */
  def scoreQualityClf(df: DataFrame, text: Column,
                      model: QualityClfModel): DataFrame = {
    graft.expressions.GraftFunctions.register(df.sparkSession)
    val bucketOf = (w: Column) =>
      pmod(md5Hash48(w), lit(model.buckets.toLong)).cast("int")
    val tc = call_function("graft_term_counts", text)
    val score = aggregate(map_entries(tc), lit(model.priorMicro),
      (acc, e) => acc + e.getField("value").cast("long")
        * element_at(typedLit(model.ratioMicro),
            bucketOf(e.getField("key")) + 1))
    df.withColumn("clf_micro", score)
      .withColumn("clf_pass", col("clf_micro") >= 0)
  }

  /** A trained BPE merge table in application order. `spec` is the
    * single-literal wire form [[graft.expressions.TextSketches.BpeEncode]]
    * consumes (pairs `leftright` joined by `` — one string
    * literal in the task closure, and the same table the oracle SQL
    * mirrors as a `VALUES` list).
    */
  /** Lexicographic order over a string's UTF-8 bytes (unsigned) — the
    * binary collation DuckDB and Spark's UTF8String both sort by.
    * Scala's default String ordering compares UTF-16 code units, which
    * disagrees with byte order exactly where surrogates sort above
    * U+E000–U+FFFF; training tie-breaks must use this ordering to stay
    * bit-identical with the SQL oracle.
    */
  private[graft] val Utf8Ordering: Ordering[String] = (a: String, b: String) =>
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  final case class BpeModel(merges: Seq[(String, String)]) {
    def spec: String =
      merges.map { case (l, r) => l + "" + r }.mkString("")
  }

  /** Train a deterministic byte-pair-encoding merge table (Sennrich
    * 2016's algorithm over a word-frequency summary — the same
    * formulation SentencePiece/HF train from): seed every word as its
    * code-point sequence, then `numMerges` times merge the
    * highest-frequency adjacent token pair (ties broken
    * lexicographically by left then right token, so training is
    * bit-reproducible under any partitioning or hash-map order).
    *
    * The distributed part is one word-count groupBy; the driver then
    * trains on the top-`topWords` (freq desc, word asc) summary — a
    * TakeOrdered-bounded collect, never corpus-sized, exactly how
    * production tokenizers train from a frequency table rather than raw
    * text. Merge application uses leftmost non-overlapping
    * replace-all to fixpoint — the identical rule
    * [[graft.expressions.TextSketches.BpeEncode]] and the DuckDB oracle
    * apply, so trained table + encoder are bit-consistent end to end.
    */
  def trainBpe(df: DataFrame, text: Column, numMerges: Int = 32,
               topWords: Int = 1024): BpeModel = {
    graft.expressions.GraftFunctions.register(df.sparkSession)
    val Sep = ''
    val wf = df.select(explode(Dedup.words(text)).as("_w"))
      .groupBy("_w").agg(count(lit(1)).as("_n"))
      .orderBy(col("_n").desc, col("_w").asc)
      .limit(topWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // Injectivity guard for the model wire format: merge tokens are
    // concatenations of word characters, and BpeModel.spec /
    // BpeEncode's segmentation delimit them with U+001D/U+001E/U+001F.
    // Those three are NOT whitespace under either engine's word split,
    // so a corpus word carrying one would flow into a token, mis-split
    // the spec, and silently diverge Spark from the oracle — fail fast
    // here instead.
    wf.foreach { case (w, _) =>
      require(!w.exists(c => c == '' || c == '' || c == ''),
        "trainBpe: corpus word contains a BPE spec separator code point " +
        s"(U+001D/U+001E/U+001F): ${w.map(c => f"U+${c.toInt}%04X").mkString(" ")}")
    }
    def seed(w: String): String = {
      val sb = new java.lang.StringBuilder(w.length * 2 + 1)
      sb.append(Sep)
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        sb.appendCodePoint(cp).append(Sep)
        i += Character.charCount(cp)
      }
      sb.toString
    }
    var vocab = wf.map { case (w, n) => (seed(w), n) }
    val merges = Seq.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val counts =
        scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (s, n) =>
        val toks = s.split(Sep).filter(_.nonEmpty)
        var i = 0
        while (i < toks.length - 1) {
          val k = (toks(i), toks(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + n
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        // tie-break by UTF-8 bytes, not Scala's UTF-16 code units: the
        // DuckDB oracle's `ORDER BY c DESC, l, r` compares under binary
        // (UTF-8) collation, and the two orders diverge for ties
        // between supplementary-plane code points and U+E000–U+FFFF.
        val ((l, r), _) = counts.toSeq
          .sortBy { case ((pl, pr), c) => (-c, pl, pr) }(
            Ordering.Tuple3(Ordering.Long, Utf8Ordering, Utf8Ordering)).head
        val pat = s"$Sep$l$Sep$r$Sep"
        val rep = s"$Sep$l$r$Sep"
        vocab = vocab.map { case (s, n) =>
          var t = s
          while (t.contains(pat)) t = t.replace(pat, rep)
          (t, n)
        }
        merges += ((l, r))
        m += 1
      }
    }
    BpeModel(merges.result())
  }

  /** Token array of `text` under a trained [[BpeModel]] — scan-side,
    * per-task word-cache, no shuffle. Requires
    * `GraftFunctions.register` to have run in the session ([[trainBpe]]
    * and `Tables` both do).
    */
  def bpeTokens(text: Column, model: BpeModel): Column =
    call_function("graft_bpe_encode", text, lit(model.spec))

  /** Document fingerprint: 60-bit md5 of the normalized text (lowercase,
    * whitespace-collapsed) — an order-stable exact-dup key shared with
    * the DuckDB oracle.
    */
  def fingerprint(text: Column): Column =
    md5Hash60(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Repetition ratio — the duplicate-n-gram quality filter: the
    * fraction of a document's shingles that are repeats of an earlier
    * one (1 − distinct/total). Highly repetitive documents (boilerplate,
    * keyword stuffing, generation loops) score high and get filtered
    * before training. Pure in-row array math over one shingle pass.
    */
  def repetitionRatio(text: Column, w: Int = 3): Column = {
    // total shingle count is ARITHMETIC (n_words − w + 1, floor 1) and
    // the distinct count rides the native single-md5-pass hash set —
    // materializing the shingle array twice through interpreted HOFs
    // was 15× slower at sf0.1 (requires GraftFunctions.register, which
    // Tables performs)
    val nw = size(Dedup.words(text))
    val total = when(nw >= w, nw - (w - 1)).otherwise(lit(1))
    val distinctN =
      size(call_function("graft_shingle_hashes60", text, lit(w)))
    round((total - distinctN) / total.cast("double"), 6)
  }

  /** PII scrubbing — the standard pre-training redaction pass. The
    * patterns deliberately use only portable regex constructs (character
    * classes + bounded repetition, no lookaround) so Java's engine and
    * the oracle's RE2 match the identical spans; both replacements run
    * as a scan-side projection (no shuffle, whole corpus streams).
    */
  /** Deterministic stratified sampling — training-data mixing without
    * RNG state: a row survives iff its salted 48-bit md5 falls under the
    * stratum's rate. Reproducible across engines, retries, and
    * partitionings (the decision depends only on (salt, key)), which is
    * what makes a 100 TB mixture re-buildable bit-for-bit.
    */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
                           rates: Map[String, Double], default: Double,
                           salt: String): DataFrame = {
    val rate = rates.foldLeft(lit(default)) { case (acc, (k, r)) =>
      when(stratum === k, lit(r)).otherwise(acc)
    }
    df.filter(
      md5Hash60(concat(lit(salt), lit("#"), key.cast("string")))
        % 1000000L < rate * 1000000L)
  }

  /** Sequence packing for context-window assembly: within each stratum
    * (domain shard), documents in a stable order are assigned to bins by
    * exclusive-prefix-sum of their token counts over the window size —
    * the streaming "chunked packing" a trainer's data loader consumes.
    * Partitioned by stratum, so packing parallelizes across shards (the
    * global-order variant is a single sort — pack per shard at scale).
    */
  def packSequences(df: DataFrame, stratum: Column, order: Column,
                    tokens: Column, window: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(order)
    df.withColumn("tok", tokens.cast("long"))
      .withColumn("bin",
        floor(coalesce(
          sum(col("tok")).over(w.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)) / window).cast("long"))
  }

  /** Token-budget corpus mixing — the data-mixing step trainers run:
    * sample each stratum (source/language shard) at the rate that hits
    * its TARGET SHARE of a total token budget in expectation, by tokens
    * rather than documents. Per-stratum rates derive from one grouped
    * token-sum aggregate (a bounded, strata-sized driver collect —
    * rates must be plan literals for the hash rule), then rows survive
    * by the same salted-hash decision as [[stratifiedHashSample]]:
    * reproducible across partitionings, retries, and engines. A stratum
    * whose target exceeds its inventory caps at rate 1 (everything
    * kept) — resolving the shortfall by re-weighting other strata is a
    * policy decision left to the caller.
    */
  def tokenBudgetMix(df: DataFrame, key: Column, stratum: Column,
                     tokens: Column, targetShares: Map[String, Double],
                     tokenBudget: Long, salt: String): DataFrame = {
    val inventory = df.groupBy(stratum.as("_stratum"))
      .agg(sum(tokens.cast("long")).as("_tok"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = targetShares.flatMap { case (k, share) =>
      inventory.get(k).map { have =>
        k -> math.min(1.0, tokenBudget * share / have.toDouble)
      }
    }
    stratifiedHashSample(df, key, stratum, rates, default = 0.0, salt)
  }

  /** Temperature-weighted mixture shares — the standard α-sampling rule
    * for multi-source training mixes (share_s ∝ tokens_s^α): α = 1
    * reproduces the natural distribution, α → 0 flattens toward equal
    * shares, and the usual 0 < α < 1 boosts low-resource strata without
    * discarding high-resource mass. Output feeds [[tokenBudgetMix]] as
    * its `targetShares` — computing the shares from the corpus is the
    * half trainers otherwise hardcode. The strata-sized inventory
    * collect is bounded; the power/total fold runs in SORTED stratum
    * order and shares snap to a 1e-9 grid (floor(x·1e9 + 0.5)), so the
    * result is bit-reproducible and the SQL oracle can mirror the
    * arithmetic exactly.
    */
  def temperatureShares(df: DataFrame, stratum: Column, tokens: Column,
                        alpha: Double): Map[String, Double] = {
    require(alpha >= 0.0, "alpha must be >= 0")
    val inv = df.groupBy(stratum.as("_s"))
      .agg(sum(tokens.cast("long")).as("_t"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1)
    // α = 0.5 rides IEEE-exact sqrt (pow is only 1-ulp-bounded and may
    // differ between the JVM and the oracle's libm; sqrt cannot)
    val pows = inv.map { case (k, t) =>
      k -> (if (alpha == 0.5) math.sqrt(t.toDouble)
            else math.pow(t.toDouble, alpha))
    }
    val total = pows.map(_._2).sum // sorted-order fold: deterministic
    pows.map { case (k, p) =>
      k -> math.floor(p / total * 1e9 + 0.5) / 1e9
    }.toMap
  }

  /** Deterministic corpus shuffle — training-order randomization without
    * RNG state: every row ranked by its salted 60-bit md5 (ties broken by
    * the key). Reproducible across partitionings/retries like
    * [[stratifiedHashSample]], and the rank is computed with the
    * scale-safe [[graft.operators.Relational.globalRanks]] (NO
    * single-task window). Changing the salt reshuffles — epoch ordering
    * is `salt = s"epoch-$n"`.
    */
  def deterministicShuffle(df: DataFrame, key: Column,
                           salt: String): DataFrame =
    graft.operators.Relational.globalRanks(
      df.withColumn("_h",
        md5Hash60(concat(lit(salt), lit("#"), key.cast("string")))),
      Seq(col("_h").asc, key.asc))
      .drop("_h")

  /** Sliding-window word chunking — context-window / embedding prep:
    * each document explodes into windows of `chunkSize` words advancing
    * by `stride` (overlap = chunkSize − stride). Pure in-row generate →
    * the corpus streams through one scan with no shuffle; documents with
    * no words yield no chunks.
    */
  def chunkWords(df: DataFrame, text: Column, chunkSize: Int,
                 stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be > 0")
    val ws = Dedup.words(text)
    df.withColumn("_ws", ws)
      .filter(size(col("_ws")) > 0)
      .select(col("*"),
        posexplode(sequence(lit(0), size(col("_ws")) - 1, lit(stride))))
      .withColumnRenamed("pos", "chunk_ix")
      .select(col("*"),
        array_join(slice(col("_ws"), col("col") + 1, lit(chunkSize)), " ")
          .as("chunk"),
        least(lit(chunkSize), size(col("_ws")) - col("col"))
          .as("chunk_tokens"))
      .drop("_ws", "col")
  }

  /** TF-IDF top terms per document — the classic corpus-weighting pass
    * (keyword extraction, relevance features): tf = term count / doc
    * word count, idf = ln((N+1)/(df+1)) + 1 (smoothed), top `topN`
    * terms per doc by weight with a term tie-break. Two aggregations
    * (both map-side combinable) + one broadcast-sized term-frequency
    * join; per-doc ranking partitions by doc (no global window).
    */
  def tfidfTopTerms(df: DataFrame, idCol: String, text: Column,
                    topN: Int = 5): DataFrame = {
    graft.expressions.GraftFunctions.register(df.sparkSession)
    // per-doc term counts computed IN-ROW (one compiled pass), so the
    // explode ships one row per DISTINCT (doc, term) — not one per word
    // occurrence — and the first shuffle disappears entirely; persisted
    // because both the document-frequency aggregate and the scoring
    // join read it
    val tf = graft.Caches.persist(
      df.select(col(idCol),
          element_at(textCounts(text), 1).as("_nw"),
          explode(call_function("graft_term_counts", text)))
        .withColumnRenamed("key", "term")
        .withColumnRenamed("value", "_c"))
    // the corpus size joins in LAZILY (broadcast 1-row aggregate) — an
    // eager df.count() here would fire a full extra scan as a side
    // effect of merely BUILDING the plan
    val nDf = df.agg(count(lit(1)).cast("double").as("_n"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("_df"))
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(nDf))
      .withColumn("tfidf",
        round((col("_c").cast("double") / col("_nw").cast("double")) *
          (log((col("_n") + 1d) / (col("_df").cast("double") + 1d))
            + 1d), 6))
    scored
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
          .orderBy(col("tfidf").desc, col("term").asc)))
      .filter(col("rank") <= topN)
      .select(col(idCol), col("term"), col("tfidf"), col("rank"))
  }

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,10}"

  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  def countPii(text: Column): (Column, Column) =
    (size(regexp_extract_all(text, lit(EmailPattern), lit(0))),
      size(regexp_extract_all(text, lit(PhonePattern), lit(0))))

  /** Zipf-law exponent of the corpus term distribution: the OLS slope
    * of `ln(freq)` against `ln(rank)` over the top `topK` terms —
    * natural text sits near α ≈ 1 (slope −1); generated/templated or
    * keyword-stuffed corpora drift off it, making α a one-number
    * corpus-health diagnostic beside t18's deciles.
    *
    * Plan shape: one vocabulary aggregate; ranks by the scale-safe
    * [[graft.operators.Relational.globalRanks]] (range partition +
    * broadcast prefix offsets — no single-task window, ties broken by
    * word so the rank is total); the regression runs over the
    * `topK`-row slice as one aggregate. Both logs round to integer
    * MICRO-units BEFORE the power sums (`ln` differs across libms by
    * 1 ulp), so the sums are exact integers and the closed-form slope
    * is one fixed-order double formula — bit-identical anywhere.
    *
    * Output: one row — `n_terms`, `zipf_alpha` (= −slope, > 0 for
    * natural text), `top_freq` (the rank-1 count).
    */
  def zipfAlpha(df: DataFrame, text: Column, topK: Int = 100)
      : DataFrame = {
    import graft.operators.Relational.globalRanks
    val vocab = df.select(explode(Dedup.words(text)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val ranked = globalRanks(vocab,
        Seq(col("freq").desc, col("word").asc))
      .withColumnRenamed("_rn", "rank")
      .filter(col("rank") <= topK)
    val dec = "decimal(19,0)"
    val lx = round(log(col("rank").cast("double")) * 1e6)
      .cast("long").cast(dec)
    val ly = round(log(col("freq").cast("double")) * 1e6)
      .cast("long").cast(dec)
    ranked
      .agg(count(lit(1)).as("n_terms"),
        sum(lx).as("sx"), sum(ly).as("sy"),
        sum(lx * ly).as("sxy"), sum(lx * lx).as("sxx"),
        max(when(col("rank") === 1, col("freq"))).as("top_freq"))
      .withColumn("zipf_alpha",
        -((col("n_terms").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
          (col("n_terms").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double"))))
      .select(col("n_terms"), col("zipf_alpha"), col("top_freq"))
  }

  /** Pointwise-mutual-information collocations (Church & Hanks 1990):
    * the adjacent word pairs that co-occur far more than their
    * unigram frequencies predict —
    * `pmi(a,b) = ln( (c₂(a,b)/P) / (c₁(a)/T) / (c₁(b)/T) )` — the
    * classic phrase/term-mining pass (multi-word expressions, named
    * entities) a corpus pipeline runs before building vocabularies.
    * `minCount` suppresses the singleton-pair noise PMI is notorious
    * for.
    *
    * Plan shape: adjacent pairs from a per-doc `lag` window (t21's
    * extraction, minus the BOS sentinel — only real adjacencies
    * count); one (prev,word) aggregate for pair counts, one unigram
    * aggregate joined twice (hash joins keyed on the word — the
    * aggregated vocab relation, not the corpus); totals are broadcast
    * 1-row aggregates. All counts are exact integers below 2^53 and
    * the division chain is fixed-order, but `ln` itself is only
    * 1-ulp-accurate and differs between libm implementations — so the
    * score rounds to integer MICRO-units (the t17/t21 discipline),
    * which also makes the top-K cut's ordering engine-independent.
    * Top-K is a TakeOrdered (pmi desc, pair asc).
    */
  def pmiCollocations(df: DataFrame, idCol: String, text: Column,
                      minCount: Long = 5, topN: Int = 30): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("pos")
    val words = df.select(col(idCol),
      posexplode(Dedup.words(text)).as(Seq("pos", "word")))
    val pairs = words
      .withColumn("prev", lag(col("word"), 1).over(w))
      .filter(col("prev").isNotNull)
    val c2 = pairs.groupBy("prev", "word")
      .agg(count(lit(1)).as("c2"))
      .filter(col("c2") >= minCount)
    val c1 = words.groupBy("word").agg(count(lit(1)).as("c1"))
    val totT = words.agg(count(lit(1)).as("t_tokens"))
    val totP = pairs.agg(count(lit(1)).as("p_pairs"))
    c2.join(c1.withColumnRenamed("word", "prev")
          .withColumnRenamed("c1", "c1a"), "prev")
      .join(c1.withColumnRenamed("c1", "c1b"), "word")
      .crossJoin(broadcast(totT))
      .crossJoin(broadcast(totP))
      .withColumn("pmi",
        round(log(col("c2").cast("double") /
            col("p_pairs").cast("double") /
          (col("c1a").cast("double") / col("t_tokens").cast("double")) /
          (col("c1b").cast("double") / col("t_tokens").cast("double")))
          * 1e6).cast("long").cast("double") / 1e6)
      .select(col("prev"), col("word"), col("c2"), col("pmi"))
      .orderBy(col("pmi").desc, col("prev").asc, col("word").asc)
      .limit(topN)
  }

  /** Inverted-index build: the posting-list relation (`term → df,
    * [doc:tf...]`) a lexical retrieval service serves [[bm25TopK]]
    * from — one row per term, postings as a SORTED array of
    * zero-padded `doc_id:tf` entries so the list is a deterministic
    * value (lexicographic == numeric under the fixed-width pad) and
    * range-scannable by doc id. `minDf` drops hapax noise;
    * `maxDfFraction` drops stop-word terms whose posting lists would
    * otherwise approach corpus length (the classic index-bloat guard —
    * a term in every doc carries no selectivity anyway).
    *
    * Plan shape: one word explode → (word, doc) tf aggregate → df
    * aggregate OVER the tf relation → one grouped `sort_array ∘
    * collect_list` per term. Posting-list length is bounded by
    * `maxDfFraction · N` BY CONSTRUCTION, so no single term can
    * balloon a task; everything hash-partitions on the term.
    */
  def invertedIndex(df: DataFrame, idCol: String, text: Column,
                    minDf: Long = 1, maxDfFraction: Double = 1.0)
      : DataFrame = {
    val tf = df.select(col(idCol), explode(Dedup.words(text))
        .as("word"))
      .groupBy(col("word"), col(idCol)).agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    tf.join(broadcast(dfq), "word")
      .crossJoin(broadcast(nDocs))
      .filter(col("df") >= minDf &&
        col("df") <= col("n_docs") * maxDfFraction)
      .groupBy(col("word"), col("df"))
      .agg(sort_array(collect_list(
        format_string("%012d:%d", col(idCol), col("tf"))))
        .as("postings"))
      .select(col("word"), col("df"), col("postings"))
  }

  /** Corpus-level duplicate-line removal — the line-granular dedup
    * CCNet/RefinedWeb-class web pipelines run BEFORE document-level
    * near-dup: navigation chrome, cookie banners, and footer
    * boilerplate repeat verbatim across pages of a site, so any line
    * appearing in ≥ `maxDocs` distinct documents is stripped from
    * every document it appears in. Document-level MinHash never
    * catches these (the surrounding text differs); this is the
    * complementary pass.
    *
    * Returns one row per doc: kept-line count, dropped-line count,
    * and the cleaned text reassembled in original line order. Plan:
    * one line explode → one (line → distinct-doc count) hash
    * aggregate → join back on the line → per-doc regroup. The line
    * relation shuffles on the line VALUE, so a line's count is one
    * reduce key regardless of corpus size; per-doc reassembly
    * shuffles on the doc id. Nothing is corpus-crossed: the join
    * fan-out per line is its own occurrence count, which is exactly
    * the quantity being measured.
    */
  def lineDedup(df: DataFrame, idCol: String, text: Column,
                maxDocs: Int): DataFrame = {
    val lines = df.select(col(idCol),
      posexplode(split(text, "\n")).as(Seq("pos", "line")))
    val counts = lines.groupBy(col("line"))
      .agg(countDistinct(col(idCol)).as("_nd"))
    lines.join(counts, "line")
      .groupBy(col(idCol))
      .agg(
        sum(when(col("_nd") < maxDocs, 1L).otherwise(0L))
          .as("n_kept"),
        sum(when(col("_nd") >= maxDocs, 1L).otherwise(0L))
          .as("n_dropped"),
        array_join(transform(array_sort(collect_list(
          when(col("_nd") < maxDocs,
            struct(col("pos"), col("line"))))),
          _.getField("line")), "\n").as("cleaned"))
  }

  /** Okapi BM25 ranked retrieval (Robertson & Zaragoza 2009, §3.3):
    * the lexical ranking function [[graft.pipelines.Similarity.hybridTopKRrf]]
    * assumes as its `lexScore` input. Per query term `t` and document
    * `d`:
    * `idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1 − b + b·dl(d)/avgdl))`,
    * with `idf(t) = ln(1 + (N − df(t) + 0.5)/(df(t) + 0.5))` — TF
    * saturation (k1) plus document-length normalization (b), the two
    * effects raw TF-IDF lacks.
    *
    * Plan shape: one word explode feeds BOTH the per-doc length
    * aggregate and the term-frequency aggregate (the explode is
    * filtered to the query's terms BEFORE the tf shuffle, so only
    * matching occurrences move); corpus stats (N, avgdl) are a
    * broadcast 1-row aggregate; per-term document frequencies are an
    * aggregate OVER the tf relation (|terms|-sized) joined back
    * broadcast. Scoring is in-row arithmetic; each per-term
    * contribution rounds to integer MICRO-UNITS before the per-doc
    * sum, so the score is bit-identical under any partitioning and
    * any engine (the t17/t21 discipline). The final top-N is a
    * TakeOrdered, never a global sort.
    *
    * Output: `doc_id`-keyed `score` (double, micro-unit floor), `dl`,
    * `n_hits` (distinct query terms matched), top `topN` by score
    * desc / id asc.
    */
  def bm25TopK(df: DataFrame, idCol: String, text: Column,
               queryTerms: Seq[String], k1: Double = 1.2,
               b: Double = 0.75, topN: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK: empty query")
    val words = df.select(col(idCol), explode(Dedup.words(text))
      .as("word"))
    val dl = words.groupBy(idCol).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_corpus"),
      avg(col("dl")).as("avgdl"))
    val tf = words.filter(col("word").isin(queryTerms: _*))
      .groupBy(col(idCol), col("word")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("dfreq"))
    tf.join(broadcast(dfreq), "word")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("contrib_u",
        round(
          log(lit(1.0) + (col("n_corpus") - col("dfreq") + lit(0.5)) /
              (col("dfreq") + lit(0.5)))
            * (col("tf") * lit(k1 + 1.0)) /
            (col("tf") + lit(k1) * (lit(1.0 - b) +
              lit(b) * col("dl") / col("avgdl")))
            * 1e6).cast("long"))
      .groupBy(col(idCol))
      .agg((sum(col("contrib_u")).cast("double") / 1e6).as("score"),
        first(col("dl")).as("dl"),
        count(lit(1)).as("n_hits"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(topN)
  }

  /** Per-document out-of-vocabulary rate against the corpus's own
    * top-`vocabSize` words — the tokenizer-coverage diagnostic a
    * training pipeline publishes before committing to a vocabulary
    * (high OOV share ⇒ the vocab under-serves that document's domain).
    * The vocabulary is a deterministic TakeOrdered over the word
    * counts (freq desc, word asc tie-break — the exact rank-boundary
    * policy matters at the cut) and is vocab-sized, so it broadcasts
    * to the per-token membership join; the token explode is map-side
    * and the per-doc aggregate is one shuffle on the doc id. Docs with
    * zero words emit no row (no tokens to rate).
    *
    * Output: `idCol, n_words, n_oov, oov_share`.
    */
  def oovRate(docs: DataFrame, idCol: String, text: Column,
              vocabSize: Int): DataFrame = {
    val words = docs.select(col(idCol), explode(Dedup.words(text)).as("word"))
    val vocab = words.groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc).limit(vocabSize)
      .select(col("word"), lit(1).as("_in_vocab"))
    words.join(broadcast(vocab), Seq("word"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(when(col("_in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_share",
        round(col("n_oov").cast("double") / col("n_words").cast("double"), 6))
  }

  /** Blocked fuzzy matching (entity resolution): the character-level
    * near-match the shingle/MinHash family cannot express — titles,
    * names, and short keys that differ by a few EDITS (typos, OCR
    * noise, re-crawl drift) share almost no word shingles, but sit
    * within a small Levenshtein distance.
    *
    * `records` carries (`id`, `block`, `key`); the candidate space is
    * pairs WITHIN a block — never all-pairs — so the cost is
    * Σ|block|² over blocks, the same bounding argument as LSH banding
    * (the caller's blocking key IS the recall/cost dial: a key prefix,
    * a length bucket, a phonetic code, or an LSH band all work). Each
    * surviving pair pays one codegen'd `levenshtein` (built-in — no
    * UDF), ordered (`id_a < id_b`) so every pair reports once.
    * Returns `(id_a, id_b, dist)` for pairs at distance ≤ `maxDist` —
    * exact integer edits, engine-independent.
    *
    * SKEW: on real corpora block keys are Zipfian (shared openers,
    * boilerplate prefixes), and a plain self-join would run a hot
    * block's entire |block|² pair space in ONE task. Blocks larger
    * than `blockCap` are therefore TRIANGLE-SALTED: rows hash into
    * `s = ⌈n/blockCap⌉` groups (`xxhash64(id) mod s` — deterministic,
    * map-side, no per-block sort), and the self-join runs per group
    * CELL (i ≤ j) with the left row replicated into cells (g, j≥g)
    * and the right row into cells (i≤g, g). Every unordered pair
    * lands in exactly one cell — same-group pairs dedup on
    * `id_l < id_r`, cross-group pairs exist only at (min g, max g) —
    * so the OUTPUT SET IS IDENTICAL to the unsalted join while no
    * task compares more than ~blockCap² pairs. Total emitted rows are
    * n·(s+1) per hot block — the inherent Σ|block|² work, spread over
    * s(s+1)/2 independent cells instead of one straggler. Blocks at
    * or under the cap take the s=1 path: no replication, the plain
    * join shape. Group sizes are hash-balanced (expected n/s, tight
    * for n/s ≫ 1); the bound is probabilistic, pinned by
    * TextAnalysisSpec's skewed fixture.
    */
  def fuzzyMatchPairs(records: DataFrame, maxDist: Int,
                      blockCap: Int = 1024): DataFrame = {
    require(blockCap > 0, "blockCap must be positive")
    // only blocks OVER the cap need s>1; there are at most N/cap of
    // them, so this frame is small and the join back broadcasts
    val hot = records.groupBy("block")
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") > blockCap)
      .withColumn("_s",
        ceil(col("_n").cast("double") / blockCap).cast("int"))
      .select("block", "_s")
    val grouped = records.join(hot, Seq("block"), "left")
      .withColumn("_s", coalesce(col("_s"), lit(1)))
      .withColumn("_g", pmod(xxhash64(col("id")), col("_s")).cast("int"))
    val left = grouped.select(col("id").as("id_l"), col("block"),
      col("key").as("key_l"), col("_g").as("_i"),
      explode(sequence(col("_g"), col("_s") - lit(1))).as("_j"))
    val right = grouped.select(col("id").as("id_r"), col("block"),
      col("key").as("key_r"),
      explode(sequence(lit(0), col("_g"))).as("_i"),
      col("_g").as("_j"))
    // EXPLICIT shuffle on the salt cell, with a pinned partition
    // count: both exploded sides read from a records-sized frame whose
    // BYTES AQE sees as tiny, so without this the join arrives
    // broadcast-vs-AQE-coalesced-single-partition and the whole
    // Σ|block|²/s pair space runs as ONE task — observed at sf10,
    // where the mega-block's quadratic pinned one core for 20+
    // minutes while 31 idled. The explicit N defeats AQE's
    // pre-explosion coalescing; each (block, i, j) triangle cell then
    // lands on a hash-spread task and the quadratic parallelizes.
    val cells = records.sparkSession.sessionState.conf.numShufflePartitions
    left.repartition(cells, col("block"), col("_i"), col("_j"))
      .join(right.repartition(cells, col("block"), col("_i"), col("_j")),
        Seq("block", "_i", "_j"))
      .filter(col("_i") < col("_j") || col("id_l") < col("id_r"))
      // threshold form: the banded DP early-exits rows over maxDist
      // (returns -1) instead of filling the full |key|² edit matrix —
      // same surviving pairs and distances, strictly less work
      .withColumn("dist",
        levenshtein(col("key_l"), col("key_r"), maxDist))
      .filter(col("dist") >= 0)
      .select(least(col("id_l"), col("id_r")).as("id_a"),
        greatest(col("id_l"), col("id_r")).as("id_b"), col("dist"))
  }

  /** Sorted-neighborhood fuzzy matching (Hernández & Stolfo's
    * merge/purge method): the LINEAR-work member of the ER family.
    * [[fuzzyMatchPairs]] enumerates every within-block pair — exact,
    * but on data whose near-dup families GROW with scale (re-crawls,
    * mirrored corpora) both the Σ|block|² work and the answer itself
    * grow quadratically, which no plan outruns. Here keys are sorted
    * (block, key, id) and each key compares ONLY to its next `window`
    * neighbors in sort order: near-identical keys sort adjacently, so
    * a family of m near-dups reports an m·window CHAIN instead of an
    * m² clique, and downstream transitive closure
    * ([[Dedup.connectedComponents]]) recovers the full family — the
    * published SNM + closure pipeline. Work and output are both
    * O(keys·window); `window` is the recall dial, counted in ROWS of
    * `records` in sort order — callers with duplicate keys should
    * pre-distinct them (as t39 does), or duplicates consume the
    * window and silently shrink effective recall. A match whose keys
    * sort more than `window` rows apart is missed — the classic
    * mitigation is [[sortedNeighborPairsMultiPass]], a union of
    * passes under orthogonal sort keys.
    *
    * The global sort rank comes from
    * [[graft.operators.Relational.globalRanks]] — range partition +
    * broadcast prefix offsets, NO single-task window — and the
    * neighbor join is an equi-join on the rank, which is uniform by
    * construction: the hottest block contributes the same per-rank
    * fan-out as any other, so skew cannot concentrate it. Pairs
    * report once (ascending rank), ids normalized `id_a < id_b`,
    * exact integer edits.
    */
  def sortedNeighborPairs(records: DataFrame, maxDist: Int,
                          window: Int): DataFrame =
    snmPass(records, maxDist, window, col("key"))

  /** Multi-pass sorted-neighborhood matching (Hernández & Stolfo's
    * full merge/purge prescription): the UNION of one
    * [[sortedNeighborPairs]] pass per sort key in `passKeys`, pairs
    * deduplicated on (id_a, id_b). A single pass misses matches whose
    * keys sort far apart under its one ordering (a typo in the FIRST
    * character teleports a key across the sort); an orthogonal second
    * ordering — the classic is the REVERSED key, which sorts by
    * suffix — catches most of them, because two keys within edit
    * distance d rarely disagree early under both orderings. Work and
    * output stay O(keys·window·passes), each pass skew-immune by the
    * same global-rank equi-join; `dist` is pass-independent (edits
    * between the ORIGINAL keys), so the dedup is deterministic.
    * Each element of `passKeys` is an expression over the `key`
    * column (e.g. `col("key")`, `reverse(col("key"))`).
    */
  def sortedNeighborPairsMultiPass(records: DataFrame, maxDist: Int,
                                   window: Int,
                                   passKeys: Seq[Column]): DataFrame = {
    require(passKeys.nonEmpty, "need at least one pass key")
    passKeys.map(snmPass(records, maxDist, window, _))
      .reduce(_.unionByName(_))
      .dropDuplicates("id_a", "id_b")
  }

  /** Multi-BLOCKING fuzzy matching: the union of [[fuzzyMatchPairs]]
    * runs, one per blocking key, pairs deduplicated on (id_a, id_b).
    * Blocking is the recall BOUNDARY of blocked ER: an edit inside
    * the block key itself moves one side to a different block, so the
    * pair is never even compared — invisible to the within-block
    * exact join and to SNM alike, and invisible to any recall number
    * measured against a single blocking. An orthogonal second
    * blocking (a suffix block against a prefix block, a sorted-chars
    * block against either) restores exactly the pairs whose keys
    * still agree under AT LEAST ONE blocking; `dist` is
    * blocking-independent (edits between the original keys), so the
    * dedup is deterministic. Work is the sum of the blocked runs —
    * still Σ|block|² per blocking, never all-pairs. `records`
    * carries (`id`, `key`); each element of `blockKeys` is an
    * expression over `key`.
    */
  def fuzzyMatchPairsMultiBlock(records: DataFrame, maxDist: Int,
                                blockKeys: Seq[Column],
                                blockCap: Int = 1024): DataFrame = {
    require(blockKeys.nonEmpty, "need at least one blocking key")
    blockKeys.map(bk =>
        fuzzyMatchPairs(records.withColumn("block", bk), maxDist,
          blockCap))
      .reduce(_.unionByName(_))
      .dropDuplicates("id_a", "id_b")
  }

  /** Multi-blocking × multi-pass SNM: one
    * [[sortedNeighborPairsMultiPass]] run per blocking key, unioned
    * and deduplicated — the approximation-side counterpart of
    * [[fuzzyMatchPairsMultiBlock]], covering the first-block-typo
    * class a single blocking is structurally blind to. Work and
    * output stay O(keys·window·passes·blockings), every pass
    * skew-immune by the same global-rank equi-join.
    */
  def sortedNeighborPairsMultiBlock(records: DataFrame, maxDist: Int,
                                    window: Int, passKeys: Seq[Column],
                                    blockKeys: Seq[Column]): DataFrame = {
    require(blockKeys.nonEmpty, "need at least one blocking key")
    blockKeys.map(bk =>
        sortedNeighborPairsMultiPass(records.withColumn("block", bk),
          maxDist, window, passKeys))
      .reduce(_.unionByName(_))
      .dropDuplicates("id_a", "id_b")
  }

  private def snmPass(records: DataFrame, maxDist: Int,
                      window: Int, passKey: Column): DataFrame =
    snmPassGap(records, maxDist, window, passKey).drop("_gap")

  /** One SNM pass KEEPING the sort-rank gap (`_gap` = how many rows
    * apart the pair sorted under this pass's ordering, 1..window).
    * Window-w pair sets NEST in w — a window-w pass is exactly the
    * gap ≤ w slice of a wider pass — which is what lets a window
    * sweep run ONE max-window pass instead of one full pass per
    * window (see [[snmMinGapPairs]]).
    */
  private def snmPassGap(records: DataFrame, maxDist: Int,
                         window: Int, passKey: Column): DataFrame = {
    require(window > 0, "window must be positive")
    val ranked = graft.operators.Relational.globalRanks(
      records.withColumn("_pk", passKey),
      Seq(col("block").asc, col("_pk").asc, col("id").asc))
    val a = ranked.select(col("id").as("id_l"),
      col("block").as("block_l"), col("key").as("key_l"),
      col("_rn").as("_ra"))
    val b = ranked.select(col("id").as("id_r"),
      col("block").as("block_r"), col("key").as("key_r"),
      col("_rn").as("_rb"))
    a.withColumn("_rb", explode(sequence(col("_ra") + lit(1L),
        col("_ra") + lit(window.toLong))))
      .join(b, "_rb")
      .filter(col("block_l") === col("block_r"))
      // threshold form (see fuzzyMatchPairs): banded DP, early exit
      // over maxDist, identical surviving pairs and distances
      .withColumn("dist",
        levenshtein(col("key_l"), col("key_r"), maxDist))
      .filter(col("dist") >= 0)
      .select(least(col("id_l"), col("id_r")).as("id_a"),
        greatest(col("id_l"), col("id_r")).as("id_b"), col("dist"),
        (col("_rb") - col("_ra")).as("_gap"))
  }

  /** Pass-minimal sort-rank gap per surviving pair — the window-sweep
    * form of [[sortedNeighborPairsMultiPass]]. A pair belongs to the
    * multi-pass window-w set iff SOME pass sorts it within w rows,
    * i.e. iff its minimum gap over the passes is ≤ w (the edit
    * distance is pass-independent, so the per-pass dist filter keeps
    * the same pairs under every ordering). Running ONE evaluation at
    * the LARGEST window of interest therefore answers every smaller
    * window as a plain `_gap ≤ w` count over this frame, instead of
    * re-running passes × windows full SNM joins — the recall-dial
    * sweep (t41) drops from one full multi-pass run per window to one
    * per blocking. Returns (id_a, id_b, _gap).
    */
  def snmMinGapPairs(records: DataFrame, maxDist: Int, window: Int,
                     passKeys: Seq[Column]): DataFrame = {
    require(passKeys.nonEmpty, "need at least one pass key")
    passKeys.map(snmPassGap(records, maxDist, window, _))
      .reduce(_.unionByName(_))
      .groupBy("id_a", "id_b").agg(min(col("_gap")).as("_gap"))
  }

  /** Token-budget waterfill: allocate a training-token budget across
    * sources, proportional to per-source weights but CAPPED by what
    * each source actually has — the allocation step between "we want
    * this mixture" (temperature/DSIR weights) and "cut the shards":
    * small sources saturate (take all they have) and their unused
    * share flows to the rest, the classic waterfilling fixed point.
    *
    * All arithmetic is 64-bit integer, so the result is deterministic
    * and engine-exact: the saturation priority is the DECLARED
    * truncated micro-rational `avail·10⁶ div weight` (ties by source),
    * the capped test is the cross-multiplied integer comparison
    * `avail·W_remaining ≤ B_remaining·weight` (no division at all),
    * and uncapped sources split the post-cap budget by truncating
    * division — Σ alloc ≤ budget with a residue smaller than one unit
    * per uncapped source (never redistributed: determinism over the
    * last few tokens). `budget ≥ Σ avail` degenerates to "everyone
    * capped"; `budget = 0` to all-zero. Requires `weight > 0` and
    * products `avail · Σweight` within 64 bits (quantize weights
    * accordingly); ANSI mode faults overflow loudly.
    *
    * The frame is source-cardinality-sized — a mixing table, thousands
    * of rows at most — and the scan is inherently sequential (each
    * capped test consumes the running prefix), so it runs as a pure
    * function in ONE mapPartitions task over the bounded frame — the
    * same altitude [[Similarity.mmrDiversify]] uses for its greedy:
    * no single-task Window, no driver collect, and the corpus-sized
    * work (counting each source's tokens) happens upstream and stays
    * distributed.
    *
    * Output: `source, avail_tokens, weight, alloc_tokens, capped`.
    */
  def tokenBudgetWaterfill(sources: DataFrame, srcCol: String,
                           availCol: String, weightCol: String,
                           budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val spark = sources.sparkSession
    import spark.implicits._
    sources.select(col(srcCol).cast("string").as("source"),
        col(availCol).cast("long").as("avail"),
        col(weightCol).cast("long").as("weight"))
      .as[(String, Long, Long)].coalesce(1)
      .mapPartitions(it => waterfillScan(it.toSeq, budget).iterator)
      .toDF("source", "avail_tokens", "weight", "alloc_tokens", "capped")
  }

  /** The waterfill scan as a pure integer function over the bounded
    * mixing frame — shared by [[tokenBudgetWaterfill]]'s single-task
    * path and the spec's direct harness. Mirrors the SQL oracle
    * step-for-step: truncated micro-rational priority, cross-
    * multiplied capped test over the running (prefix avail, suffix
    * weight), truncating proportional split of the post-cap budget.
    * Scala `/` on non-negative longs IS the engines' truncating
    * division.
    */
  private[graft] def waterfillScan(rows: Seq[(String, Long, Long)],
      budget: Long): Seq[(String, Long, Long, Long, Boolean)] = {
    require(rows.forall(_._3 > 0), "weights must be positive")
    val sorted = rows.sortBy { case (s, a, w) => (a * 1000000L / w, s) }
    var cumBefore = 0L
    var wFrom = sorted.iterator.map(_._3).sum
    val flagged = sorted.map { case (s, a, w) =>
      val capped = a * wFrom <= (budget - cumBefore) * w
      cumBefore += a; wFrom -= w
      (s, a, w, capped)
    }
    val bStar = budget -
      flagged.iterator.collect { case (_, a, _, true) => a }.sum
    val freeW =
      flagged.iterator.collect { case (_, _, w, false) => w }.sum
    flagged.map { case (s, a, w, c) =>
      (s, a, w, if (c) a else math.max(0L, bStar * w / freeW), c)
    }
  }
}
