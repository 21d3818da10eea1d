package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipelines.TextAnalysis

/** Text-analysis pipeline: tokenization, quality features, language ID,
  * fingerprints.
  */
class TextAnalysisSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("temperatureShares: α=1 natural, α=0 flat, 0<α<1 boosts low-resource") {
    import graft.pipelines.TextAnalysis
    val df = Seq(("en", 900L), ("de", 90L), ("fr", 10L))
      .toDF("lang", "tok")
    def shares(a: Double) =
      TextAnalysis.temperatureShares(df, $"lang", $"tok", a)
    val s1 = shares(1.0)
    assert(math.abs(s1("en") - 0.9) < 1e-9)
    assert(math.abs(s1("fr") - 0.01) < 1e-9)
    val s0 = shares(0.0)
    assert(s0.values.forall(v => math.abs(v - 1.0 / 3) < 1e-9))
    val sh = shares(0.5)
    assert(sh("fr") > s1("fr") && sh("en") < s1("en")) // flattened
    assert(math.abs(sh.values.sum - 1.0) < 1e-6)
  }

  test("token counts: whitespace vs BPE-ish pre-split") {
    val df = Seq("Hello, world! 42 tokens?").toDF("text")
    val r = df.select(
      TextAnalysis.tokenCountWs($"text"),
      TextAnalysis.tokenCountBpe($"text")).collect()(0)
    assert(r.getInt(0) === 4)
    // hello , world ! 42 tokens ? → 7
    assert(r.getInt(1) === 7)
  }

  test("quality features: ratios on a known string") {
    val df = Seq((1L, "the cat sat")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityFeatures(df, $"text").collect()(0)
    assert(r.getAs[Long]("n_words") === 3L)
    assert(r.getAs[Double]("alpha_ratio") === 0.818182) // 9 alpha / 11 chars
    assert(r.getAs[Double]("punct_ratio") === 0.0)
    assert(r.getAs[Double]("stopword_ratio") === 0.333333) // "the"
    assert(r.getAs[Double]("mean_word_len") === 3.0) // (11-3+1)/3
  }

  test("quality score is in [0,1] and rises with stopword evidence") {
    val df = Seq((1L, "xqz vgw pltk"), (2L, "the cat is on the mat and it is a hat"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.qualityScore(df, $"text")
      .orderBy("doc_id").select("quality").as[Double].collect()
    assert(got.forall(q => q >= 0.0 && q <= 1.0))
    assert(got(1) > got(0))
  }

  test("qualityRules: each rule fires on its own violation") {
    // a clean passing doc: varied words, stopwords present, no
    // formatting pathologies, no repeated shingles
    val base = "the cat sat on a warm mat near the door and it did like " +
      "that spot for one lazy day then a big dog came to rest close by " +
      "and all was good in the afternoon sun"
    val df = Seq(
      (1L, base),                                     // passes everything
      (2L, "too short"),                              // fails word count
      (3L, base + " ### # ### # ### #"),              // fails symbols
      (4L, "zest quarrel wisdom velvet kestrel motif garden lamp " +
        "meadow bay copper vine"),                    // fails stopwords
      (5L, "- the cat ran far one\n- a dog sat down two\n" +
        "- it went up high three\n- is this fine now four\n" +
        "- of them all here five\n- to go out there six\n" +
        "- in all ways good seven\n- for me and you eight\n" +
        "- on top so very nine\n- and so it ends ten"), // fails bullet ratio
      (6L, "the cat sat still...\nand a dog ran far...\nit is quiet now...\n" +
        "for all of us here...\nin a sunny field\nis it any good\n" +
        "the end is not near\nfor it to be done\nand on we gladly go\n" +
        "it is a fine wrap"),                         // fails ellipsis ratio
      (7L, "the 111 222 333 444 555 666 777 888 999 a 000 12 34"),
                                                      // fails alpha-word ratio
      (8L, ("the cat sat on the mat " * 8).trim),     // fails repetition
      // 5 copies of a one-word line among 6 unique content lines: the
      // duplicate-LINE fraction fires while the word stream's trigrams
      // stay distinct (repetition passes)
      (9L, "the cat sat warm\nmenu\nand a dog ran far\nmenu\n" +
        "it is quiet now\nmenu\nfor all of us here\nmenu\n" +
        "in a sunny field\nmenu"),
      // a repeated single-line paragraph diluted by two big unique
      // multi-line paragraphs: dup-PARAGRAPH fires, dup-line stays
      // under threshold (2 dup lines of 13)
      (10L, "the cat sat on a mat\nand a dog ran far off\n" +
        "it is a quiet day\nfor all of us here\nin a sunny field\n\n" +
        "contact us about this offer\n\n" +
        "the barn owl went out late\nand the fox hid down low\n" +
        "it was a dark cool night\nfor the two of them\nin the old wood\n\n" +
        "contact us about this offer\n\ncontact us about this offer"),
      // one bigram owns most of the characters while every trigram is
      // unique (the joining stopwords differ): top-bigram fires alone
      (11L, "stormy watch the stormy watch a stormy watch of " +
        "stormy watch and stormy watch to stormy watch in " +
        "stormy watch is stormy watch it stormy watch for stormy watch on"))
      .toDF("doc_id", "text")
    val rules = Seq("pass_words", "pass_word_len", "pass_symbols",
      "pass_stops", "pass_bullets", "pass_ellipsis", "pass_alpha_words",
      "pass_repetition", "pass_dup_lines", "pass_dup_paras",
      "pass_top_bigram")
    val got = TextAnalysis.qualityRules(df, $"text",
        minWords = 10, maxWords = 100, minMeanWordLen = 2.0,
        maxMeanWordLen = 6.0, maxSymbolRatio = 0.1, minStopHits = 2)
      .orderBy("doc_id")
      .select((rules :+ "keep").map(col): _*)
      .collect()
    assert(got(0).toSeq === Seq.fill(12)(true))
    // expected failures per violator; doc 8's eight-fold body repeat
    // legitimately concentrates characters in one bigram too, so the
    // top-bigram rule co-fires with repetition there
    val expectFail = Map(
      2 -> Set("pass_words"), 3 -> Set("pass_symbols"),
      4 -> Set("pass_stops"), 5 -> Set("pass_bullets"),
      6 -> Set("pass_ellipsis"), 7 -> Set("pass_alpha_words"),
      8 -> Set("pass_repetition", "pass_top_bigram"),
      9 -> Set("pass_dup_lines"), 10 -> Set("pass_dup_paras"),
      11 -> Set("pass_top_bigram"))
    expectFail.foreach { case (id, fails) =>
      val row = got(id - 1)
      fails.foreach { rule =>
        assert(row.getAs[Boolean](rule) === false,
          s"doc $id should fail $rule")
      }
      assert(row.getAs[Boolean]("keep") === false, s"doc $id should be dropped")
    }
    // and each violator fails ONLY its expected rules (word-count doc
    // aside, whose two-word body legitimately also misses the stopword
    // floor and, at two words, the one-bigram-owns-the-text rule)
    expectFail.filterNot(_._1 == 2).foreach { case (id, fails) =>
      val row = got(id - 1)
      rules.filterNot(fails).foreach { other =>
        assert(row.getAs[Boolean](other) === true,
          s"doc $id should pass $other")
      }
    }
  }

  test("dsirWeights: target-like docs outrank out-of-target docs") {
    // 6 English-slice docs (the target), 6 invented-vocabulary docs,
    // plus one doc OUTSIDE the target slice whose words look like the
    // target — DSIR's whole point is that it scores high anyway
    val target = (1L to 6L).map(i =>
      (i, "en", "the cat sat on the mat and it was good"))
    val ood = (7L to 12L).map(i =>
      (i, "xx", "zork blag frum qux gleep snarf vex jubb"))
    val lookalike = (13L, "xx", "the cat sat on a mat and it was fine")
    val df = (target ++ ood :+ lookalike).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.dsirWeights(df, "doc_id", $"text",
        $"lang" === "en")
      .orderBy("doc_id").select("weight_micro").as[Long].collect()
    assert(got(0) > 0, "target doc should score positive")
    assert(got(6) < 0, "out-of-distribution doc should score negative")
    assert(got(12) > got(6),
      "target-looking doc outside the slice should outrank true OOD")
    // bit-identical under a different partitioning (integer micro-units)
    val re = TextAnalysis.dsirWeights(df.repartition(7), "doc_id",
        $"text", $"lang" === "en")
      .orderBy("doc_id").select("weight_micro").as[Long].collect()
    assert(re.toSeq === got.toSeq)
  }

  test("unigramLogProb: out-of-distribution docs score higher") {
    // 9 docs of common words + 1 of corpus-rare words: the rare doc's
    // mean -ln p must dominate
    val common = (1L to 9L).map(i => (i, "the cat sat on the mat"))
    val df = (common :+ (10L, "zyx qwv plk jhg")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProb(df, "doc_id", $"text")
      .orderBy("doc_id").select("avg_nll").as[Double].collect()
    assert(got(9) > got(0) * 2)
    // reproducible under a different partitioning (micro-unit sums)
    val re = TextAnalysis.unigramLogProb(df.repartition(7), "doc_id",
        $"text")
      .orderBy("doc_id").select("avg_nll").as[Double].collect()
    assert(re.toSeq === got.toSeq)
  }

  test("bigramLogProb: improbable transitions score higher at equal unigram mix") {
    // 9 docs of the same sentence + 1 doc that PERMUTES those exact
    // words: unigram stats are near-identical, but the shuffled
    // transitions are corpus-rare, so only the bigram score separates
    val common = (1L to 9L).map(i => (i, "the cat sat on the mat"))
    val df = (common :+ (10L, "mat the on cat the sat"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramLogProb(df, "doc_id", $"text")
      .orderBy("doc_id").select("avg_nll_bigram").as[Double].collect()
    assert(got(9) > got(0) * 1.5,
      "word salad must score well above in-distribution prose")
    // and the unigram score must NOT separate them (the point of t21)
    val uni = TextAnalysis.unigramLogProb(df, "doc_id", $"text")
      .orderBy("doc_id").select("avg_nll").as[Double].collect()
    assert(uni(9) < uni(0) * 1.1)
    // bit-identical under a different partitioning (micro-unit sums)
    val re = TextAnalysis.bigramLogProb(df.repartition(7), "doc_id",
        $"text")
      .orderBy("doc_id").select("avg_nll_bigram").as[Double].collect()
    assert(re.toSeq === got.toSeq)
  }

  test("backoffLogProb: unseen transitions back off, are counted, and score high") {
    // train slice: 9 copies of one sentence; scored corpus adds a doc
    // that permutes those exact words (every transition novel) and a
    // doc with an OOV word (the add-one unigram floor)
    val rows = (1L to 9L).map(i => (i, "the cat sat on the mat", true)) ++
      Seq((10L, "mat the on cat the sat", false),
        (11L, "the zyx sat", false))
    val df = rows.toDF("doc_id", "text", "is_train")
    val got = TextAnalysis.backoffLogProb(df, "doc_id", $"text",
        $"is_train")
      .orderBy("doc_id")
      .select("avg_nll_backoff", "n_tokens", "n_backoff")
      .as[(Double, Long, Long)].collect()
    // in-distribution docs never back off
    assert(got(0)._3 === 0L)
    // every transition of the permuted doc is novel to the model
    assert(got(9)._3 === 6L)
    assert(got(9)._1 > got(0)._1 * 1.5,
      "novel transitions must score well above in-distribution prose")
    // the OOV doc backs off on (the→zyx) and (zyx→sat) only
    assert(got(10)._3 === 2L)
    // bit-identical under a different partitioning (micro-unit sums)
    val re = TextAnalysis.backoffLogProb(df.repartition(7), "doc_id",
        $"text", $"is_train")
      .orderBy("doc_id").select("avg_nll_backoff").as[Double].collect()
    assert(re.toSeq === got.map(_._1).toSeq)
  }

  test("languageIdNgram: trigram profiles identify short marker-free docs") {
    val df = Seq(
      // German with none of the six stopword markers — the trigram
      // morphology ("sch", "cht", "ich") is the only signal
      (1L, "schlechtes wetter macht schnelle fahrten gefährlich"),
      (2L, "the quick brown fox jumped over the lazy dog"),
      (3L, "nous partons rapidement pour les montagnes"),
      (4L, "los estados grandes tienen ciudades hermosas"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.languageIdNgram(df, $"text")
      .orderBy("doc_id").select("lang_pred").as[String].collect()
    assert(got.toSeq === Seq("de", "en", "fr", "es"))
    // the stopword profiles have zero signal on doc 1 (every language
    // scores 0 → arbitrary tie-break); the trigram profiles do not
    val stop = TextAnalysis.languageId(df, $"text")
      .orderBy("doc_id").select("lang_score").as[Double].collect()
    assert(stop(0) === 0.0)
  }

  test("CJK documents pass the quality gate via the unit count") {
    // a ~500-char Chinese news paragraph: n_words (whitespace tokens)
    // is 1, so the English-tuned gate would silently discard it — the
    // CJK path (n_units = words + CJK code points, Latin-specific
    // rules bypassed at cjk_ratio ≥ 0.3) must keep it
    val zhPara = ("本报记者今天在北京报道，这是一个关于大数据处理系统的新闻。" +
      "我们的研究人员说，他们在过去的一年中对这个问题进行了大量的分析工作。" +
      "结果表明，新的方法能够在很大的数据集上得到更好的效果，速度也比以前快了很多。" +
      "专家认为，这样的技术对国家的发展有重要的意义，也能为人们的生活带来方便。" +
      "很多公司已经开始使用这个系统来处理他们每天产生的大量数据。" +
      "学校和研究所也在教学生怎么使用这些新的工具。" +
      "他说，我们会继续努力，把这项工作做得更好，让更多的人从中受益。") * 3
    assert(zhPara.length >= 500)
    val en = "the cat sat on a warm mat near the door and it did like " +
      "that spot for one lazy day then a big dog came to rest close by " +
      "and all was good in the afternoon sun"
    val df = Seq((1L, zhPara), (2L, en), (3L, "短文")) // 2 chars: too short
      .toDF("doc_id", "text")
    val got = TextAnalysis.qualityRules(df, $"text",
        minWords = 25, maxWords = 10000, minMeanWordLen = 3.0,
        maxMeanWordLen = 5.0, maxSymbolRatio = 0.05, minStopHits = 2)
      .orderBy("doc_id").collect()
    assert(got(0).getAs[Boolean]("keep") === true, "zh paragraph dropped")
    assert(got(0).getAs[Double]("cjk_ratio") > 0.8)
    assert(got(0).getAs[Long]("n_units") > 400L)
    // the English doc still rides the original rules (cjk_ratio 0)
    assert(got(1).getAs[Boolean]("keep") === true)
    assert(got(1).getAs[Double]("cjk_ratio") === 0.0)
    assert(got(1).getAs[Long]("n_units") === got(1).getAs[Long]("n_words"))
    // a 2-character fragment fails the unit floor, CJK or not
    assert(got(2).getAs[Boolean]("pass_words") === false)
  }

  test("languageIdNgram identifies zh/ja/ru alongside the Latin four") {
    val df = Seq(
      (1L, "我们的研究人员说，他们对这个问题进行了大量的分析工作，" +
        "结果是新的方法能够得到更好的效果。"),
      (2L, "これは新しいシステムについての記事です。この方法がとても" +
        "速いことを示しました。"),
      (3L, "Исследователи нового метода показали, что эта программа " +
        "для обработки данных работает очень быстро и надежно, и она " +
        "полезна для многих людей и организации."),
      (4L, "the quick brown fox jumped over the lazy dog and then ran"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.languageIdNgram(df, $"text")
      .orderBy("doc_id")
      .select("lang_pred", "lang_score").as[(String, Double)].collect()
    assert(got.map(_._1).toSeq === Seq("zh", "ja", "ru", "en"))
    assert(got.forall(_._2 > 0.2), got.mkString(", "))
  }

  test("scriptRatios: per-script code-point fractions") {
    val df = Seq(
      (1L, "hello world"),            // no non-Latin scripts
      (2L, "这是中文"),                // 4 Han / 4 chars
      (3L, "これはテスト"),            // 6 kana / 6 chars
      (4L, "한국어 텍스트"),            // 6 hangul / 7 chars (one space)
      (5L, "Это текст"),              // 8 cyrillic / 9 chars
      (6L, "نص عربي"))                // 6 arabic / 7 chars
      .toDF("doc_id", "text")
    val got = TextAnalysis.scriptRatios(df, $"text").orderBy("doc_id")
      .select("han_ratio", "kana_ratio", "hangul_ratio",
        "cyrillic_ratio", "arabic_ratio")
      .as[(Double, Double, Double, Double, Double)].collect()
    assert(got(0) === ((0.0, 0.0, 0.0, 0.0, 0.0)))
    assert(got(1)._1 === 1.0)
    assert(got(2)._2 === 1.0)
    assert(got(3)._3 === 0.857143)
    assert(got(4)._4 === 0.888889)
    assert(got(5)._5 === 0.857143)
  }

  test("passage dedup: shared chunk survives once, reassembly is ordered") {
    import org.apache.spark.sql.expressions.Window
    // two docs share their first 5-word passage; chunking at 5 words
    // with stride 5 makes it one chunk — dedup must keep doc 1's copy
    // and doc 2 must reassemble to its unique remainder, in order
    val shared = "alpha beta gamma delta epsilon"
    val df = Seq(
      (1L, shared + " one two three four five"),
      (2L, shared + " six seven eight nine ten"))
      .toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkWords(df, $"text", 5, 5)
      .select($"doc_id", $"chunk_ix", $"chunk")
      .withColumn("fp", TextAnalysis.fingerprint($"chunk"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("fp").orderBy("doc_id", "chunk_ix")))
      .filter($"rn" === 1)
    val rebuilt = chunks.groupBy("doc_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct($"chunk_ix", $"chunk"))),
          x => x.getField("chunk")), " ").as("clean"))
      .orderBy("doc_id").select("clean").as[String].collect()
    assert(rebuilt(0) === shared + " one two three four five")
    assert(rebuilt(1) === "six seven eight nine ten")
  }

  test("languageId: marker-word argmax picks the right language") {
    val df = Seq(
      (1L, "the cat and the dog went to the park"),
      (2L, "der hund ist nicht und das ist gut"),
      (3L, "le chat et les chiens est des amis"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.languageId(df, $"text")
      .orderBy("doc_id").select("lang_pred").as[String].collect()
    assert(got.toSeq === Seq("en", "de", "fr"))
  }

  test("fingerprint: whitespace/case-insensitive, content-sensitive") {
    val df = Seq((1L, "Hello  World"), (2L, "hello world"), (3L, "other"))
      .toDF("doc_id", "text")
    val fp = df.select(TextAnalysis.fingerprint($"text")).as[Long].collect()
    assert(fp(0) === fp(1))
    assert(fp(0) !== fp(2))
  }

  test("stratifiedHashSample: per-stratum rates honored, reproducible") {
    val df = (0L until 4000L).map(i =>
      (i, if (i % 2 == 0) "en" else "de")).toDF("doc_id", "lang")
    def run() = TextAnalysis.stratifiedHashSample(df, $"doc_id", $"lang",
      Map("en" -> 0.5, "de" -> 0.1), default = 0.0, salt = "s1")
    val got = run().groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(math.abs(got("en") - 1000L) < 150, got) // ~50% of 2000
    assert(math.abs(got("de") - 200L) < 80, got)   // ~10% of 2000
    // deterministic: same salt → identical sample; decision is per-row
    assert(run().select("doc_id").as[Long].collect().toSet ===
      run().select("doc_id").as[Long].collect().toSet)
  }

  test("quality clf separates gate-passing spam from prose; rules do not") {
    // fluent keyword-stuffing: sentence-shaped, stopword-bearing,
    // varied trigrams — engineered to sail through every structural
    // rule, which is exactly the gap the learned classifier closes
    val prose = Seq(
      "The committee reviewed the annual report in detail and concluded that the results were broadly in line with expectations for the year. Several members asked for further analysis of the regional figures, and the chair agreed to circulate a revised summary before the next scheduled meeting in October so that everyone could prepare properly.",
      "When the storm finally passed, the villagers came down to the harbour to inspect the boats and found that most of the damage was limited to torn sails and a few broken spars. The older fishermen said it had been the worst wind in thirty years, though the records kept by the harbourmaster suggested otherwise.",
      "Researchers at the institute published a study describing how migratory birds adjust their routes in response to shifting weather patterns. The work, which drew on two decades of tracking data, suggests that some species are far more flexible than previously believed and can relocate their stopover sites by hundreds of kilometres.",
      "The library reopened after the renovation with longer opening hours and a new reading room on the second floor. Visitors praised the quiet atmosphere and the improved lighting, while staff noted that the catalogue migration had gone smoothly and that most requests were now being fulfilled within a single working day.")
    val spam = Seq(
      "Shop the best deals today and save big on every order with our amazing discount codes. Buy now and get free shipping to your door, plus exclusive offers on watches, bags, shoes and jewellery. Do not miss this limited chance to win great prizes and earn cash back on all your favourite brands online.",
      "Get the lowest prices on cheap flights and hotel rooms when you book through our site today. Huge savings await you, with special offers updated daily and bonus points on every purchase. Join millions of happy customers and claim your welcome voucher now before this incredible promotion ends, because our friendly team is standing by to help you save even more.",
      "Earn money fast from home with this simple trick that banks do not want you to know. Sign up today for instant access to our proven system, unlock premium tips and start winning big right away. Thousands already cashed out their rewards, so click now and secure your free bonus offer.",
      "Best casino games and live betting odds are waiting for you with a huge welcome bonus on your first deposit. Spin the wheel today for free coins, claim daily rewards and enjoy instant payouts. Download now and join the top players winning real cash prizes every single hour of the day.")
    val docs = (prose.map((_, true)) ++ spam.map((_, false))).zipWithIndex
      .map { case ((t, hi), i) => (i.toLong, t, hi) }
      .toDF("id", "text", "hi")
    // rules alone: EVERY doc (spam included) passes the gate
    val gate = TextAnalysis.qualityRules(docs, $"text")
      .select($"id", $"keep").as[(Long, Boolean)].collect().toMap
    assert(gate.values.forall(identity),
      s"spec premise: all docs must pass the rules gate, got $gate")
    // train on 3 of each class, hold out one of each (ids 3 and 7)
    val train = docs.filter($"id" =!= 3L && $"id" =!= 7L)
    val model = TextAnalysis.trainQualityClf(train, $"text", $"hi")
    assert(model.priorMicro === 0L) // balanced split
    val got = TextAnalysis.scoreQualityClf(
        docs.filter($"id" === 3L || $"id" === 7L), $"text", model)
      .select($"id", $"clf_pass").as[(Long, Boolean)].collect().toMap
    assert(got(3L) === true)  // held-out prose keeps
    assert(got(7L) === false) // held-out spam drops
  }

  test("native text counters match the declarative twins on the corpus") {
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
      .select("doc_id", "text")
    val cols = Seq("n_words", "alpha_ratio", "punct_ratio",
      "stopword_ratio", "mean_word_len")
    val native = TextAnalysis.qualityFeatures(docs, $"text")
      .select("doc_id", cols: _*)
    val decl = TextAnalysis.qualityFeaturesDeclarative(docs, $"text")
      .select("doc_id", cols: _*)
    assert(native.exceptAll(decl).isEmpty && decl.exceptAll(native).isEmpty)
    // tok_bpe: native counter ≡ declarative regexp_extract_all count
    val tokDiff = docs.select(
        element_at(TextAnalysis.textCounts($"text"), 5).as("n"),
        TextAnalysis.tokenCountBpe($"text").cast("long").as("d"))
      .filter($"n" =!= $"d").count()
    assert(tokDiff === 0)
    // n_cjk: native counter ≡ declarative CjkClass count — checked on
    // mixed-script literals (the corpus is Latin, so it alone would
    // only prove 0 ≡ 0)
    val mixed = (docs.select($"text") union Seq(
      "英語 and 中文 mixed カタカナ text 한국어",
      "これは日本語です", "pure latin", "Ещё кириллица",
      "").toDF("text")).select(
        element_at(TextAnalysis.textCounts($"text"), 6).as("n"),
        size(regexp_extract_all($"text",
          lit(TextAnalysis.CjkClass), lit(0))).cast("long").as("d"))
    assert(mixed.filter($"n" =!= $"d").count() === 0)
  }

  test("native DupStructure matches the declarative split form") {
    graft.expressions.GraftFunctions.register(spark)
    // pathological line/paragraph shapes: every stripped separator,
    // dangling single newlines, runs of 2+, leading/trailing blanks,
    // whitespace-only lines (non-empty by contract), and duplicates
    val docs = (Tables(spark, "/root/testdata/sf0.001").documents
      .select($"text") union Seq(
        "a\nb\na\nb\na", "a\n\nb\n\na", "one line",
        "a\r\nb\r\na", "ab c d", "",
        "\n\nx\n\n", "x\n", "x\ny\n\nx\ny", "  \n  \nz",
        "p one\nstill p one\n\np two\n\np one\nstill p one",
        "tail newline\n\nkeeps\n", "\n\n\n", "a\n\n\n\nb"
      ).toDF("text"))
    val lineText =
      regexp_replace($"text", "[\\r\\u0085\\u2028\\u2029]", "")
    val neLines = filter(split(lineText, "\n", -1), l => l =!= "")
    val paras = filter(split(lineText, "\\n{2,}", -1), p => p =!= "")
    val ds = call_function("graft_dup_structure", $"text")
    val diff = docs.select(
        element_at(ds, 1).as("nl"), element_at(ds, 2).as("dl"),
        element_at(ds, 3).as("np"), element_at(ds, 4).as("dp"),
        size(neLines).cast("long").as("enl"),
        size(array_distinct(neLines)).cast("long").as("edl"),
        size(paras).cast("long").as("enp"),
        size(array_distinct(paras)).cast("long").as("edp"))
      .filter($"nl" =!= $"enl" || $"dl" =!= $"edl" ||
        $"np" =!= $"enp" || $"dp" =!= $"edp")
    assert(diff.count() === 0, diff.collect().mkString("; "))
  }

  test("native languageId matches the declarative twin on the corpus") {
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
      .select("doc_id", "text")
    val native = TextAnalysis.languageId(docs, $"text")
      .select("doc_id", "lang_pred", "lang_score")
    val decl = TextAnalysis.languageIdDeclarative(docs, $"text")
      .select("doc_id", "lang_pred", "lang_score")
    assert(native.exceptAll(decl).isEmpty && decl.exceptAll(native).isEmpty)
  }

  test("tokenBudgetMix: achieved tokens track target shares; rates cap at 1") {
    // en: 4000 docs × 100 tokens = 400k inventory; de: 40 × 100 = 4k
    val df = ((0L until 4000L).map(i => (i, "en", 100L)) ++
      (0L until 40L).map(i => (10000L + i, "de", 100L)))
      .toDF("doc_id", "lang", "tok")
    val got = TextAnalysis.tokenBudgetMix(df, $"doc_id", $"lang", $"tok",
        targetShares = Map("en" -> 0.5, "de" -> 0.5),
        tokenBudget = 100000L, salt = "m")
      .groupBy("lang").agg(sum($"tok").as("t"))
      .as[(String, Long)].collect().toMap
    // en target: 50k of 400k → rate 0.125; hash sampling lands near it
    assert(math.abs(got("en") - 50000L) < 15000L, got)
    // de target (50k) exceeds inventory (4k) → rate caps at 1, all kept
    assert(got("de") === 4000L)
  }

  test("deterministicShuffle: exact permutation, reproducible, salt-keyed") {
    val df = (1L to 100L).toDF("id")
    def run(salt: String) =
      TextAnalysis.deterministicShuffle(df, $"id", salt)
        .select("id", "_rn").as[(Long, Long)].collect().toMap
    val e0 = run("epoch-0")
    assert(e0.values.toSeq.sorted === (1L to 100L)) // ranks are 1..n exactly
    assert(e0 === run("epoch-0"))                   // reproducible
    assert(e0 !== run("epoch-1"))                   // salt reshuffles
    // and it is not the identity order
    assert(e0.count { case (id, rn) => id == rn } < 20)
    graft.Caches.releaseAll()
  }

  test("chunkWords: stride windows with overlap; empty docs drop out") {
    val df = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")),
      (2L, "   "))
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkWords(df, $"text", chunkSize = 4, stride = 3)
      .select("doc_id", "chunk_ix", "chunk_tokens", "chunk")
      .as[(Long, Int, Int, String)].collect().sortBy(r => (r._1, r._2))
    assert(got.map(_._1).forall(_ == 1L)) // whitespace-only doc: no chunks
    assert(got.map(_._4).toSeq === Seq(
      "w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10", "w10"))
    assert(got.map(_._3).toSeq === Seq(4, 4, 4, 1))
  }

  test("tfidfTopTerms: rare terms outrank common ones; ranks per doc") {
    val df = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana banana durian"),
      (3L, "banana fig"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(df, "doc_id", $"text", topN = 2)
      .select("doc_id", "term", "rank")
      .as[(Long, String, Int)].collect()
      .groupBy(_._1).map { case (k, v) =>
        k -> v.sortBy(_._3).map(_._2).toSeq }
    // "banana" appears in every doc (idf floor) → doc-unique terms win;
    // doc 1: apple tf=2/4 beats cherry tf=1/4 (same idf)
    assert(got(1L) === Seq("apple", "cherry"))
    assert(got(2L).head === "durian" || got(2L).head === "banana")
    // the common term never outranks a same-tf unique term
    assert(got(3L).head === "fig")
    graft.Caches.releaseAll()
  }

  test("packSequences: bins fill in order, capacity respected") {
    val df = (1L to 10L).map(i => (i, "en", "x " * 99 + "x"))
      .toDF("doc_id", "lang", "text") // 100 tokens each
    val got = TextAnalysis.packSequences(df, $"lang", $"doc_id",
        TextAnalysis.tokenCountWs($"text"), window = 250)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    // exclusive prefix sums 0,100,...,900 over window 250 →
    // bins 0,0,0,1,1,2,2,2,3,3
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L,
      6L -> 2L, 7L -> 2L, 8L -> 2L, 9L -> 3L, 10L -> 3L))
  }

  test("invertedIndex: sorted doc:tf postings; df gates prune") {
    val docs = Seq(
      (11L, "apple apple banana stop"),
      (2L,  "apple cherry stop"),
      (3L,  "banana stop"),
      (4L,  "stop")) // 'stop' in 4/4 docs; 'cherry' in 1
      .toDF("doc_id", "text")
    val got = TextAnalysis.invertedIndex(docs, "doc_id", $"text",
        minDf = 2, maxDfFraction = 0.75)
      .orderBy("word")
      .select("word", "df", "postings")
      .as[(String, Long, Seq[String])].collect()
    assert(got.map(_._1).toSeq === Seq("apple", "banana"),
      "cherry (df 1 < minDf) and stop (df 4 > 0.75·4) pruned")
    val apple = got(0)
    assert(apple._2 === 2L)
    // doc 2 sorts before doc 11 because the pad makes lexicographic
    // order numeric; tf of doc 11 is 2
    assert(apple._3 === Seq("000000000002:1", "000000000011:2"))
    assert(got(1)._3 === Seq("000000000003:1", "000000000011:1"))
  }

  test("zipfAlpha: recovers the exponent of a planted power law") {
    // word_r appears ⌊2000/r⌋ times (r = 1..20): freq ∝ rank⁻¹, so
    // the fitted alpha must sit near 1; a flat (all-equal) vocabulary
    // must fit alpha near 0
    val zipfText = (1 to 20).flatMap { r =>
      Seq.fill(2000 / r)(f"w$r%02d")
    }.mkString(" ")
    val got = TextAnalysis.zipfAlpha(
        Seq((1L, zipfText)).toDF("doc_id", "text"), $"text", topK = 20)
      .collect()(0)
    assert(got.getAs[Long]("n_terms") === 20L)
    assert(got.getAs[Long]("top_freq") === 2000L)
    val alpha = got.getAs[Double]("zipf_alpha")
    assert(alpha > 0.95 && alpha < 1.05, s"expected ~1, got $alpha")

    val flatText = (1 to 20).flatMap(r => Seq.fill(50)(f"w$r%02d"))
      .mkString(" ")
    val flat = TextAnalysis.zipfAlpha(
        Seq((1L, flatText)).toDF("doc_id", "text"), $"text", topK = 20)
      .collect()(0).getAs[Double]("zipf_alpha")
    assert(math.abs(flat) < 1e-9, s"flat vocabulary must fit 0, got $flat")
  }

  test("pmiCollocations: exclusive phrases outrank frequent-word pairs") {
    // 'new'/'york' occur ONLY as the phrase (unigram count == pair
    // count); 'the' and 'red' are 3× more frequent and adjacent just
    // as often — PMI must discount their adjacency by the high
    // unigram expectation and rank the exclusive phrase first
    val docs = (1L to 6L).map { i =>
      (i, "the red cat the dog red new york the fish red bird")
    }.toDF("doc_id", "text")
    val got = TextAnalysis.pmiCollocations(docs, "doc_id", $"text",
        minCount = 2, topN = 50)
      .select("prev", "word", "pmi").as[(String, String, Double)]
      .collect()
    val top = got.head
    assert((top._1, top._2) === ("new", "york"),
      s"phrase must rank first, got $top")
    val pmiOf = got.map(t => (t._1, t._2) -> t._3).toMap
    assert(pmiOf(("new", "york")) > pmiOf(("the", "red")),
      "exclusive collocation beats equally-adjacent frequent words")
    assert(got.map(_._3).toSeq === got.map(_._3).sortBy(-_).toSeq)
  }

  test("pmiCollocations: minCount suppresses singleton pairs") {
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha beta"),
      (2L, "gamma delta")) // gamma→delta appears once
      .toDF("doc_id", "text")
    val pairs = TextAnalysis.pmiCollocations(docs, "doc_id", $"text",
        minCount = 2, topN = 50)
      .select("prev", "word").as[(String, String)].collect().toSet
    assert(pairs.contains(("alpha", "beta")))
    assert(!pairs.contains(("gamma", "delta")))
  }

  test("bm25TopK: rare terms outrank common ones; length norm demotes") {
    // 'rare' appears in one doc, 'common' in all four — idf must make
    // the rare match dominate. Docs 3 and 4 have the same tf of
    // 'common' but doc 4 is padded much longer: length normalization
    // must rank the short one higher.
    val docs = Seq(
      (1L, "rare common alpha beta gamma delta"),
      (2L, "common alpha beta gamma delta epsilon"),
      (3L, "common common alpha beta gamma delta"),
      (4L, "common common alpha beta gamma delta " + ("pad " * 40)))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, "doc_id", $"text",
        queryTerms = Seq("rare", "common"), topN = 10)
      .select("doc_id", "score", "n_hits").as[(Long, Double, Long)]
      .collect()
    assert(got.head._1 === 1L, "the only doc with the rare term wins")
    assert(got.head._3 === 2L, "doc 1 matches both query terms")
    val byId = got.map(t => t._1 -> t._2).toMap
    assert(byId(3L) > byId(4L),
      "same tf, longer doc scores lower (b-normalization)")
    assert(got.map(_._2).toSeq === got.map(_._2).sortBy(-_).toSeq,
      "output is ranked")
  }

  test("bm25TopK: tf saturates — k1 bounds the repeat-term payoff") {
    // doubling tf from 1→8 must buy less than (k1+1)/1·… linear growth:
    // the per-term contribution is bounded by idf·(k1+1)
    val docs = Seq(
      (1L, "term " * 1 + "x " * 7),
      (2L, "term " * 8))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, "doc_id", $"text",
        queryTerms = Seq("term"), topN = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(got(2L) > got(1L), "higher tf still scores higher")
    assert(got(2L) < got(1L) * 8,
      "but sub-linearly: saturation caps the gain")
  }

  test("oovRate: per-doc share vs top-K vocab; asc tie-break at the cut") {
    import graft.pipelines.TextAnalysis
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "z z z q"))
      .toDF("doc_id", "text")
    val got2 = TextAnalysis.oovRate(docs, "doc_id", $"text", vocabSize = 2)
      .orderBy("doc_id")
      .select("n_words", "n_oov", "oov_share")
      .as[(Long, Long, Double)].collect()
    // vocab = {a, z} (3 each); b/c/q are OOV
    assert(got2.toSeq === Seq((3L, 1L, 0.333333), (2L, 1L, 0.5),
      (4L, 1L, 0.25)))
    // K=3: the third slot ties at n=1 between b/c/q → word-asc picks b
    val got3 = TextAnalysis.oovRate(docs, "doc_id", $"text", vocabSize = 3)
      .orderBy("doc_id").select("n_oov").as[Long].collect()
    assert(got3.toSeq === Seq(0L, 1L, 1L))
  }

  test("lineDedup: corpus-wide lines strip, per-doc order kept") {
    val docs = Seq(
      (1L, "banner\nalpha one\nfooter"),
      (2L, "banner\nbeta two\nfooter"),
      (3L, "banner\ngamma three\nbeta two\nfooter")).toDF("doc_id", "text")
    val got = TextAnalysis.lineDedup(docs, "doc_id", col("text"),
        maxDocs = 3)
      .orderBy("doc_id").collect()
    // banner/footer are in all 3 docs → dropped; "beta two" is in only
    // 2 → kept; per-doc original line order survives reassembly
    assert(got.map(r => (r.getAs[Long]("n_kept"),
      r.getAs[Long]("n_dropped"))).toSeq ===
      Seq((1L, 2L), (1L, 2L), (2L, 2L)))
    assert(got(2).getAs[String]("cleaned") === "gamma three\nbeta two")
    // threshold above the corpus count keeps everything
    val keep = TextAnalysis.lineDedup(docs, "doc_id", col("text"),
        maxDocs = 4)
      .orderBy("doc_id").collect()
    assert(keep.forall(_.getAs[Long]("n_dropped") === 0L))
    assert(keep(0).getAs[String]("cleaned") === "banner\nalpha one\nfooter")
  }

  test("fuzzy match: exact edit distances within blocks, nothing " +
    "across blocks, threshold inclusive, each pair once") {
    val recs = Seq(
      (1L, "b1", "kitten house"),   // kitten↔sitting = 3 edits
      (2L, "b1", "sitting house"),
      (3L, "b1", "kitten houze"),   // 1 edit from id 1, 4 from id 2
      (4L, "b2", "kitten house"),   // identical KEY, different block
      (5L, "b1", "completely other"))
      .toDF("id", "block", "key")
    val got = TextAnalysis.fuzzyMatchPairs(recs, maxDist = 4)
      .orderBy("id_a", "id_b").as[(Long, Long, Int)].collect().toSeq
    // (1,2)=3, (1,3)=1, (2,3)=4 (inclusive threshold); id 4 matches
    // nothing (block isolation), id 5 is past the threshold
    assert(got === Seq((1L, 2L, 3), (1L, 3L, 1), (2L, 3L, 4)))
    // tighter threshold trims, never reorders
    assert(TextAnalysis.fuzzyMatchPairs(recs, maxDist = 2)
      .orderBy("id_a", "id_b").as[(Long, Long, Int)].collect().toSeq
      === Seq((1L, 3L, 1)))
  }

  test("fuzzy match salting: skewed hot block yields the identical " +
    "pair set with hash-bounded cells") {
    // 10k keys sharing ONE 4-char prefix — the web-corpus worst case
    // (shared openers / boilerplate prefixes) where the unsalted
    // self-join would run the full n²/2 pair space in a single task.
    // Triangle salting must (a) return the byte-identical pair set and
    // (b) spread rows into hash groups no larger than ~cap, so no join
    // cell compares more than ~cap² pairs.
    val n = 10000
    val cap = 500
    val rows = (0 until n).map { i =>
      // ids 0..9: a planted near-dup family one substitution apart;
      // the rest: Knuth-hash digit tails (incidental near-pairs are
      // fine — parity, not count, is the assertion)
      val key = if (i < 10) s"AAAA st $i"
      else f"AAAA ${(i * 2654435761L) % 10000000L}%07d"
      (i.toLong, "AAAA", key)
    }
    val recs = rows.toDF("id", "block", "key")
    val salted = TextAnalysis
      .fuzzyMatchPairs(recs, maxDist = 2, blockCap = cap)
      .orderBy("id_a", "id_b").as[(Long, Long, Int)].collect().toSeq
    // reference: cap above n forces the s=1 (plain join) path
    val plain = TextAnalysis
      .fuzzyMatchPairs(recs, maxDist = 2, blockCap = n + 1)
      .orderBy("id_a", "id_b").as[(Long, Long, Int)].collect().toSeq
    assert(salted === plain)
    // the planted family (all 45 pairs at dist 1) must surface
    val family = salted.filter { case (a, b, _) => a < 10 && b < 10 }
    assert(family.size === 45 && family.forall(_._3 === 1))
    // hash balance: with s = ⌈n/cap⌉ groups, no group — and hence no
    // join-cell side — exceeds 1.5× the target cap
    val s = math.ceil(n.toDouble / cap).toInt
    val maxGroup = recs
      .groupBy(pmod(xxhash64(col("id")), lit(s.toLong)).as("g"))
      .count().agg(max("count")).as[Long].head()
    assert(maxGroup <= (cap * 3) / 2,
      s"hash group of $maxGroup rows exceeds 1.5×cap=$cap")
  }

  test("sortedNeighborPairs: adjacent near-keys chain, the window " +
    "bounds output, blocks isolate, wide window equals the exact join") {
    val recs = Seq(
      (1L, "b1", "alpha-0001"),
      (2L, "b1", "alpha-0002"),   // 1 edit from ids 1 and 3
      (3L, "b1", "alpha-0003"),
      (4L, "b1", "zzzz distant"), // same block, far in sort and edits
      (5L, "b2", "alpha-0001"))   // identical key, different block
      .toDF("id", "block", "key")
    // window=1: only sort-adjacent keys compare — the family reports
    // as the chain (1,2),(2,3); (1,3) is transitive closure's job,
    // and the identical key in b2 never crosses the block
    val chain = TextAnalysis
      .sortedNeighborPairs(recs, maxDist = 2, window = 1)
      .orderBy("id_a", "id_b").as[(Long, Long, Int)].collect().toSeq
    assert(chain === Seq((1L, 2L, 1), (2L, 3L, 1)))
    // a window at least the block size makes SNM ≡ the exact blocked
    // all-pairs join — the recall dial's upper stop
    val wide = TextAnalysis
      .sortedNeighborPairs(recs, maxDist = 2, window = 10)
      .orderBy("id_a", "id_b").as[(Long, Long, Int)].collect().toSeq
    val exact = TextAnalysis.fuzzyMatchPairs(recs, maxDist = 2)
      .orderBy("id_a", "id_b").as[(Long, Long, Int)].collect().toSeq
    assert(wide === exact && exact.size === 3)
    graft.Caches.releaseAll()
  }

  test("sortedNeighborPairsMultiPass: orthogonal sort orders recover " +
    "pairs a single pass misses; union is deduped and bounded by the " +
    "exact join") {
    // within one block, a FIRST-character typo teleports the key to
    // the other end of the forward sort; with a spacer family pushing
    // it > window rows away, pass 1 cannot see the pair — but the
    // reversed key sorts the two adjacently (shared suffix)
    val spacers = (10L to 30L).map(i => (i, "blk1", f"blk1-m$i%02d-spacer"))
    val recs = (Seq(
      (1L, "blk1", "aaaa-victim-key"),
      (2L, "blk1", "zaaa-victim-key")) ++ spacers) // 1 edit from id 1
      .toDF("id", "block", "key")
    val one = TextAnalysis
      .sortedNeighborPairs(recs, maxDist = 2, window = 3)
      .as[(Long, Long, Int)].collect().toSeq
    assert(!one.contains((1L, 2L, 1)),
      "fixture broken: single forward pass should miss the typo pair")
    val multi = TextAnalysis
      .sortedNeighborPairsMultiPass(recs, maxDist = 2, window = 3,
        Seq(col("key"), reverse(col("key"))))
      .as[(Long, Long, Int)].collect().toSeq
    assert(multi.contains((1L, 2L, 1)),
      "reversed-key pass must recover the prefix-typo pair")
    // union semantics: every single-pass pair survives, no pair
    // reports twice, and the union never exceeds the exact join
    assert(one.toSet.subsetOf(multi.toSet))
    assert(multi.size === multi.toSet.size)
    val exact = TextAnalysis.fuzzyMatchPairs(recs, maxDist = 2)
      .as[(Long, Long, Int)].collect().toSeq
    assert(multi.toSet.subsetOf(exact.toSet))
    // the sorted-chars pass keeps insertion-shifted keys adjacent:
    // same chars, one inserted char — anagram signatures share a
    // long prefix even though every downstream position shifted
    val ins = (Seq(
      (1L, "blk2", "abcdefgh-payload"),
      (2L, "blk2", "azbcdefgh-payload")) ++
      (10L to 30L).map(i => (i, "blk2", f"b$i%02d-c-d-e-f-g-h-pay")))
      .toDF("id", "block", "key")
    val schars = array_join(array_sort(split(col("key"), "")), "")
    val got = TextAnalysis
      .sortedNeighborPairsMultiPass(ins, maxDist = 2, window = 2,
        Seq(col("key"), schars))
      .as[(Long, Long, Int)].collect().toSeq
    assert(got.contains((1L, 2L, 1)),
      "anagram-signature pass must recover the insertion pair")
    graft.Caches.releaseAll()
  }

  test("snmMinGapPairs: the gap ≤ w slice of ONE max-window evaluation " +
    "equals the full multi-pass run at window w, for every w — the " +
    "nesting t41's window sweep rides on") {
    // same fixture as the multi-pass test: a prefix-typo pair only the
    // reversed-key pass sees, plus spacers so windows actually bind
    val spacers = (10L to 30L).map(i => (i, "blk1", f"blk1-m$i%02d-spacer"))
    val recs = (Seq(
      (1L, "blk1", "aaaa-victim-key"),
      (2L, "blk1", "zaaa-victim-key")) ++ spacers)
      .toDF("id", "block", "key")
    val passes = Seq(col("key"), reverse(col("key")),
      array_join(array_sort(split(col("key"), "")), ""))
    val gaps = TextAnalysis
      .snmMinGapPairs(recs, maxDist = 2, window = 8, passes)
      .as[(Long, Long, Long)].collect().toSeq
    assert(gaps.map(g => (g._1, g._2)).distinct.size === gaps.size,
      "one row per pair")
    for (w <- Seq(1, 3, 8)) {
      val slice = gaps.filter(_._3 <= w).map(g => (g._1, g._2)).toSet
      val full = TextAnalysis
        .sortedNeighborPairsMultiPass(recs, maxDist = 2, window = w,
          passes)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(slice === full, s"window $w slice must equal the full run")
    }
    graft.Caches.releaseAll()
  }

  test("multi-block fuzzy ER: a typo inside the block key is invisible " +
    "to single blocking — exact and SNM alike — and recovered by the " +
    "orthogonal suffix block; dual-visible pairs still report once") {
    // records carry (id, key); blockings are expressions over key
    val recs = Seq(
      (1L, "aaaa-shared-tail"),
      (2L, "baaa-shared-tail"),   // 1 edit INSIDE the 4-char prefix
      (3L, "cccc-unrelated-xyz")).toDF("id", "key")
    val pre = Seq(substring(col("key"), 1, 4))
    val dual = Seq(substring(col("key"), 1, 4),
      substring(col("key"), -4, 4))
    // single (prefix) blocking: the pair lands in two blocks and is
    // never even compared — the structural blind spot, shared by the
    // exact member and any recall measured against it
    assert(TextAnalysis.fuzzyMatchPairsMultiBlock(recs, maxDist = 2, pre)
      .isEmpty)
    // dual blocking: the suffix block restores it, exactly once
    assert(TextAnalysis.fuzzyMatchPairsMultiBlock(recs, maxDist = 2, dual)
      .as[(Long, Long, Int)].collect().toSeq === Seq((1L, 2L, 1)))
    // SNM inherits the same boundary and the same recovery
    assert(TextAnalysis.sortedNeighborPairsMultiBlock(recs, maxDist = 2,
      window = 4, Seq(col("key")), pre).isEmpty)
    assert(TextAnalysis.sortedNeighborPairsMultiBlock(recs, maxDist = 2,
        window = 4, Seq(col("key")), dual)
      .as[(Long, Long, Int)].collect().toSeq === Seq((1L, 2L, 1)))
    // a pair visible under BOTH blockings dedups to one report
    val both = Seq((1L, "aaaa-tail-zzzz"), (2L, "aaaa-tbil-zzzz"))
      .toDF("id", "key")
    assert(TextAnalysis.fuzzyMatchPairsMultiBlock(both, maxDist = 2, dual)
      .count() === 1L)
    assert(TextAnalysis.sortedNeighborPairsMultiBlock(both, maxDist = 2,
      window = 4, Seq(col("key"), reverse(col("key"))), dual)
      .count() === 1L)
    graft.Caches.releaseAll()
  }

  test("tokenBudgetWaterfill: caps bind exactly, splits truncate, " +
    "degenerate budgets degenerate cleanly") {
    val s = Seq(("a", 100L, 1L), ("b", 1000L, 1L), ("c", 10000L, 2L))
      .toDF("src", "avail", "w")
    def run(budget: Long) =
      TextAnalysis.tokenBudgetWaterfill(s, "src", "avail", "w", budget)
        .orderBy("source")
        .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    // budget above total availability: everyone capped at avail
    val all = run(20000L)
    assert(all.map(_._4) === Seq(100L, 1000L, 10000L))
    assert(all.forall(_._5))
    // binding budget 1300: priorities a(100) < b(1000) < c(5000);
    // a saturates (100·4 ≤ 1300·1), b and c split B*=1200 over W*=3
    val got = run(1300L)
    assert(got.map(r => (r._1, r._4, r._5)) ===
      Seq(("a", 100L, true), ("b", 400L, false), ("c", 800L, false)))
    // Σ alloc never exceeds the budget; residue < one unit per
    // uncapped source (truncating split, no redistribution)
    val tight = run(1301L)
    assert(tight.map(_._4).sum <= 1301L &&
      1301L - tight.map(_._4).sum < 2)
    // zero budget: nothing capped, all allocations zero
    assert(run(0L).map(_._4) === Seq(0L, 0L, 0L))
  }
}
