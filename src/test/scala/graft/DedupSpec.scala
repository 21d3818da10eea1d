package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipelines.Dedup

/** Dedup pipeline semantics: exact, MinHash/LSH, SimHash, n-gram
  * Jaccard — the training-data curation operators.
  */
class DedupSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "THE  QUICK   brown fox jumps over the lazy dog"), // case/ws dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"),    // near-dup of 1
    (4L, "completely different text about spark engines"),
    (5L, "hi")).toDF("doc_id", "text")                      // shorter than w

  test("words/shingles: normalization and short-text collapse") {
    val got = docs.filter($"doc_id" === 5)
      .select(Dedup.shingles($"text", 3)).as[Seq[String]].collect().head
    assert(got === Seq("hi"))
    val w1 = docs.filter($"doc_id" === 2)
      .select(Dedup.words($"text")).as[Seq[String]].collect().head
    assert(w1.head === "the" && w1.length === 9)
  }

  test("exact: case/whitespace dups collapse; lowest id survives") {
    val got = Dedup.exact(docs, "doc_id", $"text")
      .select("doc_id").as[Long].collect().sorted
    assert(got.toSeq === Seq(1L, 3L, 4L, 5L))
  }

  test("exact is idempotent (re-dedup is a no-op)") {
    val once = Dedup.exact(docs, "doc_id", $"text")
    val twice = Dedup.exact(once, "doc_id", $"text")
    assert(once.count() === twice.count())
  }

  test("minhash: identical normalized texts share the full signature") {
    val sigs = docs.filter($"doc_id".isin(1, 2))
      .select(Dedup.minhashSignature($"text", 8)).as[Seq[Long]].collect()
    assert(sigs(0) === sigs(1))
  }

  test("minhash LSH candidates: dup pair found, unrelated pair absent") {
    val pairs = Dedup.minhashCandidates(docs, "doc_id", $"text", 8, 2)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 4L)) && !pairs.contains((4L, 5L)))
  }

  test("simhash: identical texts → hamming 0; different → large distance") {
    val bits = docs.select($"doc_id", Dedup.simhashBits($"text", 32).as("b"))
    val m = bits.as[(Long, Seq[Int])].collect().toMap
    assert(m(1L) === m(2L))
    assert(m(1L).forall(b => b == 0 || b == 1) && m(1L).length === 32)
    val dist14 = m(1L).zip(m(4L)).count { case (a, b) => a != b }
    assert(dist14 > 4) // unrelated text lands far away
    val dist13 = m(1L).zip(m(3L)).count { case (a, b) => a != b }
    assert(dist13 <= dist14) // near-dup is closer than unrelated
  }

  test("simhashCandidates: exact dup pair at hamming 0") {
    val got = Dedup.simhashCandidates(docs, "doc_id", $"text")
      .as[(Long, Long, Int)].collect()
    assert(got.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
  }

  test("ngramJaccard: identical → 1.0; near-dup in (0,1); block respected") {
    val blocked = docs.withColumn("lang", lit("en"))
    val got = Dedup.ngramJaccard(blocked, "doc_id", $"text", $"lang")
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3)
      .toMap
    assert(got((1L, 2L)) === 1.0)
    assert(got.get((1L, 3L)).exists(j => j > 0.1 && j < 1.0))
    // different blocks must never pair
    val split = docs.withColumn("lang",
      when($"doc_id" <= 2, "en").otherwise("de"))
    val crossBlock = Dedup.ngramJaccard(split, "doc_id", $"text", $"lang")
      .as[(Long, Long, Double)].collect()
    assert(crossBlock.forall(p => (p._1 <= 2) == (p._2 <= 2)))
  }

  test("hamming on bit arrays") {
    val df = Seq((Seq(1, 0, 1, 0), Seq(1, 1, 0, 0))).toDF("a", "b")
    assert(df.select(Dedup.hamming($"a", $"b")).as[Int].collect().head === 2)
  }

  test("native sketch expressions match the declarative forms bit-for-bit") {
    graft.expressions.GraftFunctions.register(spark)
    val sample = docs.unionByName(Seq(
      (6L, "  Mixed\tWHITESPACE  and\nnewlines  here ok then "),
      (7L, "one")).toDF("doc_id", "text"))
    val cmp = sample.select(
      Dedup.minhashSignature($"text", 8).as("hof_mh"),
      call_function("graft_minhash_sig", $"text", lit(8)).as("nat_mh"),
      Dedup.simhashBits($"text", 32).as("hof_sh"),
      call_function("graft_simhash_bits", $"text", lit(32)).as("nat_sh"),
      array_sort(array_distinct(transform(Dedup.shingles($"text", 3),
        s => graft.functions.MarketFunctions.md5Hash60(s)))).as("hof_sg"),
      array_sort(call_function("graft_shingle_hashes60", $"text", lit(3)))
        .as("nat_sg"))
    cmp.collect().foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
      assert(r.getSeq[Int](2) === r.getSeq[Int](3))
      assert(r.getSeq[Long](4) === r.getSeq[Long](5))
    }
  }

  test("simhashParamsFor: recall chunks + corpus-scaled bucket grid") {
    for (n <- Seq(1000L, 1000000L, 1000000000L); h <- Seq(2, 3)) {
      val (nBits, chunks) = Dedup.simhashParamsFor(n, h, 4096)
      assert(chunks === h + 1) // pigeonhole recall guarantee
      assert(nBits <= 48 && nBits % chunks === 0)
      val chunkLen = nBits / chunks
      // per-chunk bucket grid ≥ n/target, unless at the 48-bit cap
      if (chunkLen < 48 / chunks)
        assert((1L << chunkLen) >= n / 4096L, s"n=$n h=$h len=$chunkLen")
    }
    // the fixed-default failure mode: 1B docs must not get 256 buckets
    val (nb, nc) = Dedup.simhashParamsFor(1000000000L, 3, 4096)
    assert(nb / nc >= 12)
    // auto mode still finds the exact dup pair
    val auto = Dedup.simhashCandidates(docs, "doc_id", $"text", nBits = -1)
      .as[(Long, Long, Int)].collect()
    assert(auto.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
    graft.Caches.releaseAll()
  }

  test("minhashParamsFor lands the S-curve near the target threshold") {
    for (t <- Seq(0.3, 0.5, 0.8); maxPerm <- Seq(16, 64)) {
      val (perm, rows) = Dedup.minhashParamsFor(t, maxPerm)
      assert(perm <= maxPerm && perm % rows === 0)
      val bands = perm / rows
      val curve = math.pow(1.0 / bands, 1.0 / rows)
      assert(math.abs(curve - t) < 0.25, s"t=$t curve=$curve")
    }
  }

  test("ngramJaccard maxDf drops ultra-common shingles from the pair join") {
    val blocked = docs.withColumn("lang", lit("en"))
    // docs 1 and 2 share every shingle; with maxDf = 1 every shared
    // shingle (df = 2) is dropped, so no pair survives
    val capped = Dedup.ngramJaccard(blocked, "doc_id", $"text", $"lang",
      maxDf = 1L).collect()
    assert(capped.isEmpty)
    // an effectively-infinite cap reproduces the uncapped result
    val un = Dedup.ngramJaccard(blocked, "doc_id", $"text", $"lang")
      .as[(Long, Long, Double)].collect().toSet
    val hi = Dedup.ngramJaccard(blocked, "doc_id", $"text", $"lang",
      maxDf = 1000L).as[(Long, Long, Double)].collect().toSet
    assert(un === hi)
    graft.Caches.releaseAll()
  }

  test("decontaminate: shingle collisions flag and drop tainted docs") {
    val contam = Seq((100L, "the quick brown fox jumps over lazy dogs"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "the quick brown fox jumps high today"), // shares 3-grams
      (2L, "completely unrelated text about spark engines"),
      (3L, "the quick brown fox jumps over lazy dogs entirely")) // superset
      .toDF("doc_id", "text")
    val hits = Dedup.contaminationHits(train, "doc_id", $"text",
        contam, $"text")
      .as[(Long, Long)].collect().toMap
    // doc 1 shares "the quick brown","quick brown fox","brown fox jumps"
    assert(hits(1L) === 3L)
    assert(hits(3L) >= 6L)      // near-superset: most shingles collide
    assert(!hits.contains(2L))  // clean doc never appears
    val kept = Dedup.decontaminate(train, "doc_id", $"text",
        contam, $"text", minHits = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L))
  }

  test("contaminationShare: graded overlap, clean docs report 0, not vanish") {
    val contam = Seq((100L, "a b c d")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "a b c d"),   // both shingles collide → share 1.0
      (2L, "a b c x"),   // "a b c" collides, "b c x" doesn't → 0.5
      (3L, "p q r s"))   // disjoint → share 0.0, still present
      .toDF("doc_id", "text")
    val got = Dedup.contaminationShare(train, "doc_id", $"text",
        contam, $"text")
      .orderBy("doc_id")
      .select("doc_id", "n_shingles", "n_hit", "share", "flagged")
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(got === Seq(
      (1L, 2L, 2L, 1.0, true),
      (2L, 2L, 1L, 0.5, true),
      (3L, 2L, 0L, 0.0, false)))
  }

  test("incrementalDedup: exact and near dups drop, fresh content survives") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different corpus text about spark engines"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "THE QUICK  brown fox jumps over the lazy dog"), // exact (normalized)
      (11L, "the quick brown fox jumps over the lazy dog indeed"), // near-dup
      (12L, "entirely novel content with unique words here"), // fresh
      (13L, "Entirely  NOVEL content with unique words here")) // dup of 12 in-batch
      .toDF("doc_id", "text")
    val got = Dedup.incrementalDedup(corpus, batch, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(12L))
    graft.Caches.releaseAll()
    // the keyed path (corpus stores _fp/_sig, batch alone is hashed)
    // returns the same survivors, WITH their keys — so an accreting
    // corpus stays merge-ready without ever re-hashing old text
    val keyed = Dedup.incrementalDedupKeyed(
      Dedup.withDedupKeys(corpus, "text"), batch, "doc_id", "text")
    assert(keyed.columns.toSet === Set("doc_id", "text", "_fp", "_sig"))
    assert(keyed.select("doc_id").as[Long].collect().toSet === Set(12L))
    // stored keys equal freshly-computed ones (bit-for-bit)
    val stored = keyed.select($"doc_id", $"_fp", $"_sig").collect()
    val fresh = Dedup.withDedupKeys(batch.filter($"doc_id" === 12L),
      "text").select($"doc_id", $"_fp", $"_sig").collect()
    assert(stored.map(_.toString).sorted === fresh.map(_.toString).sorted)
    graft.Caches.releaseAll()
  }

  test("leakageSafeSplit: clusters never straddle the train/val boundary") {
    val nodes = (1L to 200L).toDF("doc_id")
    // 50 clusters of 3 (1-2-3, 4-5-6, ...) + 50 singletons
    val pairs = (0L until 50L).flatMap(c =>
      Seq((c * 3 + 1, c * 3 + 2), (c * 3 + 2, c * 3 + 3)))
      .toDF("doc_a", "doc_b")
    val roots = Dedup.connectedComponents(nodes, "doc_id", pairs)
    val split = Dedup.leakageSafeSplit(nodes, "doc_id", roots,
      trainFrac = 0.8, salt = "s")
    // every cluster resolves to exactly one split side
    val straddlers = split
      .join(roots.select($"id".as("doc_id"), $"root"), "doc_id")
      .groupBy("root").agg(countDistinct($"split").as("nsides"))
      .filter($"nsides" > 1).count()
    assert(straddlers === 0)
    // the split fraction lands near the requested 80/20
    val frac = split.filter($"split" === "train").count() / 200.0
    assert(frac > 0.6 && frac < 0.95, s"train frac $frac")
    graft.Caches.releaseAll()
  }

  test("connectedComponents: chains collapse to the min id per cluster") {
    val nodes = (1L to 12L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    for (cap <- Seq(1000000L, 0L)) { // driver union-find AND distributed
      val roots = Dedup.connectedComponents(nodes, "doc_id", pairs,
          driverMaxPairs = cap)
        .as[(Long, Long)].collect().toMap
      assert(roots(1L) === 1L && roots(2L) === 1L && roots(3L) === 1L)
      assert(roots(10L) === 10L && roots(11L) === 10L)
      assert(roots(4L) === 4L && roots(12L) === 12L) // singletons self-root
      // keep-one-per-cluster: exactly the roots survive
      assert(roots.count { case (id, r) => id == r } === 12 - 2 - 1)
    }
    graft.Caches.releaseAll()
  }

  test("connectedComponents: 40-node chain converges distributed in ≤10 rounds") {
    // diameter 40 ≫ maxIter=10: plain min-label propagation would stop
    // early and silently mis-label; pointer doubling reaches the whole
    // chain in O(log diameter) rounds. Also exercises the periodic
    // localCheckpoint lineage cut (≥3 rounds run).
    val n = 40L
    val nodes = (1L to n).toDF("doc_id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val roots = Dedup.connectedComponents(nodes, "doc_id", pairs,
        driverMaxPairs = 0L) // force the distributed path
      .as[(Long, Long)].collect().toMap
    assert((1L to n).forall(roots(_) === 1L), roots)
    graft.Caches.releaseAll()
  }

  test("connectedComponents: 500-node RANDOM-ID path converges within the star bound") {
    // The counterexample class behind the r16 alternating-star rewrite:
    // a path whose node ids are RANDOMLY laid out along the chain. The
    // old min-label + single-pointer-jump recurrence only shortcuts
    // through "the node whose id equals my current label", which on a
    // random layout compresses nothing — a 2,000-node random-id path
    // never converges under it (sf10's SNM mega-family hit maxIter).
    // Alternating large/small-star contraction is provably O(log² n)
    // rounds on ANY shape (Kiveris et al., SoCC'14); a tightened
    // maxIter = 20 round-pairs asserts the bound actually holds here
    // (non-convergence THROWS, so a recurrence regression fails loud).
    val n = 500
    val perm = new scala.util.Random(42).shuffle((0L until n.toLong).toVector)
    val nodes = perm.toDF("doc_id")
    val pairs = (1 until n).map(i => (perm(i - 1), perm(i)))
      .toDF("doc_a", "doc_b")
    val roots = Dedup.connectedComponents(nodes, "doc_id", pairs,
        driverMaxPairs = 0L, maxIter = 20) // force the distributed path
      .as[(Long, Long)].collect().toMap
    assert(roots.size === n)
    assert(roots.values.forall(_ === 0L),
      "every node of the single component must label with the min id")
    graft.Caches.releaseAll()
  }

  test("connectedComponents: non-convergence throws instead of mis-labeling") {
    val n = 12L
    val nodes = (1L to n).toDF("doc_id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    // diameter 12 cannot be covered in 1 round even with doubling
    intercept[IllegalStateException] {
      Dedup.connectedComponents(nodes, "doc_id", pairs,
        driverMaxPairs = 0L, maxIter = 1).collect()
    }
    graft.Caches.releaseAll()
  }

  test("bloomContaminationHits: identical to the exact join, and selective") {
    val corpus = Tables(spark, "/root/testdata/sf0.001").documents
    val contam = corpus.filter($"doc_id" % 11 === 0)
    val train = corpus.filter($"doc_id" % 11 =!= 0)
    val exact = Dedup.contaminationHits(train, "doc_id", $"text",
        contam, $"text")
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    val bloomed = Dedup.bloomContaminationHits(train, "doc_id", $"text",
        contam, $"text")
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(bloomed === exact, "Bloom prefilter must not change the answer")
    assert(exact.nonEmpty, "fixture should produce at least one hit")
    // selectivity: the prefilter passes only Bloom-positive shingles —
    // a superset of the true matches, far below the full shingle stream
    graft.expressions.GraftFunctions.register(spark)
    val tSh = train.select($"doc_id",
      explode(call_function("graft_shingle_hashes60", $"text", lit(3)))
        .as("_sh"))
    val cSh = contam.select(
        explode(call_function("graft_shingle_hashes60", $"text", lit(3)))
          .as("_sh"))
      .distinct()
    val bloom = Dedup.bloomBits(cSh, "_sh")
    val total = tSh.count()
    val passed = tSh.withColumn("_bloom", bloom)
      .filter(Dedup.bloomMightContain("_sh", "_bloom")).count()
    val matches = tSh.join(cSh, "_sh").count()
    assert(passed >= matches, "no false negatives allowed")
    assert(passed < total / 5,
      s"prefilter should drop most shingles (passed $passed of $total)")
    graft.Caches.releaseAll()
  }

  test("duplicatedSpans: maximal merged span at any alignment; within-doc repeat") {
    // doc 10 and 11 share an 8-word run at DIFFERENT word offsets
    // (1 vs 3); with L=4 the five sliding dup grams must merge into
    // ONE maximal span of exactly the 8 shared words in each doc
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    val spanDocs = Seq(
      (10L, s"intro $shared and unique closing words here"),
      (11L, s"one two three $shared totally different tail text"),
      // doc 12 repeats its own 4-word run (within-doc dup, 2 spans)
      (12L, "red green blue cyan stop stop stop red green blue cyan end"),
      (13L, "entirely novel content with no repeats anywhere at all"))
      .toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(spanDocs, "doc_id", $"text",
        spanWords = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // doc 10: words 1..8 (8 tokens of 14); doc 11: words 3..10 (8 of 15)
    // doc 12: "red green blue cyan" at 0 and 7 — gap 7 > 4 ⇒ 2 spans
    assert(got === Seq(
      (10L, 1L, 8L, 14L, 571428L),
      (11L, 1L, 8L, 15L, 533333L),
      (12L, 2L, 8L, 12L, 666666L)))
    // partitioning must not change a single row
    val re = Dedup.duplicatedSpans(spanDocs.repartition(7), "doc_id",
        $"text", spanWords = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(re === got)
  }

  test("Caches.releaseAll unpersists banded self-join intermediates") {
    graft.Caches.releaseAll()
    Dedup.minhashCandidates(docs, "doc_id", $"text").collect()
    Dedup.ngramJaccard(docs, "doc_id", $"text", lit(1)).collect()
    assert(graft.Caches.activeCount === 2)
    graft.Caches.releaseAll()
    assert(graft.Caches.activeCount === 0)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("crossSourceOverlap: shared distinct content, exact jaccard") {
    val docs = Seq(
      // A and B share exactly one normalized text (whitespace noise
      // must not break identity); A's in-source duplicate collapses
      ("A", "shared   doc"),
      ("A", "shared doc"),
      ("A", "a only"),
      ("B", "shared doc"),
      ("B", "b only one"),
      ("B", "b only two"),
      ("C", "c only")) // no overlap with anyone: no C rows at all
      .toDF("src", "text")
    val got = Dedup.crossSourceOverlap(docs, $"src", $"text").collect()
    assert(got.length === 1, "only the overlapping pair reports")
    val r = got(0)
    assert(r.getAs[String]("source_a") === "A" &&
      r.getAs[String]("source_b") === "B")
    assert(r.getAs[Long]("shared") === 1L)
    assert(r.getAs[Long]("n_a") === 2L, "A's dup collapsed to 2 distinct")
    assert(r.getAs[Long]("n_b") === 3L)
    // jaccard = 1 / (2 + 3 - 1)
    assert(r.getAs[Double]("jaccard") === 0.25)
  }

  test("lshBandTuning: full factorization set, error monotonicity, " +
    "argmin matches a driver-side recompute") {
    val got = Dedup.lshBandTuning(spark, nSig = 128, threshold = 0.5,
        gridN = 200)
      .orderBy("r")
      .as[(Long, Long, Double, Double, Long, Boolean)].collect().toSeq
    assert(got.map(t => (t._1, t._2)) ===
      Seq(128L -> 1L, 64L -> 2L, 32L -> 4L, 16L -> 8L, 8L -> 16L,
        4L -> 32L, 2L -> 64L, 1L -> 128L))
    // wider bands (larger r, fewer per-band rows matched) are stricter:
    // fp falls and fn rises monotonically along increasing r
    assert(got.map(_._3) === got.map(_._3).sorted.reverse, "fp falls")
    assert(got.map(_._4) === got.map(_._4).sorted, "fn rises")
    got.foreach { t =>
      assert(t._3 >= 0.0 && t._3 <= 1.0 && t._4 >= 0.0 && t._4 <= 1.0)
    }
    // exactly one argmin, and it agrees with the same integral computed
    // in plain Scala (identical left-fold arithmetic)
    def errU(b: Int, r: Int): Long = (0 until 200).map { i =>
      val s = (i + 0.5) / 200.0
      val sr = (1 to r).foldLeft(1.0)((a, _) => a * s)
      val p = 1.0 - (1 to b).foldLeft(1.0)((a, _) => a * (1.0 - sr))
      if (s < 0.5) math.round(p * 1.0e12) else math.round((1 - p) * 1.0e12)
    }.sum
    val expectBest = got.map(t => (t._1, t._2))
      .minBy { case (b, r) => (errU(b.toInt, r.toInt), b) }
    assert(got.filter(_._6).map(t => (t._1, t._2)) === Seq(expectBest))
    got.foreach { t =>
      assert(t._5 === errU(t._1.toInt, t._2.toInt),
        s"err_u mismatch at b=${t._1} r=${t._2}")
    }
  }
}
