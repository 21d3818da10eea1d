package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.MarketFunctions.{md5Hash48, md5Hash60}

/** Deduplication operators for training-data curation at corpus scale:
  * exact (hash-groupBy), MinHash+LSH banding, SimHash, and n-gram
  * Jaccard. Hashes are md5-derived (60/48-bit) so the DuckDB oracle can
  * reproduce them bit-for-bit; bit extraction uses division by powers of
  * two, which is exact in IEEE double for 48-bit operands.
  *
  * Scale notes: exact dedup is one shuffle on the fingerprint; MinHash
  * and SimHash signatures are computed in-row (array expressions — no
  * explode, no shuffle) and only the banded bucket-join shuffles. The
  * candidate-pair space is |bucket|² per band bucket instead of
  * |corpus|², which is what makes LSH viable at 100 TB.
  */
object Dedup {

  /** Normalized word array of a text column (single regex pass: split on
    * whitespace runs directly, drop empties).
    */
  def words(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), w => w =!= "")

  /** Word w-shingles (default 3-gram) as an array of strings; texts
    * shorter than w words collapse to a single whole-text shingle.
    */
  def shingles(text: Column, w: Int = 3): Column = {
    val ws = words(text)
    when(size(ws) >= w,
      transform(sequence(lit(0), size(ws) - w),
        i => concat_ws(" ", slice(ws, i + 1, lit(w)))))
      .otherwise(array(concat_ws(" ", ws)))
  }

  /** Exact dedup: keep the lowest-id row per normalized-text fingerprint.
    * One hash-partitioned shuffle on the 60-bit fingerprint; survivors
    * are picked with min() so the pass is a single aggregate (no window
    * sort of the whole corpus).
    */
  def exact(df: DataFrame, idCol: String, text: Column): DataFrame = {
    val keyed = df.withColumn("_fp", TextAnalysis.fingerprint(text))
    val keep = keyed.groupBy(col("_fp")).agg(min(col(idCol)).as(idCol))
    keyed.join(keep, Seq("_fp", idCol), "left_semi").drop("_fp")
  }

  /** 48-bit md5 hash per shingle — computed ONCE per shingle; all
    * permutations derive from these longs with cheap integer math.
    * (Hashing per-permutation would multiply the md5 cost by numPerm —
    * higher-order-function expressions are interpreted, so that cost is
    * real.)
    */
  def shingleHashes(text: Column, w: Int = 3): Column =
    transform(shingles(text, w), s => md5Hash48(s))

  /** Universal-hash permutation p of a 48-bit base hash:
    * ((2p+3)·h + 1000003·p + 12345) mod (2^31 − 1). The product stays
    * under 2^53 so the DuckDB oracle reproduces it in exact BIGINT math.
    */
  private def permHash(h: Column, p: Column): Column =
    (h * (p * 2 + 3) + (p * 1000003 + 12345)) % 2147483647L

  /** MinHash signature from precomputed shingle hashes — a SINGLE fold
    * over the hash array with an array-of-minima accumulator. The naive
    * `transform(perms, p => array_min(...))` shape re-evaluates the hash
    * subtree once per permutation after Catalyst's CollapseProject
    * inlines it (measured 8× slower); here the subtree is referenced
    * exactly once.
    */
  def minhashFromHashes(hs: Column, numPerm: Int): Column =
    aggregate(hs,
      array_repeat(lit(2147483647L), numPerm),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(numPerm - 1)),
        (m, p) => least(m, permHash(h, p))))

  /** MinHash signature of a text column (hashes computed inline — prefer
    * materializing [[shingleHashes]] into a column first when the plan
    * would otherwise inline the md5 work once per permutation).
    */
  def minhashSignature(text: Column, numPerm: Int): Column =
    minhashFromHashes(shingleHashes(text), numPerm)

  /** (numPerm, bandRows) for a target Jaccard threshold via the standard
    * S-curve rule: with b bands of r rows the half-recall point sits at
    * s ≈ (1/b)^(1/r). Scans r ∈ [2, 8] with b = maxPerm / r and picks the
    * pair whose threshold lands closest to the target. Band-bucket keys
    * live in a 2^(31·r) space, so random (non-similar) collisions stay
    * negligible at any corpus size — unlike [[graft.pipelines.Similarity
    * .bitsFor]]'s fixed bucket grid, minhash banding needs no
    * corpus-size-dependent widening; r controls precision only.
    */
  def minhashParamsFor(simThreshold: Double,
                       maxPerm: Int = 16): (Int, Int) = {
    val picks = for (r <- 2 to 8; b = maxPerm / r; if b >= 1) yield {
      val t = math.pow(1.0 / b, 1.0 / r)
      (math.abs(t - simThreshold), b * r, r)
    }
    val (_, perm, rows) = picks.min
    (perm, rows)
  }

  /** The stored dedup keys of a corpus of record: the exact fingerprint
    * (`_fp`) and the MinHash signature (`_sig`), computed ONCE at
    * ingest and persisted with the rows. A corpus that carries these
    * makes every later incremental merge hash only the incoming batch
    * ([[incrementalDedupKeyed]]) — re-deriving them per merge re-reads
    * and re-hashes the full corpus TEXT, the term that grows without
    * bound as the corpus accretes.
    */
  def withDedupKeys(df: DataFrame, textCol: String,
                    numPerm: Int = 8): DataFrame = {
    graft.expressions.GraftFunctions.register(df.sparkSession)
    df.withColumn("_fp", TextAnalysis.fingerprint(col(textCol)))
      .withColumn("_sig",
        call_function("graft_minhash_sig", col(textCol), lit(numPerm)))
  }

  /** (id, band, bucket) rows from a STORED `_sig` column — the banding
    * slice of [[bandBuckets]] without the text re-hash; the scan reads
    * two columns (id + an 8-int array), never the text.
    */
  def bandBucketsFromSig(df: DataFrame, idCol: String,
                         numPerm: Int = 8, bandRows: Int = 2)
      : DataFrame = {
    val numBands = numPerm / bandRows
    df.select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(numBands - 1)),
          b => concat_ws(",",
            slice(col("_sig"), b * bandRows + 1, lit(bandRows)))))
        .as(Seq("band", "bucket")))
  }

  /** MinHash band buckets of every document: (id, band, bucket) rows —
    * the join key space for banded candidate generation, shared by the
    * self-join ([[minhashCandidates]]) and the batch-vs-corpus join
    * ([[incrementalDedup]]). `numPerm` must be divisible by `bandRows`.
    */
  def bandBuckets(df: DataFrame, idCol: String, text: Column,
                  numPerm: Int = 8, bandRows: Int = 2): DataFrame = {
    graft.expressions.GraftFunctions.register(df.sparkSession)
    bandBucketsFromSig(
      df.select(col(idCol),
        call_function("graft_minhash_sig", text, lit(numPerm))
          .as("_sig")),
      idCol, numPerm, bandRows)
  }

  /** MinHash + LSH banding: docs sharing any band bucket become candidate
    * near-dup pairs. Returns distinct (doc_a, doc_b) with doc_a < doc_b.
    * `numPerm` must be divisible by `bandRows`.
    */
  def minhashCandidates(df: DataFrame, idCol: String, text: Column,
                        numPerm: Int = 8, bandRows: Int = 2): DataFrame = {
    // the banded plan feeds BOTH sides of the self-join; without an
    // explicit persist each side re-executes the whole signature
    // computation (at cluster scale: persist/checkpoint the signatures)
    val banded = graft.Caches.persist(
      bandBuckets(df, idCol, text, numPerm, bandRows))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .distinct()
  }

  /** 48-bit md5 hash per normalized word — computed once per word. */
  def wordHashes(text: Column): Column =
    transform(words(text), w => md5Hash48(w))

  /** SimHash bit-sign vector (nBits entries of 0/1, nBits ≤ 48) from
    * precomputed word hashes: every word votes ±1 on each bit; bit = 1
    * iff the vote sum is positive. Bit extraction is (h >> i) % 2 —
    * integer shifts, mirrored by `>>` in the DuckDB oracle.
    */
  def simhashFromHashes(hs: Column, nBits: Int = 32): Column = {
    // single fold with an array-of-votes accumulator (see
    // minhashFromHashes for why: per-bit aggregates would re-evaluate
    // the hash subtree nBits times)
    val votes = aggregate(hs,
      array_repeat(lit(0), nBits),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(nBits - 1)),
        (v, i) => v +
          when(call_function("shiftright", h, i) % 2 === 1, 1)
            .otherwise(-1)))
    transform(votes, v => when(v > 0, lit(1)).otherwise(lit(0)))
  }

  def simhashBits(text: Column, nBits: Int = 32): Column =
    simhashFromHashes(wordHashes(text), nBits)

  /** Hamming distance between two equal-length bit arrays. */
  def hamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => abs(x - y)), lit(0), _ + _)

  /** (nBits, chunks) for SimHash banding sized to the corpus: recall
    * requires chunks = maxHamming + 1 (pigeonhole: ≤ maxHamming flipped
    * bits leave one chunk intact), and each chunk needs
    * ceil(log2(n / targetBucketSize)) bits so its bucket grid keeps the
    * all-pairs stage at O(Σ|bucket|²) with |bucket| ≈ target — a fixed
    * 8-bit chunk (256 buckets) is quadratic at corpus scale. Capped at 48
    * total bits (the md5-48 hash width).
    */
  def simhashParamsFor(corpusSize: Long, maxHamming: Int = 3,
                       targetBucketSize: Long = 4096): (Int, Int) = {
    val chunks = maxHamming + 1
    val buckets =
      math.max(1L, corpusSize / math.max(1L, targetBucketSize))
    val need =
      if (buckets <= 1L) 8
      else 64 - java.lang.Long.numberOfLeadingZeros(buckets - 1)
    val chunkLen = math.min(48 / chunks, math.max(8, need))
    (chunks * chunkLen, chunks)
  }

  /** SimHash signatures banded into `chunks` equal chunk-keys — THE
    * shared candidate-generation relation for near-dup pairing
    * ([[simhashCandidates]]) and Hamming retrieval
    * ([[graft.pipelines.Similarity.simhashHammingTopK]]): one row per
    * (doc, band) with columns `(idCol, _bits, chunk, key)`. Persisted
    * because every consumer joins it against itself or a filtered
    * slice of itself. Keeping one implementation keeps the banding in
    * lockstep with BOTH DuckDB oracles (d4's bit construction, n20's
    * banding) — two copies would have to stay byte-identical by hand.
    */
  def simhashBanded(df: DataFrame, idCol: String, text: Column,
                    nBits: Int, chunks: Int): DataFrame = {
    graft.expressions.GraftFunctions.register(df.sparkSession)
    val chunkLen = nBits / chunks
    // memoized per (input plan, id, text, params) in the cache scope:
    // a session running both the near-dup pairer and the Hamming
    // retriever builds ONE persisted banded relation, not two
    // identical copies racing each other's cache space
    val key = ("simhash_banded",
      df.queryExecution.logical.canonicalized,
      idCol, text.toString, nBits, chunks)
    graft.Caches.getOrPersist(key, {
      val sig = df.select(col(idCol),
        call_function("graft_simhash_bits", text, lit(nBits)).as("_bits"))
      sig.select(col(idCol), col("_bits"), posexplode(
        transform(sequence(lit(0), lit(chunks - 1)),
          c => concat_ws("",
            slice(col("_bits"), c * chunkLen + 1, lit(chunkLen)))))
        .as(Seq("chunk", "key")))
    })
  }

  /** SimHash near-dup candidates: band the bit vector into chunks and
    * bucket-join on chunk equality (docs within hamming distance d share
    * at least one identical chunk when chunks > d). Returns distinct
    * (doc_a, doc_b, hamming) pairs with hamming ≤ maxHamming. With
    * `nBits <= 0` the (nBits, chunks) pair is derived from the corpus
    * size via [[simhashParamsFor]] (one `count()` job).
    */
  def simhashCandidates(df: DataFrame, idCol: String, text: Column,
                        nBits: Int = 32, chunks: Int = 4,
                        maxHamming: Int = 3,
                        targetBucketSize: Long = 4096): DataFrame = {
    val (nb, nc) =
      if (nBits > 0) (nBits, chunks)
      else simhashParamsFor(df.count(), maxHamming, targetBucketSize)
    val banded = simhashBanded(df, idCol, text, nb, nc)
    banded.as("a").join(banded.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.key") === col("b.key") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"),
        hamming(col("a._bits"), col("b._bits")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Connected components over the candidate-pair graph — the last step
    * of near-dup dedup: every doc gets the minimum doc id reachable
    * through the pair graph as its cluster representative, and "keep one
    * per cluster" is then `root == id`. Distributed path: alternating
    * large-star/small-star edge contraction (Kiveris et al., SoCC'14)
    * — provably O(log² n) rounds on ANY graph shape, 2–3 round-pairs
    * on the banded near-cliques dedup actually produces, with
    * `maxIter` bounding the alternation. Each star op is one
    * groupBy-min plus one join plus a distinct; per-round frames are
    * persisted through [[graft.Caches]] and released by the harness.
    */
  def connectedComponents(nodes: DataFrame, idCol: String,
                          pairs: DataFrame, aCol: String = "doc_a",
                          bCol: String = "doc_b",
                          maxIter: Int = 24,
                          driverMaxPairs: Long = 1000000L): DataFrame = {
    val spark = nodes.sparkSession
    val p = graft.Caches.persist(
      pairs.select(col(aCol).cast("long").as("src"),
        col(bCol).cast("long").as("dst")))
    val nPairs = p.count()
    val labels =
      if (nPairs <= driverMaxPairs) {
        // the candidate graph is the OUTPUT of LSH banding — bounded by
        // design (16 bytes/pair; the default cap is ~16 MB). Union-find
        // on the driver is O(E·α) and replaces 3-4 shuffle rounds whose
        // fixed job overhead dwarfs this much data. This is a bounded
        // collect with an explicit cap and a distributed fallback — not
        // a driver loop over table-sized data.
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x
          while (parent.getOrElse(c, c) != r) {
            val n = parent(c); parent(c) = r; c = n
          }
          r
        }
        p.collect().foreach { row =>
          val ra = find(row.getLong(0))
          val rb = find(row.getLong(1))
          // union by VALUE (larger root under smaller), so every
          // component's final root is its minimum id
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        import spark.implicits._
        val touched = parent.keys.toSeq
        val roots = (touched ++ touched.map(find)).distinct
          .map(id => (id, find(id)))
        // RDD-backed, NOT roots.toDF: toDF on a driver Seq embeds the
        // rows in the plan as LocalRelation data, and Spark's
        // TreeNode.formatArg EAGERLY stringifies every Seq argument on
        // each plan render — which happens on every downstream action
        // (the SQL listener's plan description). With ~1M labels that
        // is minutes of driver regex per action (observed at sf10).
        // An RDD-backed frame renders as a constant-size scan node.
        broadcast(spark.sparkContext
          .parallelize(roots, math.max(1, roots.size / 500000))
          .toDF("id", "root"))
      } else {
        // ALTERNATING STAR contraction (Kiveris et al., "Connected
        // Components in MapReduce and Beyond", SoCC'14): rewrite the
        // EDGE SET each round instead of propagating labels.
        //   large-star: every neighbor v > u re-attaches to
        //     m(u) = min(Γ(u) ∪ {u});
        //   small-star: every neighbor v ≤ u, and u itself,
        //     re-attach to m(u).
        // Alternating the two provably converges in O(log² n) rounds
        // (observed: ~2-3 round-pairs on banded near-cliques, ~10-12
        // on adversarial random-id paths) to a forest of STARS rooted
        // at each component's minimum id. The previous implementation
        // here — min-label propagation with a single pointer jump per
        // round — looked logarithmic but is NOT on random-id paths:
        // the jump shortcuts through "the node whose id equals my
        // label", which on a randomly-laid-out chain compresses
        // nothing, and sf10's mega-family SNM chain ran 24 rounds with
        // a stuck changed-count (reproduced off-Spark on a 2,000-node
        // random-id path, which never converges under that recurrence).
        def star(e: DataFrame, large: Boolean): DataFrame = {
          val nbrs = e.select(col("a").as("u"), col("b").as("v"))
            .unionByName(e.select(col("b").as("u"), col("a").as("v")))
          // m(u) = min over Γ(u) ∪ {u}; m ≤ u by construction
          val m = nbrs.groupBy("u").agg(min(col("v")).as("_mv"))
            .select(col("u"), least(col("u"), col("_mv")).as("m"))
          val moved =
            if (large)
              // v > u ≥ m, so (m, v) is already ordered and v ≠ m
              nbrs.join(m, "u").filter(col("v") > col("u"))
                .select(col("m").as("a"), col("v").as("b"))
            else
              // v ≤ u (plus u itself via the m frame); skip v = m
              nbrs.join(m, "u")
                .filter(col("v") <= col("u") && col("v") =!= col("m"))
                .select(least(col("v"), col("m")).as("a"),
                  greatest(col("v"), col("m")).as("b"))
                .unionByName(m.filter(col("u") =!= col("m"))
                  .select(col("m").as("a"), col("u").as("b")))
          moved.distinct()
        }
        // normalized committed edge set: a < b, no self-loops
        var e = graft.Caches.persist(
          p.filter(col("src") =!= col("dst"))
            .select(least(col("src"), col("dst")).as("a"),
              greatest(col("src"), col("dst")).as("b"))
            .distinct())
        var iter = 0
        var converged = false
        while (iter < maxIter && !converged) {
          val next = graft.Caches.persist(star(star(e, large = true),
            large = false))
          // set-equality probe by counts (and ⊆ via anti-join): count
          // also fully materializes the round's cache, so the next
          // round reads it instead of recomputing the star diamond
          val n0 = e.count()
          val n1 = next.count()
          val changed =
            if (n1 != n0) -1L
            else next.join(e, Seq("a", "b"), "left_anti").count()
          if (sys.env.contains("SPARK_GRAFT_CC_DEBUG"))
            System.err.println(
              s"[cc] round $iter edges=$n1 changed=$changed")
          converged = changed == 0L
          // re-root the plan every round (RDD re-wrap, no job): the
          // iterated edge rewrite otherwise compounds plan nodes, and
          // Spark renders the plan string on EVERY action (the SQL
          // listener event) — observed 18 driver-minutes of TreeNode
          // regex at sf10 under a deep iterated plan. The RDD (not
          // localCheckpoint) keeps release semantics recompute-safe.
          e = graft.Caches.persist(
            spark.createDataFrame(next.rdd, next.schema))
          iter += 1
        }
        if (!converged)
          throw new IllegalStateException(
            s"connectedComponents did not converge in $maxIter " +
              "alternating-star rounds: raise maxIter — returning " +
              "partial labels would silently mis-cluster")
        // the fixed point is a star forest rooted at component minima:
        // every non-root carries exactly the edge (root, v)
        e.select(col("b").as("id"), col("a").as("root"))
          .unionByName(e.select(col("a").as("id"), col("a").as("root")))
          .distinct()
      }
    nodes.select(col(idCol).cast("long").as("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("root"), col("id")).as("root"))
  }

  /** Incremental dedup — merge a NEW batch into an already-deduped
    * corpus WITHOUT re-deduping the corpus (the 100 TB ingest shape: a
    * daily crawl lands against an existing table-of-record):
    *
    *  1. within-batch + batch-vs-corpus EXACT dedup on the normalized
    *     fingerprint (keep the lowest batch id per fingerprint, drop
    *     anything the corpus already has);
    *  2. NEAR-dup: batch docs sharing any MinHash band bucket with a
    *     corpus doc drop (batch × corpus equi-join on (band, bucket) —
    *     candidate space scales with the batch, never corpus²).
    *
    * Returns the surviving batch rows. At cluster scale the corpus-side
    * fingerprints and band buckets are precomputed at ingest and
    * bucket-partitioned, so each batch merge touches only its buckets.
    * Near-dups WITHIN the batch survive (they are new content); run the
    * full d6/d7 clustering on the batch first if they should collapse.
    */
  def incrementalDedup(corpus: DataFrame, batch: DataFrame, idCol: String,
                       textCol: String, numPerm: Int = 8,
                       bandRows: Int = 2): DataFrame =
    incrementalDedupKeyed(withDedupKeys(corpus, textCol, numPerm), batch,
        idCol, textCol, numPerm, bandRows)
      .drop("_fp", "_sig")

  /** [[incrementalDedup]] against a corpus that STORES its dedup keys
    * ([[withDedupKeys]] at ingest): the batch text is hashed once here,
    * the corpus side reads only its `_fp`/`_sig` columns (column-pruned
    * scans — never the text), and the survivors return WITH their keys
    * so appending them keeps the corpus merge-ready. Per-batch cost is
    * the batch's hashing plus two key-column joins — the corpus's text
    * volume never re-enters the per-batch bill.
    */
  def incrementalDedupKeyed(corpus: DataFrame, batch: DataFrame,
                            idCol: String, textCol: String,
                            numPerm: Int = 8, bandRows: Int = 2)
      : DataFrame = {
    // same survivor rule as [[exact]] (lowest id per fingerprint, picked
    // with a min() aggregate — no window sort), plus the corpus anti-join
    val keyed = withDedupKeys(batch, textCol, numPerm)
    val keep = keyed.groupBy(col("_fp")).agg(min(col(idCol)).as(idCol))
    val batchExact = keyed
      .join(keep, Seq("_fp", idCol), "left_semi")
      .join(corpus.select("_fp").distinct(), Seq("_fp"), "left_anti")
    val survivors = graft.Caches.persist(batchExact)
    val hits = bandBucketsFromSig(survivors, idCol, numPerm, bandRows)
      .join(bandBucketsFromSig(corpus, idCol, numPerm, bandRows)
        .select("band", "bucket"), Seq("band", "bucket"), "left_semi")
      .select(idCol).distinct()
    survivors.join(hits, Seq(idCol), "left_anti")
  }

  /** Benchmark decontamination hits — the pre-training hygiene pass:
    * count, per training document, the exact w-gram shingles it shares
    * with a contamination corpus (eval benchmarks, held-out sets).
    * Exact-hash membership rather than MinHash, because decontamination
    * policies are phrased as counts of exact n-gram collisions. Both
    * sides explode their DISTINCT 60-bit shingle hashes (one compiled
    * pass per row); the equi-join on the hash is one shuffle, and the
    * contamination side — benchmarks are tiny next to a training corpus —
    * is broadcast by Catalyst at scale.
    */
  def contaminationHits(train: DataFrame, idCol: String, text: Column,
                        contam: DataFrame, contamText: Column,
                        w: Int = 3): DataFrame = {
    graft.expressions.GraftFunctions.register(train.sparkSession)
    val tSh = train.select(col(idCol),
      explode(call_function("graft_shingle_hashes60", text, lit(w)))
        .as("_sh"))
    val cSh = contam.select(
      explode(call_function("graft_shingle_hashes60", contamText, lit(w)))
        .as("_sh"))
      .distinct()
    tSh.join(cSh, "_sh")
      .groupBy(idCol).agg(count(lit(1)).as("hits"))
  }

  /** Fractional contamination report — the graded extension of
    * [[contaminationHits]]'s binary flag: per training doc, the SHARE
    * of its distinct w-gram shingles that appear in the benchmark
    * set. Decontamination policy needs the degree, not just presence
    * (a doc quoting one benchmark sentence is rewritable; a doc that
    * IS the benchmark must drop), and the share is what a
    * contamination audit reports per source. Same plan shape as the
    * binary form — per-doc distinct shingle explode, the benchmark
    * side a broadcast-sized distinct hash set, one equi-join — plus a
    * left join so UNcontaminated docs report share 0 instead of
    * vanishing. `flagged` applies `flagAt` to the ROUNDED share (the
    * value both engines agree on bit-for-bit).
    */
  def contaminationShare(train: DataFrame, idCol: String, text: Column,
                         contam: DataFrame, contamText: Column,
                         w: Int = 3, flagAt: Double = 0.2): DataFrame = {
    graft.expressions.GraftFunctions.register(train.sparkSession)
    val tSh = train.select(col(idCol),
      explode(call_function("graft_shingle_hashes60", text, lit(w)))
        .as("_sh"))
    val cSh = contam.select(
      explode(call_function("graft_shingle_hashes60", contamText, lit(w)))
        .as("_sh"))
      .distinct()
    tSh.join(cSh.withColumn("_hit", lit(1L)), Seq("_sh"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("_hit"), lit(0L))).as("n_hit"))
      .withColumn("share",
        round(col("n_hit").cast("double") /
          col("n_shingles").cast("double"), 6))
      .withColumn("flagged", col("share") >= flagAt)
  }

  /** Bloom filter over a (small) set of 60-bit shingle hashes, built as
    * an aggregation: k = 3 bit positions per hash are independent
    * 20-bit slices of the md5-derived hash (no re-hashing needed), the
    * 2^20-bit array lives as 16384 longs OR-folded per word — the
    * collect is array-sized, never set-sized. Returned as a literal
    * array column ready to broadcast into a scan-side probe.
    */
  def bloomBits(hashes: DataFrame, hashCol: String,
                mBits: Int = 1 << 20): Column = {
    require(mBits % 64 == 0 && mBits <= (1 << 20),
      "mBits must be a multiple of 64, at most 2^20 (the slice width)")
    val mask = (mBits - 1).toLong
    val positions = array((0 until 3).map(j =>
      shiftrightunsigned(col(hashCol), j * 20).bitwiseAND(lit(mask))): _*)
    val words = hashes.select(explode(positions).as("_pos"))
      .select((col("_pos") / 64).cast("int").as("_widx"),
        expr("shiftleft(1L, cast(_pos % 64 as int))").as("_bit"))
      .groupBy("_widx").agg(expr("bit_or(_bit)").as("_word"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val arr = Array.tabulate(mBits / 64)(i => words.getOrElse(i, 0L))
    typedLit(arr)
  }

  /** Scan-side Bloom probe for a 60-bit hash against a `bloomBits`
    * array bound to column `bloomCol`: true iff all three sliced bit
    * positions are set — no false negatives, so filtering with it
    * before an exact join preserves the join's result.
    */
  def bloomMightContain(hashCol: String, bloomCol: String,
                        mBits: Int = 1 << 20): Column = {
    val mask = (mBits - 1).toLong
    (0 until 3).map { j =>
      expr(s"(shiftright(element_at($bloomCol, " +
        s"cast((shiftright($hashCol, ${j * 20}) & $mask) / 64 as int) + 1), " +
        s"cast((shiftright($hashCol, ${j * 20}) & $mask) % 64 as int)) " +
        s"& 1) = 1")
    }.reduce(_ && _)
  }

  /** [[contaminationHits]] with a Bloom runtime filter: the
    * contamination shingle set (benchmarks — small by nature) compiles
    * to a 128 KiB bit array broadcast to every task, and the training
    * corpus's exploded shingles are probed IN-ROW before the exact
    * join. At 100 TB this is the difference between shuffling every
    * training shingle (the d8 plan's cost) and shuffling only the
    * Bloom-positive ones (≈ the true matches + a vanishing false-
    * positive trickle at k=3, m=2^20); no false negatives means the
    * result is bit-identical to the exact join, which is what the
    * oracle checks.
    */
  def bloomContaminationHits(train: DataFrame, idCol: String,
                             text: Column, contam: DataFrame,
                             contamText: Column, w: Int = 3,
                             mBits: Int = 1 << 20): DataFrame = {
    graft.expressions.GraftFunctions.register(train.sparkSession)
    val cSh = contam.select(
        explode(call_function("graft_shingle_hashes60", contamText,
          lit(w))).as("_sh"))
      .distinct()
    val bloom = bloomBits(cSh, "_sh", mBits)
    val tSh = train.select(col(idCol),
        explode(call_function("graft_shingle_hashes60", text, lit(w)))
          .as("_sh"))
      .withColumn("_bloom", bloom)
      .filter(bloomMightContain("_sh", "_bloom", mBits))
      .drop("_bloom")
    tSh.join(cSh, "_sh")
      .groupBy(idCol).agg(count(lit(1)).as("hits"))
  }

  /** Apply decontamination: drop training documents with ≥ `minHits`
    * shingle collisions against the contamination corpus (anti-join on
    * the flagged ids).
    */
  def decontaminate(train: DataFrame, idCol: String, text: Column,
                    contam: DataFrame, contamText: Column,
                    w: Int = 3, minHits: Int = 1): DataFrame = {
    val flagged = contaminationHits(train, idCol, text, contam,
      contamText, w).filter(col("hits") >= minHits).select(idCol)
    train.join(flagged, Seq(idCol), "left_anti")
  }

  /** Leakage-safe train/validation split: assign every document to a
    * split by the salted hash of its near-dup CLUSTER ROOT, not its own
    * id — near-duplicates always land on the same side, so validation
    * never scores on a paraphrase of a training document. Composes
    * [[connectedComponents]] roots with the deterministic hash-split
    * rule ([[TextAnalysis.stratifiedHashSample]]'s): reproducible across
    * partitionings, retries, and engines.
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String,
                       roots: DataFrame, trainFrac: Double,
                       salt: String): DataFrame = {
    val byRoot = docs.join(
      roots.select(col("id").as(idCol), col("root")), Seq(idCol), "left")
      .withColumn("_root", coalesce(col("root"), col(idCol)))
    byRoot.withColumn("split",
        when(graft.functions.MarketFunctions.md5Hash60(
          concat(lit(salt), lit("#"), col("_root").cast("string")))
          % 1000000L < trainFrac * 1000000L, lit("train"))
          .otherwise(lit("val")))
      .drop("_root", "root")
  }

  /** N-gram Jaccard similarity over candidate pairs (blocked by a cheap
    * key, e.g. language, to bound the pair space): explode distinct
    * shingles, self-join within blocks, and compute
    * |A∩B| / (|A|+|B|−|A∩B|). Returns (doc_a, doc_b, jaccard ≥ minJ).
    */
  def ngramJaccard(df: DataFrame, idCol: String, text: Column,
                   blockKey: Column, w: Int = 3,
                   minJ: Double = 0.1,
                   maxDf: Long = Long.MaxValue): DataFrame = {
    // join on 60-bit shingle hashes, not strings: same pair counts
    // (collisions negligible), far narrower shuffle rows; persisted
    // because sizes + both self-join sides consume it (3 readers)
    graft.expressions.GraftFunctions.register(df.sparkSession)
    val exploded = df.select(col(idCol), blockKey.as("_blk"),
      explode(call_function("graft_shingle_hashes60", text, lit(w)))
        .as("_sh"))
    // document-frequency cap: an ultra-common shingle (boilerplate,
    // stopword runs) joins df² pairs — at corpus scale ONE such shingle
    // is a quadratic hot key. Dropping shingles with df > maxDf bounds
    // every join group at maxDf² and barely moves Jaccard (common
    // shingles carry no discriminative mass). Jaccard is then computed
    // over the KEPT shingle space on both sides of the ratio.
    val capped =
      if (maxDf == Long.MaxValue) exploded
      else
        // window count over _sh: one shuffle and one pass, where a
        // groupBy+join would shuffle twice and execute the explode twice
        exploded.withColumn("_df", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("_sh"))))
          .filter(col("_df") <= maxDf).drop("_df")
    val sh = graft.Caches.persist(capped)
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("_n"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a._blk") === col("b._blk") && col("a._sh") === col("b._sh") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .agg(count(lit(1)).as("_inter"))
    inter
      .join(sizes.withColumnRenamed(idCol, "doc_a")
        .withColumnRenamed("_n", "_na"), "doc_a")
      .join(sizes.withColumnRenamed(idCol, "doc_b")
        .withColumnRenamed("_n", "_nb"), "doc_b")
      .withColumn("jaccard", round(col("_inter") /
        (col("_na") + col("_nb") - col("_inter")).cast("double"), 6))
      .filter(col("jaccard") >= minJ)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Span-level exact-substring duplication (the word-granularity form
    * of Lee et al. 2022's ExactSubstr dedup): every sliding `spanWords`
    * window whose exact text occurs anywhere else in the corpus —
    * another document OR another position of the same document — marks
    * its `[pos, pos+spanWords)` word span, overlapping/adjacent marked
    * spans merge per document (gaps-and-islands over a running max
    * position), and the report is per-document duplicated-token mass.
    * This is the granularity both document dedup ([[minhashCandidates]])
    * and fixed-block passage dedup (p9's non-overlapping chunks) miss:
    * windows SLIDE, so a repeated region is caught at any alignment and
    * merged back into one maximal span.
    *
    * Scale shape: the gram exploder is O(words) rows per document (the
    * shuffle-friendly substitute for a suffix array); duplicate
    * detection is one map-side-combinable count per distinct gram text
    * plus a hash-shuffle join back on the gram; island merging and the
    * final rollup partition by document. The duplicated-token fraction
    * is integer micro-units (long division) so every row is bit-stable
    * under any partitioning.
    *
    * Returns `(idCol, n_spans, dup_tokens, tot_tokens,
    * dup_frac_micro)` for documents with at least one duplicated span.
    */
  def duplicatedSpans(df: DataFrame, idCol: String, text: Column,
                      spanWords: Int = 15): DataFrame = {
    require(spanWords > 0, "spanWords must be > 0")
    import org.apache.spark.sql.expressions.Window
    val ws = words(text)
    val docs = df.withColumn("_ws", ws)
      .filter(size(col("_ws")) >= spanWords)
      .select(col(idCol), col("_ws"))
    val grams = docs.select(col(idCol), col("_ws"),
        posexplode(transform(
          sequence(lit(0), size(col("_ws")) - spanWords),
          i => array_join(slice(col("_ws"), i + 1, lit(spanWords)), " "))))
      .select(col(idCol), col("pos"), col("col").as("_gram"))
    val dupGrams = grams.groupBy("_gram")
      .agg(count(lit(1)).as("_occ"))
      .filter(col("_occ") > 1)
      .select("_gram")
    val marked = grams.join(dupGrams, "_gram").select(col(idCol), col("pos"))
    val prior = Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val run = Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val islands = marked
      .withColumn("_brk",
        when(max(col("pos")).over(prior).isNull ||
          col("pos") > max(col("pos")).over(prior) + spanWords, 1L)
          .otherwise(0L))
      .withColumn("_isl", sum(col("_brk")).over(run))
      .groupBy(col(idCol), col("_isl"))
      .agg(min(col("pos")).as("_s0"),
        (max(col("pos")) + spanWords).as("_e0"))
    islands.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("_e0") - col("_s0")).as("dup_tokens"))
      .join(docs.select(col(idCol),
        size(col("_ws")).cast("long").as("tot_tokens")), idCol)
      .withColumn("dup_frac_micro",
        expr("dup_tokens * 1000000 div tot_tokens"))
      .select(col(idCol), col("n_spans"), col("dup_tokens"),
        col("tot_tokens"), col("dup_frac_micro"))
  }

  /** Cross-source duplicate-overlap report: for every source pair, how
    * much of each side's DISTINCT content also appears in the other —
    * the data-lineage question a multi-crawl curation run answers
    * before choosing which copy of shared content to keep ("is source
    * B mostly a mirror of A?"). Content identity is the normalized
    * exact fingerprint ([[graft.pipelines.TextAnalysis.fingerprint]]).
    *
    * Plan shape: one (source, fingerprint) DISTINCT projection feeds
    * both the per-source totals and a fingerprint-keyed self-join
    * (`source_a < source_b` deduplicates the symmetric pair) — the
    * join's per-key fan-out is |sources per fingerprint|², bounded by
    * the source count, never corpus-sized. Shared/total counts are
    * exact integers; the Jaccard `shared / (n_a + n_b − shared)` is
    * one deterministic double division per pair.
    */
  def crossSourceOverlap(df: DataFrame, source: Column, text: Column)
      : DataFrame = {
    val fp = df.select(source.as("src"),
        graft.pipelines.TextAnalysis.fingerprint(text).as("fp"))
      .distinct()
    val totals = fp.groupBy("src").agg(count(lit(1)).as("n"))
    val pairs = fp.select(col("src").as("source_a"), col("fp"))
      .join(fp.select(col("src").as("source_b"), col("fp")), "fp")
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(broadcast(totals.withColumnRenamed("src", "source_a")
        .withColumnRenamed("n", "n_a")), "source_a")
      .join(broadcast(totals.withColumnRenamed("src", "source_b")
        .withColumnRenamed("n", "n_b")), "source_b")
      .withColumn("jaccard",
        col("shared").cast("double") /
          (col("n_a") + col("n_b") - col("shared")).cast("double"))
      .select(col("source_a"), col("source_b"), col("shared"),
        col("n_a"), col("n_b"), col("jaccard"))
  }

  /** Analytic (bands, rows) selection for MinHash LSH: for every
    * factorization b·r = `nSig` of the signature budget, integrate the
    * banding S-curve p(s) = 1 − (1 − sʳ)ᵇ against a uniform similarity
    * prior — false-positive mass below the target `threshold` (pairs
    * LESS similar than t that still collide) and false-negative mass
    * above it (pairs more similar that don't) — and flag the
    * total-error argmin. This replaces the folklore
    * "threshold ≈ (1/b)^(1/r)" rule with the actual error integrals, so
    * the [[minhashBandPairs]] caller can pick (b, r) for a target
    * Jaccard instead of guessing.
    *
    * Exactness discipline: sʳ and (1−sʳ)ᵇ are LEFT-FOLD double
    * multiplication chains (integer exponents — no pow/exp/ln, whose
    * last-ulp behavior differs across engines), the midpoint grid
    * s = (i+0.5)/gridN never lands on the threshold, and each grid
    * term quantizes to integer 1e-12 units before the order-independent
    * BIGINT sum. The candidate set is |divisors(nSig)| rows — this is a
    * planning query, not a data query; it exists so the tuning decision
    * is itself engine-checkable instead of a notebook constant.
    */
  def lshBandTuning(spark: org.apache.spark.sql.SparkSession, nSig: Int,
                    threshold: Double, gridN: Int = 200): DataFrame = {
    require(nSig > 0 && gridN > 1)
    import spark.implicits._
    val cands = (1 to nSig).filter(nSig % _ == 0)
      .map(r => (nSig / r, r)).toDF("b", "r")
    val sOf = s"((CAST(i AS DOUBLE) + 0.5D) / ${gridN}.0D)"
    val sr = s"aggregate(sequence(1, r), 1.0D, (a1, x1) -> a1 * $sOf)"
    val pOf = s"(1.0D - aggregate(sequence(1, b), 1.0D, " +
      s"(a2, x2) -> a2 * (1.0D - $sr)))"
    val pts = cands.withColumn("_fp_u", expr(
        s"""aggregate(sequence(0, ${gridN - 1}), 0L, (acc, i) ->
           |  acc + IF($sOf < CAST($threshold AS DOUBLE),
           |    CAST(round($pOf * 1.0e12D) AS BIGINT), 0L))""".stripMargin))
      .withColumn("_fn_u", expr(
        s"""aggregate(sequence(0, ${gridN - 1}), 0L, (acc, i) ->
           |  acc + IF($sOf < CAST($threshold AS DOUBLE), 0L,
           |    CAST(round((1.0D - $pOf) * 1.0e12D) AS BIGINT)))"""
          .stripMargin))
      .withColumn("err_u", col("_fp_u") + col("_fn_u"))
    // argmin via a broadcast 1-row aggregate (err, then smaller b —
    // fewer, wider bands — on ties); the encoded key is exact: err_u
    // ≤ gridN·1e12 and b ≤ nSig keep err_u·(nSig+1)+b far under 2^63
    val best = pts.agg(min(col("err_u") * (nSig + 1) + col("b"))
      .as("_best"))
    pts.crossJoin(broadcast(best))
      .withColumn("is_best",
        col("err_u") * (nSig + 1) + col("b") === col("_best"))
      .select(col("b").cast("long").as("b"),
        col("r").cast("long").as("r"),
        (col("_fp_u").cast("double") / 1.0e12 / gridN).as("fp_mass"),
        (col("_fn_u").cast("double") / 1.0e12 / gridN).as("fn_mass"),
        col("err_u"), col("is_best"))
  }
}
