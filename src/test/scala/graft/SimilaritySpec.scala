package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipelines.Similarity

/** ANN / similarity-search semantics over embedding columns. */
class SimilaritySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f)),
    (1L, Seq(0.9f, 0.1f, 0.0f)),
    (2L, Seq(0.0f, 1.0f, 0.0f)),
    (3L, Seq(-1.0f, 0.0f, 0.0f)),
    (4L, Seq(1.0f, 0.0f, 0.0f))).toDF("id", "vec")

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f), Seq(-1.0f, -2.0f),
      Seq(2.0f, -1.0f))).toDF("a", "b", "neg", "orth")
    val r = df.select(
      Similarity.cosine($"a", $"b"),
      Similarity.cosine($"a", $"neg"),
      Similarity.cosine($"a", $"orth")).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
    assert(math.abs(r.getDouble(1) + 1.0) < 1e-9)
    assert(math.abs(r.getDouble(2)) < 1e-9)
  }

  test("topKCosine: exact ranking, id tiebreak") {
    val q = array(lit(1.0f), lit(0.0f), lit(0.0f))
    val got = Similarity.topKCosine(corpus, "id", "vec", q, 3)
      .as[(Long, Double)].collect()
    assert(got.map(_._1).toSeq === Seq(0L, 4L, 1L)) // ties 0/4 break by id
    assert(got(0)._2 === 1.0)
  }

  test("lshBucket: deterministic, b bits, identical vectors same bucket") {
    val b = corpus.select($"id",
      Similarity.lshBucket($"vec", 4).as("bucket"))
      .as[(Long, String)].collect().toMap
    assert(b.values.forall(_.matches("^[01]{4}$")))
    assert(b(0L) === b(4L))
    val again = corpus.select(Similarity.lshBucket($"vec", 4))
      .as[String].collect().toSet
    assert(again === b.values.toSet)
  }

  test("annTopKCosine returns a subset of brute-force ranking") {
    val q = array(lit(0.9f), lit(0.1f), lit(0.0f))
    val brute = Similarity.topKCosine(corpus, "id", "vec", q, 5)
      .as[(Long, Double)].collect().toMap
    val ann = Similarity.annTopKCosine(corpus, "id", "vec", q, 3, bits = 2)
      .as[(Long, Double)].collect()
    assert(ann.nonEmpty)
    ann.foreach { case (id, cos) => assert(brute(id) === cos) }
  }

  test("ivfCell is deterministic; ivfTopK results agree with brute force") {
    val rng = new scala.util.Random(3)
    val big = (0L until 50L).map(i =>
      (i, Seq.fill(8)(rng.nextFloat() * 2 - 1))).toDF("id", "vec")
    val cells = big.select($"id", Similarity.ivfCell($"vec", 4, 8).as("c"))
      .as[(Long, Int)].collect().toMap
    assert(cells.values.forall(c => c >= 0 && c < 4))
    val again = big.select(Similarity.ivfCell($"vec", 4, 8))
      .as[Int].collect()
    assert(again.toSeq === big.select($"id").as[Long].collect()
      .map(cells).toSeq)
    val q = array((0 until 8).map(i => lit(0.1f * i)): _*)
    val brute = Similarity.topKCosine(big, "id", "vec", q, 50)
      .as[(Long, Double)].collect().toMap
    val ivf = Similarity.ivfTopKCosine(big, "id", "vec", q, 5, 4, 8,
      nprobe = 2).as[(Long, Double)].collect()
    assert(ivf.nonEmpty)
    ivf.foreach { case (id, cos) => assert(brute(id) === cos) }
  }

  test("nearDupPairs finds the exact-duplicate vector pair") {
    val got = Similarity.nearDupPairs(corpus, "id", "vec", 0.999)
      .as[(Long, Long, Double)].collect()
    assert(got.exists(p => p._1 == 0L && p._2 == 4L && p._3 === 1.0))
  }

  test("native graft_dot is bit-identical to the declarative fold") {
    graft.expressions.GraftFunctions.register(spark)
    val rng = new scala.util.Random(11)
    val vecs = (0 until 50).map(_ =>
      (Seq.fill(17)(rng.nextFloat() * 4 - 2),
        Seq.fill(17)(rng.nextDouble() * 4 - 2))).toDF("f", "d")
    val rows = vecs.select(
      Similarity.dot($"f", $"d"), Similarity.dotNative($"f", $"d"),
      Similarity.cosine($"f", $"f"), Similarity.cosineNative($"f", $"f"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1)) // exact, not approx
      assert(r.getDouble(2) === r.getDouble(3))
    }
    // null semantics match zip_with padding: length mismatch → null
    val mis = Seq((Seq(1.0f, 2.0f), Seq(1.0, 2.0, 3.0)))
      .toDF("a", "b")
      .select(Similarity.dot($"a", $"b").as("hof"),
        Similarity.dotNative($"a", $"b").as("nat"))
      .collect().head
    assert(mis.isNullAt(0) && mis.isNullAt(1))
  }

  test("native graft_l2_normalize ≡ declarative twin; zero vec unchanged") {
    graft.expressions.GraftFunctions.register(spark)
    val rng = new scala.util.Random(23)
    val vecs = (0 until 50).map(_ =>
      Tuple1(Seq.fill(16)(rng.nextFloat() * 4 - 2))).toDF("v")
    vecs.select(
        Similarity.normalized($"v").as("nat"),
        Similarity.normalizedDeclarative($"v").as("dec"))
      .as[(Seq[Double], Seq[Double])].collect()
      .foreach { case (nat, dec) =>
        assert(nat === dec) // exact, element by element
      }
    // zero vector: declarative yields NaN, native returns it unchanged
    val z = Seq(Tuple1(Seq(0.0f, 0.0f, 0.0f))).toDF("v")
      .select(Similarity.normalized($"v")).as[Seq[Double]].collect().head
    assert(z === Seq(0.0, 0.0, 0.0))
  }

  test("optimizer rule rewrites the declarative dot fold to graft_dot") {
    graft.expressions.GraftFunctions.register(spark)
    // range source, not a local relation — the optimizer would otherwise
    // constant-fold the whole projection before the plan is inspectable
    def vec(salt: Int) = array((0 until 12).map(j =>
      (pmod(hash($"id" * 100 + lit(salt * 17 + j)), lit(1000))
        .cast("float") / 500f - 1f)): _*)
    val vecs = spark.range(30).select(vec(1).as("a"), vec(2).as("b"))
    val viaFold = vecs.select(Similarity.dot($"a", $"b").as("d"))
    // the optimized plan carries the compiled expression, not the HOF
    val optimized = viaFold.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_dot"), optimized)
    assert(!optimized.contains("aggregate("), optimized)
    // and values equal the explicit native call exactly
    val a = viaFold.as[Double].collect().toSeq
    val b = vecs.select(Similarity.dotNative($"a", $"b"))
      .as[Double].collect().toSeq
    assert(a === b)
  }

  test("native lshBucket/ivfCell are bit-identical to the folds") {
    graft.expressions.GraftFunctions.register(spark)
    val rng = new scala.util.Random(13)
    val vecs = (0 until 100).map(_ => Tuple1(
      Seq.fill(16)(rng.nextFloat() * 2 - 1))).toDF("v")
    val rows = vecs.select(
      Similarity.lshBucket($"v", 6, dim = 16),
      Similarity.lshBucketNative($"v", 6, 16),
      Similarity.ivfCell($"v", 5, 16),
      Similarity.ivfCellNative($"v", 5, 16)).collect()
    rows.foreach { r =>
      assert(r.getString(0) === r.getString(1))
      assert(r.getInt(2) === r.getInt(3))
    }
  }

  test("bitsFor: bucket count scales with corpus, bounded and monotonic") {
    // enough buckets: 2^bits ≥ n/target (until the 24-bit cap)
    for (n <- Seq(1L, 1000L, 100000L, 10000000L, 1000000000L);
         target <- Seq(128L, 4096L)) {
      val b = Similarity.bitsFor(n, target)
      assert(b >= 4 && b <= 24)
      if (b < 24) assert((1L << b) >= n / target,
        s"n=$n target=$target bits=$b")
    }
    // monotonic in corpus size
    val seq = Seq(1L, 1000L, 100000L, 10000000L)
      .map(Similarity.bitsFor(_, 1024))
    assert(seq === seq.sorted)
    // the round-1 failure mode: 1B vectors must NOT get 16 buckets
    assert(Similarity.bitsFor(1000000000L, 4096) >= 18)
  }

  test("auto-bits nearDupPairs keeps the max bucket share bounded") {
    val rng = new scala.util.Random(7)
    val n = 2048
    val big = (0L until n.toLong).map(i =>
      (i, Seq.fill(16)(rng.nextFloat() * 2 - 1))).toDF("id", "vec")
    val target = 128L
    val bits = Similarity.bitsFor(n, target)
    assert(bits === 4) // ceil(log2(2048/128))
    val sizes = big
      .select(Similarity.lshBucket($"vec", bits, dim = 16).as("b"))
      .groupBy("b").count().as[(String, Long)].collect().map(_._2)
    // random hyperplanes over spread vectors: no bucket hogs the corpus
    assert(sizes.max <= 4 * target,
      s"max bucket ${sizes.max} > 4x target $target")
    graft.Caches.releaseAll()
  }

  test("IVF cell-partitioned probe prunes to the probe cells' directories") {
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_spec")
      .toString
    val rng = new scala.util.Random(5)
    val emb = (0L until 200L).map(i =>
      (i, Seq.fill(8)(rng.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    graft.sources.Warehouse.writeEmbeddingsByCell(emb, root, k = 4, dim = 8)
    val q = Array.tabulate(8)(i => 0.1 * i)
    // serve through ivfServe: probe ranking MUST use the centroids the
    // layout was written with (trained by default), never a mismatched
    // default — the write persisted them next to the data
    val probed = graft.sources.Warehouse.ivfServe(spark, root,
      "vec_id", "embedding", q, topK = 5, nprobe = 2)
    // the scan carries PartitionFilters on the probe cells
    val scan = probed.queryExecution.executedPlan.collectLeaves()
      .head.toString
    assert(scan.contains("PartitionFilters"), scan)
    assert(scan.contains("cell"), scan)
    // probing ALL cells through the serve path is exact brute force —
    // centroid-consistent regardless of how the layout was trained
    val qCol = array(q.map(lit): _*)
    val all = graft.sources.Warehouse.ivfServe(spark, root,
      "vec_id", "embedding", q, topK = 5, nprobe = 4)
    val exact = Similarity.topKCosine(emb, "vec_id", "embedding",
      qCol, 5).as[(Long, Double)].collect().toSeq
    assert(all.as[(Long, Double)].collect().toSeq === exact)
    // round-trip: persisted centroids parse back bit-identically
    val cents = graft.sources.Warehouse.readEmbeddingCentroids(root)
    assert(cents.length === 4 && cents.forall(_.length === 8))
  }

  test("multi-probe LSH: recall@10 ≥ single-probe, measured vs brute force") {
    val emb = Tables(spark, "/root/testdata/sf0.01").embeddings
    val queries = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("q_id"), $"embedding".as("qv"))
    val exact = graft.Caches.persist(
      Similarity.batchTopKCosineExact(emb, "vec_id", "embedding",
        queries, "q_id", "qv", k = 10))
    def meanRecall(hamming: Int): Double = {
      val approx = Similarity.batchAnnTopK(emb, "vec_id", "embedding",
        queries, "q_id", "qv", k = 10, bits = 4, dim = 64,
        hamming = hamming)
      Similarity.recallAtK(exact, approx, "q_id", "vec_id", 10)
        .agg(avg($"recall")).as[Double].collect()(0)
    }
    val r1 = meanRecall(0)
    val rm = meanRecall(1)
    info(f"recall@10 single-probe=$r1%.3f multi-probe=$rm%.3f")
    // Measured on the synthetic corpus: single ≈ 0.17, multi ≈ 0.54.
    // Absolute recall is bounded by the DATA here — these embeddings are
    // near-random, so true top-10 neighbors sit at ~60° and agree with a
    // random hyperplane only ~2/3 of the time per bit (0.67⁴ ≈ 0.2 —
    // matching the single-probe measurement). The engine-side contract
    // this spec pins down: recall is MEASURED (the tuning signal exists),
    // multi-probe is monotone, and Hamming-1 probing recovers a large
    // multiple of what single-probe finds at (bits+1)× candidates. On a
    // real clustered corpus (neighbors at ~20°, 0.94/bit) the same
    // params give single ≈ 0.78, multi ≈ 0.95+.
    assert(rm >= r1)
    assert(rm >= 2.0 * r1,
      f"multi-probe $rm%.3f should far exceed single-probe $r1%.3f here")
    assert(rm >= 0.45, f"multi-probe recall@10 $rm%.3f below 0.45")
    graft.Caches.releaseAll()
  }

  test("recall on a clustered corpus: multi-probe reaches ≥0.9") {
    // the complement of the synthetic-corpus test above: build a corpus
    // with REAL neighbor structure (10 tight clusters, members ≈ 15° off
    // their center) and verify the same 4-bit/Hamming-1 params reach the
    // recall a production tuner would expect
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(10, 64)(rnd.nextGaussian())
    val rows = (0 until 400).map { i =>
      val c = centers(i % 10)
      val v = c.map(x => (x + 0.25 * rnd.nextGaussian()).toFloat)
      (i.toLong, v.toSeq)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("q_id"), $"embedding".as("qv"))
    val exact = graft.Caches.persist(
      Similarity.batchTopKCosineExact(emb, "vec_id", "embedding",
        queries, "q_id", "qv", k = 10))
    val approx = Similarity.batchAnnTopK(emb, "vec_id", "embedding",
      queries, "q_id", "qv", k = 10, bits = 4, dim = 64, hamming = 1)
    val rm = Similarity.recallAtK(exact, approx, "q_id", "vec_id", 10)
      .agg(avg($"recall")).as[Double].collect()(0)
    info(f"clustered-corpus multi-probe recall@10=$rm%.3f")
    assert(rm >= 0.9, f"clustered multi-probe recall $rm%.3f below 0.9")
    graft.Caches.releaseAll()
  }

  test("IVF recall@10 rises with nprobe; probing all cells is exact") {
    val emb = Tables(spark, "/root/testdata/sf0.01").embeddings
    val queries = emb.filter($"vec_id" < 8)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    def recallAt(nprobe: Int): Double = {
      val per = queries.map { case (qid, qv) =>
        val qCol = array(qv.map(v => lit(v.toDouble)): _*)
        val exact = Similarity.topKCosine(emb, "vec_id", "embedding",
          qCol, 10).select("vec_id").as[Long].collect().toSet
        val approx = Similarity.ivfTopKCosine(emb, "vec_id", "embedding",
          qCol, topK = 10, k = 8, dim = 64, nprobe = nprobe)
          .select("vec_id").as[Long].collect().toSet
        (exact.intersect(approx).size / 10.0, qid)
      }
      per.map(_._1).sum / per.length
    }
    val sweep = Seq(1, 2, 4, 8).map(np => np -> recallAt(np))
    info(sweep.map { case (np, r) => f"nprobe=$np:$r%.3f" }.mkString(" "))
    // monotone in nprobe, and probing every cell IS brute force
    assert(sweep.sliding(2).forall { case Seq((_, a), (_, b)) => b >= a })
    assert(sweep.last._2 === 1.0)
  }

  test("int8 quantization: reconstruction error ≤ scale/254 per component") {
    val emb = Tables(spark, "/root/testdata/sf0.001").embeddings
    val q = Similarity.quantizeInt8($"embedding")
    val err = emb.select(
        $"embedding",
        Similarity.dequantizeInt8(q.getField("q"), q.getField("scale"))
          .as("deq"),
        q.getField("scale").as("scale"))
      .select(aggregate(
        zip_with($"embedding", $"deq", (a, b) => abs(a.cast("double") - b)),
        lit(0.0), (acc, x) => greatest(acc, x)).as("maxerr"),
        $"scale")
      .filter($"maxerr" > $"scale" / 254.0 + 1e-9)
      .count()
    assert(err === 0)
  }

  test("ivfCellAt over the seed grid ≡ the md5 ivfCell expression") {
    val emb = Tables(spark, "/root/testdata/sf0.01").embeddings
    val seed = Similarity.seedCentroids(8, 64)
    val diff = emb.select(
        Similarity.ivfCellNative($"embedding", 8, 64).as("a"),
        Similarity.ivfCellAtNative($"embedding", seed).as("b"))
      .filter($"a" =!= $"b").count()
    assert(diff === 0)
  }

  test("trained IVF centroids: lower mean distance, flatter cells than seed") {
    val emb = Tables(spark, "/root/testdata/sf0.01").embeddings
    val seed = Similarity.seedCentroids(8, 64)
    val trained = Similarity.trainIvfCentroids(emb, "embedding", 8, 64)
    def stats(cents: Array[Array[Double]]): (Double, Long) = {
      val rows = Similarity.ivfQuality(emb, "embedding", cents)
        .select($"n".cast("long"), $"mean_dist").as[(Long, Double)]
        .collect()
      val total = rows.map(_._1).sum
      val wMean = rows.map { case (n, m) => n * m }.sum / total
      (wMean, rows.map(_._1).max)
    }
    val (seedDist, seedMaxCell) = stats(seed)
    val (trainedDist, trainedMaxCell) = stats(trained)
    info(f"seed: meanDist=$seedDist%.4f maxCell=$seedMaxCell; " +
      f"trained: meanDist=$trainedDist%.4f maxCell=$trainedMaxCell")
    assert(trainedDist < seedDist,
      "Lloyd rounds must reduce mean point-to-centroid distance")
    assert(trainedMaxCell <= seedMaxCell,
      "training must not make the largest cell worse")
    // determinism: retraining reproduces the exact same centroids
    val again = Similarity.trainIvfCentroids(emb, "embedding", 8, 64)
    assert(trained.flatten.toSeq === again.flatten.toSeq)
  }

  test("Caches.releaseAll unpersists the near-dup intermediate") {
    graft.Caches.releaseAll()
    val pairs = Similarity.nearDupPairs(corpus, "id", "vec", 0.5)
    pairs.collect()
    assert(graft.Caches.activeCount === 1)
    graft.Caches.releaseAll()
    assert(graft.Caches.activeCount === 0)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("QuantizeInt8 native matches the declarative twin bit-for-bit") {
    graft.expressions.GraftFunctions.register(spark)
    val vecs: Seq[Array[Float]] = Seq(
      Array(0.5f, -1.0f, 0.25f, -0.75f),
      Array(0.0f, 0.0f),          // all-zero: q zeros, scale 0
      Array(-3.5f, 3.5f, 1.0f),
      // -1/254*127 = -0.5: HALF_UP (away from zero) gives -1; a
      // math.round-based native would give 0 and fail here
      Array(1.0f, -1.0f, 254.0f),
      Array(1e-8f, -1e-8f, 1.0f))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "embedding")
    def flat(c: org.apache.spark.sql.Column) = Seq(
      col("id"), c.getField("q").as("q"), c.getField("scale").as("sc"))
    val n = df.select(flat(Similarity.quantizeInt8($"embedding")): _*)
      .orderBy("id").as[(Long, Seq[Int], Double)].collect().toSeq
    val d = df.select(
        flat(Similarity.quantizeInt8Declarative($"embedding")): _*)
      .orderBy("id").as[(Long, Seq[Int], Double)].collect().toSeq
    assert(n === d)
    assert(n(3)._2 === Seq(1, -1, 127)) // the HALF_UP tie, away from zero
  }

  test("PQ: trained codebooks beat seed; recall holds at 1/4 of int8's bytes") {
    import graft.pipelines.Similarity
    val emb = Tables(spark, "/root/testdata/sf0.001").embeddings
    val queries = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("q_id"), $"embedding".as("qv"))
    val exact = graft.Caches.persist(Similarity.batchTopKCosineExact(
      emb, "vec_id", "embedding", queries, "q_id", "qv", k = 10))
    def meanRecall(approx: org.apache.spark.sql.DataFrame): Double =
      Similarity.recallAtK(exact, approx, "q_id", "vec_id", 10)
        .agg(avg("recall")).as[Double].collect()(0)
    // 16 subspaces × 16 centroids: 16 one-byte codes = 1/4 of int8's
    // 64 bytes, 1/16 of fp32
    val seedCb = Similarity.pqSeedCodebooks(16, 16, 4)
    val trainedCb = Similarity.trainPqCodebooks(emb, "embedding",
      m = 16, ks = 16, dim = 64)
    val seedR = meanRecall(Similarity.batchPqTopK(emb, "vec_id",
      "embedding", queries, "q_id", "qv", 10, seedCb))
    val trainedR = meanRecall(Similarity.batchPqTopK(emb, "vec_id",
      "embedding", queries, "q_id", "qv", 10, trainedCb))
    // PQ-select + exact re-rank (the serving composition): codes pick
    // 200 candidates, true cosine re-ranks — the exact read touches
    // 200 of 500 vectors per query
    val rerankR = meanRecall(Similarity.batchPqTopKRerank(emb, "vec_id",
      "embedding", queries, "q_id", "qv", k = 10, cand = 200, trainedCb))
    // int8 comparison: top-10 over dequantized (reconstructed) vectors
    val recon = emb.select($"vec_id",
      Similarity.quantizeInt8($"embedding").as("_s"))
      .select($"vec_id",
        Similarity.dequantizeInt8($"_s.q", $"_s.scale").as("embedding"))
    val int8R = meanRecall(Similarity.batchTopKCosineExact(recon,
      "vec_id", "embedding", queries, "q_id", "qv", k = 10))
    info(f"recall@10 — pq_seed: $seedR%.3f, pq_trained: $trainedR%.3f, " +
      f"pq+rerank(200): $rerankR%.3f, int8: $int8R%.3f")
    assert(trainedR >= seedR,
      f"training must not hurt: $trainedR%.3f < $seedR%.3f")
    // raw 16-byte codes cannot out-rank 64-byte int8 on isotropic
    // synthetic embeddings (cosine spreads are tiny); the serving
    // composition recovers recall while reading exact vectors for only
    // the candidate slice
    assert(rerankR >= 0.9, f"PQ+rerank recall@10 $rerankR%.3f")
    graft.Caches.releaseAll()
  }

  test("residual PQ ≥ raw PQ at equal bytes (seed-scaled and trained)") {
    import graft.pipelines.Similarity
    val emb = Tables(spark, "/root/testdata/sf0.001").embeddings
    val queries = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("q_id"), $"embedding".as("qv"))
    val exact = graft.Caches.persist(Similarity.batchTopKCosineExact(
      emb, "vec_id", "embedding", queries, "q_id", "qv", k = 10))
    def meanRecall(approx: org.apache.spark.sql.DataFrame): Double =
      Similarity.recallAtK(exact, approx, "q_id", "vec_id", 10)
        .agg(avg("recall")).as[Double].collect()(0)
    val cents = Similarity.seedCentroids(8, 64)
    // equal bytes both sides: 8 codes × 16 centroids (4 bits each)
    val cbRaw = Similarity.pqSeedCodebooks(8, 16, 8)
    val rawSeedR = meanRecall(Similarity.batchPqTopK(emb, "vec_id",
      "embedding", queries, "q_id", "qv", 10, cbRaw))
    val resSeedR = meanRecall(Similarity.batchPqTopKResidual(emb,
      "vec_id", "embedding", queries, "q_id", "qv", 10, cents,
      cbRaw.map(_.map(_.map(_ * 0.25)))))
    val cbRawT = Similarity.trainPqCodebooks(emb, "embedding", 8, 16, 64,
      iters = 1)
    val cbResT = Similarity.trainResidualPqCodebooks(emb, "embedding",
      cents, 8, 16, 64, iters = 1)
    val rawTR = meanRecall(Similarity.batchPqTopK(emb, "vec_id",
      "embedding", queries, "q_id", "qv", 10, cbRawT))
    val resTR = meanRecall(Similarity.batchPqTopKResidual(emb, "vec_id",
      "embedding", queries, "q_id", "qv", 10, cents, cbResT))
    info(f"recall@10 — raw_seed: $rawSeedR%.3f, res_seed: $resSeedR%.3f, " +
      f"raw_trained1: $rawTR%.3f, res_trained1: $resTR%.3f")
    // the residual distribution is tighter than the raw sphere, so the
    // same 4-bit-per-subspace budget buys more precision (Jégou 2011);
    // the synthetic embeddings are isotropic (unclustered), so the edge
    // is modest — ≥, not ≫
    assert(resSeedR >= rawSeedR,
      f"seed: residual $resSeedR%.3f < raw $rawSeedR%.3f")
    assert(resTR >= rawTR,
      f"trained: residual $resTR%.3f < raw $rawTR%.3f")
    graft.Caches.releaseAll()
  }

  test("PQ codes round-trip: m codes, each a valid codebook index") {
    import graft.pipelines.Similarity
    val emb = Tables(spark, "/root/testdata/sf0.001").embeddings
    val cb = Similarity.pqSeedCodebooks(8, 16, 8)
    val codes = emb.select(
        Similarity.pqEncode(Similarity.normalized($"embedding"), cb)
          .as("c"))
      .as[Seq[Int]].collect()
    assert(codes.forall(_.length === 8))
    assert(codes.forall(_.forall(c => c >= 0 && c < 16)))
    // codes discriminate: not every vector lands on one code word
    assert(codes.distinct.length > codes.length / 4)
  }

  test("hybridTopKRrf: fusion prefers candidates strong in both modalities") {
    val df = Seq(
      (1L, 10.0, 0.1), // lexical champion, vector dud
      (2L, 0.0, 0.99), // vector champion, lexical dud
      (3L, 8.0, 0.9),  // strong in both — must win the fusion
      (4L, 1.0, 0.2))
      .toDF("id", "lex", "vec")
    val got = Similarity.hybridTopKRrf(df, $"id", $"lex", $"vec",
      k = 60, topN = 4).collect()
    graft.Caches.releaseAll()
    // lex ranks: 1,3,4,2 ; vec ranks: 2,3,4,1 → rrf puts 3 first and
    // breaks the symmetric 1-vs-2 tie by id
    assert(got.map(_.getAs[Long]("id")).toSeq === Seq(3L, 1L, 2L, 4L))
    assert(got.head.getAs[Double]("rrf") > got(1).getAs[Double]("rrf"))
  }

  test("simhashHammingTopK: the near-duplicate ranks first, self excluded") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumped over the lazy dog"), // near-dup
      (3L, "entirely unrelated text about database engines and queries"),
      (4L, "another wholly different document on sailing the high seas"))
      .toDF("doc_id", "text")
    val got = Similarity.simhashHammingTopK(docs, "doc_id", col("text"),
      queryIds = Seq(1L), nBits = 32, chunks = 4, k = 3).collect()
    graft.Caches.releaseAll()
    assert(got.forall(_.getAs[Long]("nn_id") != 1L), "self excluded")
    assert(got.head.getAs[Long]("nn_id") === 2L,
      "one-word edit is the nearest banded neighbor")
    val h2 = got.head.getAs[Int]("hamming")
    assert(got.tail.forall(_.getAs[Int]("hamming") >= h2))
  }

  test("knnClassify: majority vote, self excluded, vote ties → smaller label") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (1L, Seq(0.9f, 0.1f, 0.0f, 0.0f), 0),
      (2L, Seq(0.9f, 0.0f, 0.1f, 0.0f), 0),
      (3L, Seq(0.8f, 0.2f, 0.0f, 0.0f), 1),
      (4L, Seq(0.7f, 0.3f, 0.0f, 0.0f), 1),
      (5L, Seq(0.0f, 0.0f, 1.0f, 0.0f), 1)).toDF("vec_id", "embedding", "label")
    val q = emb.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"),
        col("label").as("q_label"))
    // k=3: neighbors 1,2,3 → labels {0,0,1} → pred 0, correct
    val g3 = Similarity.knnClassify(emb, "vec_id", "embedding", "label",
      q, "q_id", "qv", "q_label", k = 3).collect()
    assert(g3.length === 1)
    assert(g3.head.getAs[Int]("pred_label") === 0)
    assert(g3.head.getAs[Long]("votes") === 2L)
    assert(g3.head.getAs[Boolean]("correct"))
    // k=4: neighbors 1,2,3,4 → 2 votes each → tie → smaller label 0
    val g4 = Similarity.knnClassify(emb, "vec_id", "embedding", "label",
      q, "q_id", "qv", "q_label", k = 4).collect()
    assert(g4.head.getAs[Int]("pred_label") === 0)
    assert(g4.head.getAs[Long]("votes") === 2L)
  }

  test("negativeSample: different-label only, ≤k per anchor, " +
    "partitioning-invariant") {
    val corpus = (0L until 200L).map(i => (i, (i % 3).toInt))
      .toDF("vec_id", "label")
    val anchors = corpus.filter($"vec_id".isin(7L, 50L))
    val got = Similarity.negativeSample(corpus, anchors, "vec_id",
      "label", k = 5, buckets = 4, salt = "t")
    val rows = got.as[(Long, Long, Long, Int)].collect().toSeq
    val byAnchor = rows.groupBy(_._1)
    assert(byAnchor.keySet === Set(7L, 50L))
    byAnchor.foreach { case (a, ns) =>
      assert(ns.size <= 5)
      assert(ns.map(_._2).sorted === (1L to ns.size).toSeq, "dense ranks")
      val albl = (a % 3).toInt
      ns.foreach { n =>
        assert(n._4 !== albl, "negative shares the anchor's label")
        assert(n._3 !== a)
      }
    }
    // salted-hash determinism: a different physical partitioning of the
    // corpus yields the identical sample
    val re = Similarity.negativeSample(corpus.repartition(7), anchors,
        "vec_id", "label", k = 5, buckets = 4, salt = "t")
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(re.sorted === rows.sorted)
    // a different salt draws a different sample (resampling epochs)
    val other = Similarity.negativeSample(corpus, anchors, "vec_id",
        "label", k = 5, buckets = 4, salt = "t2")
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(other.sorted !== rows.sorted)
  }

  test("mmrDiversify: duplicates deferred, greedy order deterministic") {
    // a1 and its EXACT duplicate a2 top the relevance ranking; b is a
    // hair less relevant but diverse; c is orthogonal. Plain top-3 is
    // (a1, a2, b) — MMR at λ=0.5 must demote the duplicate behind b
    val pool = Seq(
      (1L, Seq(1.0f, 0.1f, 0.0f, 0.0f)),   // a1: top relevance
      (2L, Seq(1.0f, 0.1f, 0.0f, 0.0f)),   // a2: exact duplicate of a1
      (3L, Seq(0.99f, 0.0f, 0.141f, 0.0f)), // b: near-as-relevant, diverse
      (4L, Seq(0.0f, 1.0f, 0.0f, 0.0f)))   // c: orthogonal
      .toDF("vec_id", "embedding")
    val q = Seq(Tuple1(Seq(1.0f, 0.0f, 0.0f, 0.0f))).toDF("qv")
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.orderBy("rank").select("vec_id").as[Long].collect().toSeq
    val sel = Similarity.mmrDiversify(pool, "vec_id", "embedding", q,
      topN = 4, k = 3, wRel = 1L, wDiv = 1L)
    assert(ids(sel) === Seq(1L, 3L, 2L),
      "duplicate must fall behind the diverse near-peer")
    // rank 1 is the pure-relevance argmax (duplicate tie → smaller id)
    assert(sel.filter($"rank" === 1).select("score").as[Long].head()
      === sel.filter($"rank" === 1).select("rel_micro").as[Long].head())
    // k beyond the pool drains the pool, order still greedy
    assert(ids(Similarity.mmrDiversify(pool, "vec_id", "embedding", q,
      topN = 4, k = 10, wRel = 1L, wDiv = 1L)) === Seq(1L, 3L, 2L, 4L))
    // partitioning-independent (integer scores, id tie-breaks)
    assert(ids(Similarity.mmrDiversify(pool.repartition(7), "vec_id",
      "embedding", q, topN = 4, k = 3, wRel = 1L, wDiv = 1L))
      === Seq(1L, 3L, 2L))
    // at the default 7/3 weights relevance dominates harder, but an
    // exact duplicate still never outranks its twin's diverse near-peer
    assert(ids(Similarity.mmrDiversify(pool, "vec_id", "embedding", q,
      topN = 4, k = 2)) === Seq(1L, 3L))
    graft.Caches.releaseAll()
  }

  test("mmrDiversify: single-task path matches the driver-side greedy " +
    "over the same engine-computed pool") {
    // the production path runs the greedy inside one mapPartitions task
    // over the pooled rel/sim rows; this harness collects the SAME
    // engine-computed micro-units to the driver and runs the shared
    // mmrGreedy there — the two must agree row-for-row
    val pool = (0L until 40L).map { i =>
      val a = i * 0.61803398875 // golden-angle spread of directions
      (i, Seq(math.cos(a).toFloat, math.sin(a).toFloat,
        math.cos(2 * a).toFloat, math.sin(3 * a).toFloat))
    }.toDF("vec_id", "embedding")
    val q = Seq(Tuple1(Seq(1.0f, 0.2f, -0.3f, 0.5f))).toDF("qv")
    val (topN, k, wRel, wDiv) = (25, 10, 7L, 3L)
    val got = Similarity.mmrDiversify(pool, "vec_id", "embedding", q,
        topN, k, wRel, wDiv)
      .orderBy("rank").as[(Long, Long, Long, Long)].collect().toSeq
    // driver-side reference: identical micro expressions, collected
    def micro(c: org.apache.spark.sql.Column) =
      round(round(c, 6) * lit(1e6), 0).cast("long")
    val cand = pool.crossJoin(broadcast(q))
      .select($"vec_id", $"embedding",
        micro(Similarity.cosineNative($"embedding", $"qv")).as("rel"))
      .orderBy($"rel".desc, $"vec_id").limit(topN)
    val rel = cand.select("vec_id", "rel").as[(Long, Long)]
      .collect().toSeq
    val sim = cand.select($"vec_id".as("ia"), $"embedding".as("va"))
      .crossJoin(cand.select($"vec_id".as("ib"), $"embedding".as("vb")))
      .filter($"ia" =!= $"ib")
      .select($"ia", $"ib",
        micro(Similarity.cosineNative($"va", $"vb")).as("sim"))
      .as[(Long, Long, Long)].collect()
      .map { case (x, y, v) => (x, y) -> v }.toMap
    val ref = Similarity.mmrGreedy(rel, sim, k, wRel, wDiv)
    assert(got === ref)
    assert(got.size === k)
    graft.Caches.releaseAll()
  }

  test("centroidOutliers: planted corrupt vector flags, tight clusters don't") {
    // two tight clusters on their centroids plus one vector far from
    // both — only it should cross z ≥ 2 in its (nearest) cell
    val cents = Array(Array(0.0, 0.0), Array(10.0, 10.0))
    val rows =
      (0L until 20L).map(i => (i, Seq((i % 5) * 0.01f, 0.0f))) ++
      (20L until 40L).map(i => (i, Seq(10f + (i % 5) * 0.01f, 10.0f))) ++
      Seq((99L, Seq(3.0f, 3.0f)))
    val df = rows.toDF("id", "vec")
    val got = Similarity.centroidOutliers(df, "id", "vec", cents,
      zThresh = 2.0)
    assert(got.select("id").as[Long].collect().toSeq === Seq(99L))
    assert(got.select("cell").as[Long].head() === 0L)
    // z is bit-identical under a different partitioning (the power
    // sums accumulate exact micro-unit integers, never floats)
    val re = Similarity.centroidOutliers(df.repartition(7), "id", "vec",
      cents, zThresh = 2.0)
    assert(re.select("id", "z").as[(Long, Double)].collect().toSeq
      === got.select("id", "z").as[(Long, Double)].collect().toSeq)
    // a singleton cell (no sample variance) must flag nothing
    val lone = Seq((0L, Seq(0.0f, 0.0f)), (1L, Seq(9.0f, 9.0f)))
      .toDF("id", "vec")
    assert(Similarity.centroidOutliers(lone, "id", "vec", cents).count()
      === 0L)
  }
}
