package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** PageRank fixed-point semantics: mass conservation (up to floor
  * losses), dangling redistribution, ordering, and bit-determinism
  * under repartitioning.
  */
class GraphSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // A feeds B heavily, B feeds C, C is dangling (no out-edges)
  private val edges = Seq(
    ("A", "B", 9L), ("A", "C", 1L), ("B", "C", 10L))
    .toDF("src", "dst", "w")

  test("ranks sum to ~total (floor losses only) and follow the flow") {
    val r = Graph.pageRank(edges, "src", "dst", "w", iters = 10)
      .as[(String, Long)].collect().toMap
    assert(r.keySet === Set("A", "B", "C"))
    val total = r.values.sum
    // each of 3 nodes can floor-lose a few pico-units per division per
    // iteration; anything beyond a thousand lost units is a logic bug
    assert(total <= 1000000000000L && total > 1000000000000L - 1000L)
    // C receives everything B has plus a tenth of A: must rank first;
    // A only gets teleport + dangling share: must rank last
    assert(r("C") > r("B") && r("B") > r("A"))
  }

  test("bit-identical under repartitioning and resilient to pre-split edges") {
    val base = Graph.pageRank(edges, "src", "dst", "w", iters = 10)
      .orderBy("node").as[(String, Long)].collect().toSeq
    val re = Graph.pageRank(edges.repartition(13), "src", "dst", "w",
        iters = 10)
      .orderBy("node").as[(String, Long)].collect().toSeq
    assert(re === base)
    // the same edge split across rows must aggregate to the same graph
    val split = Seq(("A", "B", 4L), ("A", "B", 5L), ("A", "C", 1L),
      ("B", "C", 7L), ("B", "C", 3L)).toDF("src", "dst", "w")
    val sp = Graph.pageRank(split, "src", "dst", "w", iters = 10)
      .orderBy("node").as[(String, Long)].collect().toSeq
    assert(sp === base)
  }

  test("trustRank: unreachable-from-seeds decays to zero; all-seeds ≡ pageRank") {
    // A is trusted; C pumps into B but has no inbound path from A, so
    // C's rank must decay to exactly zero (it starts at 0 and only
    // teleport/dangling mass — seeds-only — could refill it)
    val e = Seq(("A", "B", 1L), ("C", "B", 1L)).toDF("src", "dst", "w")
    val r = Graph.trustRank(e, "src", "dst", "w", seeds = Seq("A"),
        iters = 10)
      .as[(String, Long)].collect().toMap
    assert(r("C") === 0L)
    assert(r("A") > 0L && r("B") > 0L)
    // B additionally receives nothing through C (C never has mass to
    // push), so total mass ≈ total (floor losses only)
    assert(r.values.sum > 1000000000000L - 1000L)
    // seeding EVERY node reduces exactly to the uniform operator
    val all = Graph.trustRank(edges, "src", "dst", "w",
        seeds = Seq("A", "B", "C"), iters = 10)
      .orderBy("node").as[(String, Long)].collect().toSeq
    val uni = Graph.pageRank(edges, "src", "dst", "w", iters = 10)
      .orderBy("node").as[(String, Long)].collect().toSeq
    assert(all === uni)
    // absent seeds are ignored; an all-absent seed set refuses
    assertThrows[IllegalArgumentException] {
      Graph.trustRank(edges, "src", "dst", "w", seeds = Seq("ZZ"),
        iters = 2).collect()
    }
  }

  test("dangling-only graph: uniform stationary ranks") {
    // one edge A->B: B is dangling, its mass teleports back; symmetric
    // enough that both ranks stay positive and total is conserved
    val tiny = Seq(("A", "B", 1L)).toDF("src", "dst", "w")
    val r = Graph.pageRank(tiny, "src", "dst", "w", iters = 10)
      .as[(String, Long)].collect().toMap
    assert(r("B") > r("A")) // B gets all of A's flow, A only recycles
    assert(r.values.sum > 1000000000000L - 100L)
  }

  test("streaming delta refresh converges to the batch ranks") {
    import graft.streaming.GraphStream
    val landing = java.nio.file.Files
      .createTempDirectory("gs_landing").toString
    val state = java.nio.file.Files.createTempDirectory("gs_state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("gs_ckpt").toString
    val d1 = Seq(("a", "b", 1L), ("b", "c", 1L)).toDF("src", "dst", "w")
    val d2 = Seq(("c", "a", 2L), ("a", "c", 1L)).toDF("src", "dst", "w")
    val d3 = Seq(("c", "b", 1L), ("d", "a", 3L)).toDF("src", "dst", "w")
    // three deltas, each its own micro-batch across checkpoint restarts
    for (d <- Seq(d1, d2, d3)) {
      d.coalesce(1).write.mode("append").parquet(landing)
      GraphStream.start(spark, landing, state, ckpt, refreshIters = 6)
        .awaitTermination(120000)
    }
    // 1) the maintained edge log is lossless: a cold run over the
    // accumulated state is bit-equal to the batch engine on the union
    val full = d1.unionByName(d2).unionByName(d3)
    val coldState = Graph.pageRank(GraphStream.edgeState(spark, state),
      "src", "dst", "w", iters = 10).as[(String, Long)].collect().toMap
    val coldBatch = Graph.pageRank(full, "src", "dst", "w", iters = 10)
      .as[(String, Long)].collect().toMap
    assert(coldState === coldBatch)
    // 2) warm-started stabilization from the streamed ranks lands on
    // the batch fixed point (within integer floor noise) in fewer
    // iterations than a cold start needs
    val warm = GraphStream.latestRanks(spark, state).get
    val (warmStable, itWarm) = Graph.pageRankUntilStable(full, "src",
      "dst", "w", init = Some(warm), maxIters = 60, tol = 5L)
    val (batchStable, itCold) = Graph.pageRankUntilStable(full, "src",
      "dst", "w", init = None, maxIters = 60, tol = 5L)
    val w2 = warmStable.as[(String, Long)].collect().toMap
    val b2 = batchStable.as[(String, Long)].collect().toMap
    assert(w2.keySet === b2.keySet)
    val maxDiff = w2.keySet.map(k => math.abs(w2(k) - b2(k))).max
    assert(maxDiff <= 200L,
      s"warm/cold stable ranks diverged by $maxDiff pico-units")
    assert(itWarm <= itCold,
      s"warm start took $itWarm iterations vs cold $itCold")
    // 3) an at-least-once replay of an already-committed batch id is
    // fenced: neither the edge log nor the snapshots change
    val edgesBefore = GraphStream.edgeState(spark, state)
      .as[(String, String, Long)].collect().toSet
    GraphStream.refresh(spark, state,
      Seq(("z", "z", 99L)).toDF("src", "dst", "w"), batchId = 0L,
      refreshIters = 6)
    assert(GraphStream.edgeState(spark, state)
      .as[(String, String, Long)].collect().toSet === edgesBefore)
    // 4) compacting the delta log changes no answer and shrinks the
    // file count (the nightly maintenance for a long-running stream)
    def parquetFiles(): Int =
      java.nio.file.Files.walk(java.nio.file.Paths.get(s"$state/edges"))
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .count().toInt
    val filesBefore = parquetFiles()
    GraphStream.compactEdges(spark, state)
    assert(GraphStream.edgeState(spark, state)
      .as[(String, String, Long)].collect().toSet === edgesBefore)
    assert(parquetFiles() < filesBefore,
      s"compaction did not shrink the log ($filesBefore files)")
  }

  test("streaming trustRank refresh: cold batch is bit-exact, warm delta conserves") {
    import graft.streaming.GraphStream
    val landing = java.nio.file.Files
      .createTempDirectory("gs_tr_landing").toString
    val state = java.nio.file.Files
      .createTempDirectory("gs_tr_state").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("gs_tr_ckpt").toString
    val d1 = Seq(("a", "b", 2L), ("b", "c", 1L), ("c", "a", 1L))
      .toDF("src", "dst", "w")
    d1.coalesce(1).write.mode("append").parquet(landing)
    GraphStream.start(spark, landing, state, ckpt, refreshIters = 10,
      seeds = Seq("a")).awaitTermination(120000)
    val streamed = GraphStream.latestRanks(spark, state).get
      .as[(String, Long)].collect().toMap
    val batch = Graph.trustRank(d1, "src", "dst", "w", Seq("a"),
      iters = 10).as[(String, Long)].collect().toMap
    assert(streamed === batch) // cold single batch ≡ batch trustRank
    // a warm delta refresh keeps the node universe and (approximate)
    // mass conservation — the machinery proven convergent for pageRank
    // runs identically under the seed-restricted teleport
    val d2 = Seq(("c", "d", 1L), ("d", "a", 1L)).toDF("src", "dst", "w")
    d2.coalesce(1).write.mode("append").parquet(landing)
    GraphStream.start(spark, landing, state, ckpt, refreshIters = 6,
      seeds = Seq("a")).awaitTermination(120000)
    val warm = GraphStream.latestRanks(spark, state).get
      .as[(String, Long)].collect().toMap
    assert(warm.keySet === Set("a", "b", "c", "d"))
    assert(warm.values.sum > 900000000000L) // ~total, floor losses only
  }

  test("hits: authorities absorb mass, hubs split by weight, exact pico") {
    val R = 1000000000000L
    // a→c (w=3), b→c (w=1): c is the sole authority (auth = R);
    // hubs split 3:1 → a = (3R·R)//(4R) = 750e9, b = 250e9. Stable
    // from round 1, so 5 rounds must land exactly there.
    val edges = Seq(("a", "c", 3L), ("b", "c", 1L)).toDF("s", "d", "w")
    val got = Graph.hits(edges, "s", "d", "w", iters = 5)
      .orderBy("node").as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("a", 0L, 750000000000L),
      ("b", 0L, 250000000000L), ("c", R, 0L)))
    Caches.releaseAll()
    // determinism: a different partitioning reproduces bit-identical
    // scores (integer fixed-point contract)
    val got2 = Graph.hits(edges.repartition(7), "s", "d", "w", iters = 5)
      .orderBy("node").as[(String, Long, Long)].collect().toSeq
    assert(got2 === got)
    Caches.releaseAll()
  }

  test("edge retraction by compensating delta composes bit-exactly") {
    // an append-only edge log retracts a link by appending negative
    // weight (GraphStream's state is exactly such a log): the rank of
    // (edges ∪ retractions) must equal the rank of the reduced graph
    val withRetraction = edges.unionByName(
      Seq(("B", "C", -10L)).toDF("src", "dst", "w"))
    val reduced = Seq(("A", "B", 9L), ("A", "C", 1L))
      .toDF("src", "dst", "w")
    assert(Graph.pageRank(withRetraction, "src", "dst", "w", iters = 8)
        .orderBy("node").as[(String, Long)].collect().toSeq ===
      Graph.pageRank(reduced, "src", "dst", "w", iters = 8)
        .orderBy("node").as[(String, Long)].collect().toSeq)
    // regression: B's ONLY out-edge fully retracted — previously wout
    // summed to 0 and the contrib step hit an ANSI division error;
    // now B simply becomes a dangling node. Same composition for HITS.
    assert(Graph.hits(withRetraction, "src", "dst", "w", iters = 4)
        .orderBy("node").as[(String, Long, Long)].collect().toSeq ===
      Graph.hits(reduced, "src", "dst", "w", iters = 4)
        .orderBy("node").as[(String, Long, Long)].collect().toSeq)
    // partial retraction only reduces the weight, keeps the edge
    val partial = edges.unionByName(
      Seq(("B", "C", -4L)).toDF("src", "dst", "w"))
    val lighter = Seq(("A", "B", 9L), ("A", "C", 1L), ("B", "C", 6L))
      .toDF("src", "dst", "w")
    assert(Graph.pageRank(partial, "src", "dst", "w", iters = 8)
        .orderBy("node").as[(String, Long)].collect().toSeq ===
      Graph.pageRank(lighter, "src", "dst", "w", iters = 8)
        .orderBy("node").as[(String, Long)].collect().toSeq)
    Caches.releaseAll()
  }

  test("triangles: shared-edge pair counted once each; danglers absent") {
    // 1-2-3 and 2-3-4 share edge (2,3); (1,5) closes nothing
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L)).toDF("doc_a", "doc_b")
    val got = Graph.triangles(edges, "doc_a", "doc_b")
      .orderBy("node").as[(Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 1L), (2L, 2L), (3L, 2L), (4L, 1L)))
  }

  test("label propagation: cliques converge to min-label communities, " +
    "a weak bridge doesn't merge them, repartitioning is bit-identical") {
    // two heavy triangles bridged by one weight-1 edge, plus one node
    // whose only edge is a self-loop (must keep its own label)
    val edges = Seq(
      ("a", "b", 10L), ("b", "c", 10L), ("a", "c", 10L),
      ("x", "y", 10L), ("y", "z", 10L), ("x", "z", 10L),
      ("c", "x", 1L), ("s", "s", 5L)).toDF("src", "dst", "w")
    def run(e: org.apache.spark.sql.DataFrame) =
      Graph.labelPropagation(e, "src", "dst", "w", iters = 5)
        .orderBy("node").as[(String, String)].collect().toSeq
    val got = run(edges)
    assert(got === Seq("a" -> "a", "b" -> "a", "c" -> "a",
      "s" -> "s", "x" -> "x", "y" -> "x", "z" -> "x"))
    assert(got === run(edges.repartition(13)),
      "communities must not depend on partitioning")
    Caches.releaseAll()
  }
}
