package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge lists — the curation-side use is
  * link-/transition-graph centrality (CommonCrawl-style host ranking
  * feeds crawl frontier and quality priors; here the same operator runs
  * over any `(src, dst, weight)` edge list).
  *
  * Determinism contract: ranks live in integer PICO-units of the total
  * mass (1e12 = all rank), every per-edge contribution is an integer
  * floor division, and sums are over longs — so any partitioning, any
  * executor count, any merge order produces bit-identical ranks, and a
  * DuckDB twin can reproduce the fixed-point arithmetic exactly.
  * Overflow bound: `rank * w` with rank ≤ 1e12 requires per-edge
  * weights below ~9e6; aggregate-heavier graphs should pre-scale
  * weights (the ranking is scale-invariant in w per src).
  */
object Graph {

  /** Weighted PageRank by synchronous power iteration.
    *
    * Per iteration: each node's rank splits over its out-edges
    * proportional to weight (`rank * w div wout`, floor per edge; the
    * remainder mass vanishes — deterministic and ≤ out-degree
    * pico-units per node); dangling nodes (no out-edges) redistribute
    * their rank uniformly (`d div n`); damping mixes 15% uniform
    * teleport with 85% of the propagated mass:
    * `rank' = c0 + (contrib + d div n) * 85 div 100` with
    * `c0 = (total * 15 div 100) div n`.
    *
    * Scale shape: the edge list aggregates once (one shuffle on
    * (src, dst)) and persists; each iteration is one join of the edge
    * list against the node-sized rank table (broadcast when small, AQE
    * decides) plus a map-side-combinable sum per dst; `localCheckpoint`
    * truncates the growing lineage every iteration (same pattern as
    * [[graft.pipelines.Dedup.connectedComponents]]). Node set = nodes
    * incident to an edge.
    *
    * Returns `(node, rank_pico)`.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               wCol: String, iters: Int = 10,
               total: Long = 1000000000000L): DataFrame =
    rankImpl(edges, srcCol, dstCol, wCol, iters, total, seeds = None)

  /** Seed-biased PageRank — TrustRank (Gyöngyi et al. 2004) /
    * personalized PageRank: the teleport mass and every dangling
    * node's redistributed rank go ONLY to the trusted `seeds` instead
    * of uniformly to all nodes, so rank can reach a node exclusively
    * through link paths from the seed set. The standard web-curation
    * uses: demote spam hosts (no path from trusted seeds ⇒ rank decays
    * to zero) and prioritize a topic-focused crawl frontier. Same
    * fixed-point pico-unit arithmetic, same per-iteration plan shape
    * as [[pageRank]]; ranks start as the teleport vector
    * (`total div |seeds|` on seeds, 0 elsewhere). Seeds absent from
    * the graph's node set are ignored (their teleport share vanishes
    * like floor mass); at least one seed must be present.
    */
  def trustRank(edges: DataFrame, srcCol: String, dstCol: String,
                wCol: String, seeds: Seq[String], iters: Int = 10,
                total: Long = 1000000000000L): DataFrame = {
    require(seeds.nonEmpty, "trustRank needs at least one seed")
    rankImpl(edges, srcCol, dstCol, wCol, iters, total, Some(seeds))
  }

  /** Warm-started PageRank: iterate from `init` (`(node, rank_pico)` —
    * a previous run's output) instead of the uniform vector. After a
    * small edge delta the previous fixed point is already near the new
    * one, so a handful of iterations recovers it — the delta-refresh
    * that keeps a continuously-crawled link graph's ranks current
    * without paying the cold-start iteration count per batch
    * ([[graft.streaming.GraphStream]]). Nodes new to the graph start
    * at 0 (the teleport term re-injects their mass); departed nodes'
    * entries are dropped.
    */
  def pageRankWarm(edges: DataFrame, srcCol: String, dstCol: String,
                   wCol: String, init: DataFrame, iters: Int = 10,
                   total: Long = 1000000000000L): DataFrame =
    rankImpl(edges, srcCol, dstCol, wCol, iters, total, seeds = None,
      init = Some(init))

  /** Warm-started TrustRank — [[pageRankWarm]] with the seed-restricted
    * teleport basis of [[trustRank]]: the delta-refresh for a
    * continuously-maintained spam-demotion / focused-crawl ranking.
    */
  def trustRankWarm(edges: DataFrame, srcCol: String, dstCol: String,
                    wCol: String, seeds: Seq[String], init: DataFrame,
                    iters: Int = 10,
                    total: Long = 1000000000000L): DataFrame = {
    require(seeds.nonEmpty, "trustRank needs at least one seed")
    rankImpl(edges, srcCol, dstCol, wCol, iters, total, Some(seeds),
      init = Some(init))
  }

  /** PageRank iterated until the fixed point is STABLE: stop when no
    * node's rank moved more than `tol` pico-units between consecutive
    * iterations (or at `maxIters`). Returns the ranks and the number
    * of iterations actually run — the delta-refresh efficiency signal
    * (warm restarts after small deltas should stabilize in far fewer
    * rounds than a cold start). The integer arithmetic makes the
    * stability test exact and engine-independent.
    */
  def pageRankUntilStable(edges: DataFrame, srcCol: String,
                          dstCol: String, wCol: String,
                          init: Option[DataFrame] = None,
                          maxIters: Int = 50, tol: Long = 0L,
                          total: Long = 1000000000000L)
      : (DataFrame, Int) = {
    val ctx = buildCtx(edges, srcCol, dstCol, wCol, total, seeds = None)
    var ranks = initRanks(ctx, init, total)
    var it = 0
    var stable = false
    while (it < maxIters && !stable) {
      val next = step(ctx, ranks).localCheckpoint(true)
      val moved = next
        .join(ranks.withColumnRenamed("rank", "_prev"), "node")
        .agg(coalesce(max(abs(col("rank") - col("_prev"))), lit(0L)))
        .collect()(0).getLong(0)
      stable = moved <= tol
      ranks = next
      it += 1
    }
    (ranks.withColumnRenamed("rank", "rank_pico"), it)
  }

  /** Graph-shape context shared by every rank variant: the aggregated
    * weighted edge list with per-src out-weights, the node set, the
    * teleport basis, and the per-iteration constants.
    */
  private final case class RankCtx(el: DataFrame, nodes: DataFrame,
                                   srcs: DataFrame, nT: Long, c0: Long,
                                   isTeleport: org.apache.spark.sql.Column)

  private def buildCtx(edges: DataFrame, srcCol: String, dstCol: String,
                       wCol: String, total: Long,
                       seeds: Option[Seq[String]]): RankCtx = {
    // w <= 0 after aggregation = a DELETED edge: appending a
    // compensating negative delta is how an append-only edge log
    // retracts a link (GraphStream's state is exactly such a log).
    // Without the filter a fully-retracted edge still held its
    // endpoints in the node set, and a src whose every edge was
    // retracted made `wout` 0 — an ANSI division error in the contrib
    // step. Filtered, retraction composes: rank(edges ∪ retractions)
    // ≡ rank(edges minus retracted) bit-exactly (GraphSpec pins it).
    val agg = edges.groupBy(col(srcCol).as("src"), col(dstCol).as("dst"))
      .agg(sum(col(wCol)).as("w"))
      .filter(col("w") > 0)
    val el = graft.Caches.persist(
      agg.withColumn("wout", sum(col("w")).over(
        Window.partitionBy(col("src")))))
    val nodes = el.select(col("src").as("node"))
      .unionByName(el.select(col("dst").as("node"))).distinct()
    val srcs = el.select(col("src").as("node")).distinct()
    val n = nodes.count()
    require(n > 0, "pageRank needs at least one edge")
    // teleport basis: all nodes (classic) or the present seeds only
    val nT = seeds match {
      case None     => n
      case Some(ss) =>
        val present = nodes.filter(col("node").isin(ss: _*)).count()
        require(present > 0, "no seed is present in the graph")
        present
    }
    val isTeleport = seeds match {
      case None     => lit(true)
      case Some(ss) => col("node").isin(ss: _*)
    }
    RankCtx(el, nodes, srcs, nT, (total * 15L / 100L) / nT, isTeleport)
  }

  /** Start vector: the teleport distribution (cold), or `init`
    * projected onto the current node set (warm — new nodes at 0).
    */
  private def initRanks(ctx: RankCtx, init: Option[DataFrame],
                        total: Long = 1000000000000L): DataFrame =
    (init match {
      case None => ctx.nodes.withColumn("rank",
        when(ctx.isTeleport, lit(total / ctx.nT)).otherwise(lit(0L)))
      case Some(prev) => ctx.nodes
        .join(prev.withColumnRenamed("rank_pico", "rank"),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("rank"), lit(0L)).as("rank"))
    }).localCheckpoint(true)

  /** One synchronous power iteration in pico-unit integer arithmetic. */
  private def step(ctx: RankCtx, ranks: DataFrame): DataFrame = {
    val contrib = ctx.el
      .join(ranks.withColumnRenamed("node", "src"), "src")
      .withColumn("c", expr("rank * w div wout"))
      .groupBy(col("dst").as("node")).agg(sum(col("c")).as("contrib"))
    val dangling = ranks.join(ctx.srcs, Seq("node"), "left_anti")
      .agg(coalesce(sum(col("rank")), lit(0L)).as("d"))
    ctx.nodes
      .join(contrib, Seq("node"), "left")
      .crossJoin(broadcast(dangling))
      // `div` (integer floor division) via expr: Column `/` would be
      // double division and break the fixed-point bit contract
      .withColumn("_prop", coalesce(col("contrib"), lit(0L)) +
        when(ctx.isTeleport, expr(s"d div ${ctx.nT}")).otherwise(lit(0L)))
      .select(col("node"),
        (when(ctx.isTeleport, lit(ctx.c0)).otherwise(lit(0L)) +
          expr("(_prop * 85) div 100")).as("rank"))
  }

  private def rankImpl(edges: DataFrame, srcCol: String, dstCol: String,
                       wCol: String, iters: Int, total: Long,
                       seeds: Option[Seq[String]],
                       init: Option[DataFrame] = None): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val ctx = buildCtx(edges, srcCol, dstCol, wCol, total, seeds)
    var ranks = initRanks(ctx, init, total)
    for (_ <- 1 to iters) {
      // eager checkpoint EVERY round, deliberately: `step` reads
      // `ranks` twice (contrib join + dangling aggregate), so an
      // unmaterialized predecessor doubles the recompute tree per
      // round — measured 2× slower when checkpointing every 3rd
      ranks = step(ctx, ranks).localCheckpoint(true)
    }
    ranks.withColumnRenamed("rank", "rank_pico")
  }

  /** Per-node triangle census over an undirected edge list given in
    * canonical `a < b` order (e.g. the minhash candidate-pair graph —
    * there a triangle means three mutually-similar documents, so the
    * census measures cluster COHESION: near-clique duplicate groups
    * vs chains of borderline pairs). Classic two-join wedge closing:
    * wedges (a<b<c via e1.b = e2.a) joined against the closing edge
    * (a, c); the a<b<c canonical order counts each triangle exactly
    * once with no post-dedup. Cost is the wedge count
    * Σ_b in(b)·out(b) — bounded for banded candidate graphs (bucket
    * size caps the degree), and the standard node-iterator bound
    * O(m^{3/2}) for general sparse graphs. Both joins hash-partition
    * on a node key; nothing is ever corpus-quadratic.
    *
    * Output: `node, n_tri` for every node in ≥ 1 triangle.
    */
  def triangles(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    // persisted: the edge relation feeds BOTH wedge sides and the
    // closing join — unpersisted, the (possibly expensive) plan behind
    // it would re-execute three times (the repo-wide Caches convention
    // for shared self-join inputs)
    val e0 = graft.Caches.persist(
      edges.select(col(aCol).as("a"), col(bCol).as("b")))
    val e = e0
    val closing = e0.select(col("a").as("ca"), col("b").as("cb"))
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("a"), col("e1.b").as("b"),
        col("e2.b").as("c"))
      .join(closing, col("a") === col("ca") && col("c") === col("cb"))
      .select("a", "b", "c")
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
  }

  /** HITS hubs & authorities (Kleinberg 1999) by synchronous mutual
    * reinforcement: `auth[v] = Σ_{u→v} w·hub[u]`, then
    * `hub[u] = Σ_{u→v} w·auth[v]`, each side L1-renormalized to
    * `total` pico-units after its half-step. The link-curation use is
    * the directory/content split PageRank's single score conflates:
    * hub-heavy hosts are link farms/directories (crawl them for
    * FRONTIER, not for content), authority-heavy hosts are the
    * content targets quality priors should boost.
    *
    * Same determinism contract as [[pageRank]]: integer pico-unit
    * scores, every renormalized score an exact truncating division
    * (`x·total div S` — Spark's `div` and DuckDB's `//` agree for
    * non-negative operands). The per-edge product and the per-node
    * raw sum accumulate as DECIMAL(38,0) (exact far past 2^63 — a
    * long sum would silently wrap under non-ANSI mode and diverge
    * from a HUGEINT oracle without erroring); the renormalization
    * product `raw·total` is guarded by a fail-fast bound (raw below
    * ~1e25 so the decimal(38,0) product cannot overflow-to-null —
    * exceeding it raises, with a pre-scale-your-weights message,
    * instead of silently zeroing scores).
    *
    * Plan: per half-step ONE join of the persisted edge list against
    * the node-sized score table + one map-side-combined sum per
    * opposite endpoint + a broadcast 1-row L1 total. ONE eager
    * localCheckpoint per FULL iteration (the hub side): unlike
    * [[rankImpl]]'s `step`, a half-step reads its predecessor only
    * once, so the auth half can stay a lazily-persisted subplan of
    * the hub checkpoint job — half the barrier jobs of
    * checkpoint-per-half-step, with the auth table cached (not
    * recomputed) for the two consumers inside the hub half (L1 agg +
    * renorm join). Lineage stays bounded: every iteration's plan
    * bottoms out at the previous hub checkpoint.
    *
    * Returns `(node, auth_pico, hub_pico)`.
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           wCol: String, iters: Int = 5,
           total: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val el = graft.Caches.persist(
      edges.groupBy(col(srcCol).as("src"), col(dstCol).as("dst"))
        .agg(sum(col(wCol)).as("w"))
        .filter(col("w") > 0)) // retracted edges drop (see buildCtx)
    val nodes = graft.Caches.persist(
      el.select(col("src").as("node"))
        .unionByName(el.select(col("dst").as("node"))).distinct())
    val n = nodes.count()
    require(n > 0, "hits needs at least one edge")
    // raw·total must fit decimal(38,0) for the renorm division to be
    // exact: cap raw at 1e25 (total = 1e12 leaves a 10× margin) and
    // raise instead of letting the product overflow to null
    val rawBound = "CAST(1e25 AS DECIMAL(38,0))"
    // half-step: raw = Σ w·score over the joined endpoint (decimal —
    // immune to silent long wrap), then L1 renormalize with one exact
    // truncating division per node
    def half(scores: DataFrame, scoreCol: String, joinSide: String,
             outSide: String, outCol: String): DataFrame = {
      val raw = el
        .join(scores.withColumnRenamed("node", joinSide), joinSide)
        .groupBy(col(outSide).as("node"))
        .agg(sum(col(scoreCol).cast("decimal(38,0)") * col("w"))
          .cast("decimal(38,0)").as("_raw"))
      val s1 = raw.agg(
        coalesce(sum(col("_raw")), lit(0))
          .cast("decimal(38,0)").as("_s"),
        coalesce(max(col("_raw")), lit(0))
          .cast("decimal(38,0)").as("_mx"))
      nodes.join(raw, Seq("node"), "left")
        .crossJoin(broadcast(s1))
        .select(col("node"),
          when(expr(s"_mx > $rawBound"),
            expr("CAST(raise_error('graft.hits: per-node raw sum " +
              "exceeds the exact renormalization bound (~1e25 " +
              "pico-units) - pre-scale edge weights') AS LONG)"))
            .otherwise(when(col("_s") <= 0, lit(0L))
              .otherwise(expr("CAST((CAST(coalesce(_raw, 0) AS " +
                s"DECIMAL(38,0)) * $total) div _s AS LONG)")))
            .as(outCol))
    }
    var hubs = nodes.select(col("node"), lit(total / n).as("hub"))
      .localCheckpoint(true)
    var auths: DataFrame = null
    for (_ <- 1 to iters) {
      val prevAuths = auths
      auths = graft.Caches.persist(half(hubs, "hub", "src", "dst", "auth"))
      hubs = half(auths, "auth", "dst", "src", "hub")
        .localCheckpoint(true) // eager: materializes this auths too
      // the hub checkpoint no longer reads last iteration's auth cache,
      // and the output join needs only the FINAL auths — release the
      // stale one now instead of accreting one node-sized cached table
      // per iteration until releaseAll
      if (prevAuths != null) prevAuths.unpersist(blocking = false)
    }
    nodes.join(auths, Seq("node"), "left")
      .join(hubs, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("auth"), lit(0L)).as("auth_pico"),
        coalesce(col("hub"), lit(0L)).as("hub_pico"))
  }

  /** Weighted SYNCHRONOUS label propagation (Raghavan 2007) — the
    * community-detection sibling of the centrality family: every node
    * starts as its own label, and each round adopts the label with the
    * highest total incident weight among its neighbors' PREVIOUS
    * labels. The curation use is grouping a link/affinity graph into
    * behavioral communities (domains that interlink, users that touch
    * the same content) without choosing k.
    *
    * Determinism contract, same spirit as the pico-unit ranks: votes
    * are exact long sums of the edge weights, and the argmax
    * tie-breaks on the smallest label — so any partitioning produces
    * identical communities, and the DuckDB twin replays the rounds
    * exactly. Synchronous (not the paper's asynchronous sweep) because
    * asynchronous update order is inherently nondeterministic
    * distributed; the fixed round count bounds oscillation instead.
    *
    * Edges are symmetrized (membership is mutual) and parallel edges
    * merge; self-loops drop (a node voting for itself freezes
    * trivially), but self-loop-ONLY nodes stay in the output with
    * their own label. Scale shape: one symmetrize shuffle up front,
    * then per round one edge×label join + one (src, label) sum + one
    * per-src window argmax — all keyed, nothing corpus-crossed;
    * `localCheckpoint` truncates lineage per round.
    *
    * Returns `(node, label)`.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       wCol: String, iters: Int = 5): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val raw = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(wCol).as("w"))
    val sym = graft.Caches.persist(
      raw.unionByName(raw.select(col("dst").as("src"),
          col("src").as("dst"), col("w")))
        .groupBy("src", "dst").agg(sum(col("w")).as("w"))
        .filter(col("src") =!= col("dst") && col("w") > 0))
    // node set from the INPUT endpoints: a self-loop-only node has no
    // symmetrized neighbors but still belongs to the output
    val nodes = graft.Caches.persist(
      raw.select(col("src").as("node"))
        .unionByName(raw.select(col("dst").as("node"))).distinct())
    var labels = nodes.select(col("node"), col("node").as("label"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val votes = sym
        .join(labels.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src"), col("label"))
        .agg(sum(col("w")).as("vw"))
      val best = votes
        .withColumn("rn", row_number().over(Window.partitionBy("src")
          .orderBy(col("vw").desc, col("label").asc)))
        .filter(col("rn") === 1)
        .select(col("src").as("node"), col("label").as("_new"))
      labels = labels.join(best, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("_new"), col("label")).as("label"))
        .localCheckpoint(true)
    }
    labels
  }
}
