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

  private def rankImpl(edges: DataFrame, srcCol: String, dstCol: String,
                       wCol: String, iters: Int, total: Long,
                       seeds: Option[Seq[String]]): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val agg = edges.groupBy(col(srcCol).as("src"), col(dstCol).as("dst"))
      .agg(sum(col(wCol)).as("w"))
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
    val c0 = (total * 15L / 100L) / nT
    var ranks = nodes
      .withColumn("rank",
        when(isTeleport, lit(total / nT)).otherwise(lit(0L)))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val contrib = el.join(ranks.withColumnRenamed("node", "src"), "src")
        .withColumn("c", expr("rank * w div wout"))
        .groupBy(col("dst").as("node")).agg(sum(col("c")).as("contrib"))
      val dangling = ranks.join(srcs, Seq("node"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0L)).as("d"))
      val next = nodes
        .join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        // `div` (integer floor division) via expr: Column `/` would be
        // double division and break the fixed-point bit contract
        .withColumn("_prop", coalesce(col("contrib"), lit(0L)) +
          when(isTeleport, expr(s"d div $nT")).otherwise(lit(0L)))
        .select(col("node"),
          (when(isTeleport, lit(c0)).otherwise(lit(0L)) +
            expr("(_prop * 85) div 100")).as("rank"))
      // eager checkpoint EVERY round, deliberately: `next` reads
      // `ranks` twice (contrib join + dangling aggregate), so an
      // unmaterialized predecessor doubles the recompute tree per
      // round — measured 2× slower when checkpointing every 3rd
      ranks = next.localCheckpoint(true)
    }
    ranks.withColumnRenamed("rank", "rank_pico")
  }
}
