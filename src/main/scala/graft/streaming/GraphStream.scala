package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.Graph

/** Streaming link-graph rank maintenance — the delta-refresh path for
  * [[graft.operators.Graph.pageRank]]: edge deltas land as a stream,
  * every micro-batch appends its delta to a persisted edge log and
  * refreshes the ranks by WARM-STARTED power iteration from the
  * previous batch's committed ranks. After a small delta the previous
  * fixed point is near the new one, so the refresh needs a few
  * iterations, not the cold-start count — that asymmetry is the whole
  * point of maintaining ranks incrementally instead of re-running the
  * batch job per crawl increment.
  *
  * State layout under `stateDir` (all driver-free, executor-written):
  *  - `edges/` — append-only parquet log of raw edge deltas; the
  *    rank refresh re-aggregates by (src, dst) on read, so appending
  *    a delta IS the merge (sum-of-weights is associative).
  *  - `ranks/batch=<id>/` — one ranks snapshot per micro-batch;
  *    readers take the highest committed id. Re-running a batch id
  *    (foreachBatch's at-least-once replay) overwrites its own
  *    directory — idempotent, and the edge log append is guarded by
  *    the same id fence.
  *
  * GraphSpec proves: a replayed delta stream's final ranks equal the
  * batch engine's ranks on the full edge list (cold equality is
  * bit-exact; warm-started stabilization lands within floor-noise
  * tolerance of the batch fixed point in fewer iterations).
  */
object GraphStream {

  val edgeSchema: StructType = StructType(Seq(
    StructField("src", StringType),
    StructField("dst", StringType),
    StructField("w", LongType)))

  private def rankBatches(spark: SparkSession, stateDir: String): Seq[Long] =
    Option(new java.io.File(s"$stateDir/ranks").listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .map(_.getName.stripPrefix("batch=").toLong).sorted.toSeq

  /** The latest committed ranks snapshot, if any batch has run. */
  def latestRanks(spark: SparkSession, stateDir: String)
      : Option[DataFrame] =
    rankBatches(spark, stateDir).lastOption.map { id =>
      spark.read.parquet(s"$stateDir/ranks/batch=$id")
    }

  /** Accumulated edge deltas, aggregated to one weight per (src, dst). */
  def edgeState(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/edges")
      .groupBy("src", "dst").agg(sum("w").as("w"))

  /** Fold one edge-delta batch into the state and refresh the ranks —
    * also the foreachBatch body. Idempotent per `batchId`: a replayed
    * id neither re-appends its delta nor produces a second snapshot.
    * `seeds` switches the refresh to TrustRank (seed-restricted
    * teleport) with the same warm-start discipline.
    */
  def refresh(spark: SparkSession, stateDir: String, delta: DataFrame,
              batchId: Long, refreshIters: Int,
              seeds: Seq[String] = Nil): Unit = {
    val done = rankBatches(spark, stateDir)
    if (done.contains(batchId)) return // at-least-once replay: fenced
    delta.write.mode(SaveMode.Append).parquet(s"$stateDir/edges")
    val warm = latestRanks(spark, stateDir)
    val edges = edgeState(spark, stateDir)
    val ranks = (warm, seeds) match {
      case (Some(prev), Nil) =>
        Graph.pageRankWarm(edges, "src", "dst", "w", prev, refreshIters)
      case (None, Nil) =>
        Graph.pageRank(edges, "src", "dst", "w", refreshIters)
      case (Some(prev), ss) =>
        Graph.trustRankWarm(edges, "src", "dst", "w", ss, prev,
          refreshIters)
      case (None, ss) =>
        Graph.trustRank(edges, "src", "dst", "w", ss, refreshIters)
    }
    // snapshot write is per-batch-id overwrite: a crash mid-write is
    // healed by the replay rewriting the same directory. Hash-keyed
    // on node (NOT coalesce(1)): the snapshot grows with the graph,
    // so it must fan out across tasks at web-graph node counts — the
    // warm-start read joins on node next batch, so a node-hashed
    // layout is also the co-location that join wants.
    ranks.repartition(col("node")).write.mode(SaveMode.Overwrite)
      .parquet(s"$stateDir/ranks/batch=$batchId")
  }

  /** Compact the append-only edge log: fold all delta files into one
    * pre-aggregated (src, dst, w) dir. Reads re-aggregate on the fly
    * either way (sum-of-weights is associative), so compaction changes
    * no answer — it bounds file count and re-aggregation work after
    * many small deltas, the same nightly discipline AtomicTable.compact
    * applies to tables. Staged-then-swap: the compacted log lands in a
    * temp dir first and replaces `edges/` only after a successful
    * write, so a crash mid-compaction leaves the original log intact.
    */
  def compactEdges(spark: SparkSession, stateDir: String): Unit = {
    val edges = s"$stateDir/edges"
    val staging = s"$stateDir/.edges_staging"
    edgeState(spark, stateDir)
      .coalesce(math.max(1, spark.sparkContext.defaultParallelism / 2))
      .write.mode(SaveMode.Overwrite).parquet(staging)
    val old = new java.io.File(edges)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rm)
      f.delete()
    }
    rm(old)
    if (!new java.io.File(staging).renameTo(old))
      sys.error(s"compactEdges: rename $staging -> $edges failed")
  }

  /** Micro-batch pipeline: landing dir of edge-delta parquet files →
    * edge log + warm-started rank refresh per batch.
    */
  def start(spark: SparkSession, landingDir: String, stateDir: String,
            checkpointDir: String, refreshIters: Int = 4,
            seeds: Seq[String] = Nil,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream.schema(edgeSchema).parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: DataFrame, id: Long) =>
        refresh(spark, stateDir, df, id, refreshIters, seeds)
      }
      .trigger(trigger)
      .start()
}
