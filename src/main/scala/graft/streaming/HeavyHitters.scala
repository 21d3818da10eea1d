package graft.streaming

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.functions.MarketFunctions.md5Hash60

/** Streaming Count-Min heavy hitters — the crawl-monitor companion of
  * the batch sketch (`Aggregates.countMinTopK`, t19): what are the
  * top-k items in an unbounded stream, without ever holding exact
  * global counts?
  *
  * Two mergeable structures ride ONE `flatMapGroupsWithState` operator
  * keyed by item shard (`md5(item) % shards` — an item's every
  * occurrence lands on one shard, so shard state composes):
  *
  *  - '''candidates''': a bounded space-saving map per shard (capacity
  *    `cap`), folded deterministically (batch items in ascending order,
  *    min-eviction ties broken by item). The union of shard candidate
  *    sets is the per-partition-heap selection the batch sketch lacked:
  *    any item with true count > shardTotal/cap is guaranteed present
  *    (the Misra–Gries bound), and no exact global count table is ever
  *    built.
  *  - '''grid deltas''': each batch's d×w Count-Min cell increments,
  *    emitted as rows. The sink is a mergeable log — cell count =
  *    SUM over emitted deltas, across shards, batches, and restarts —
  *    so the reader reconstructs the one global grid the estimates
  *    need. State stays O(cap) per shard; the grid itself needs NO
  *    state at all because addition commutes.
  *
  * The final answer ([[topK]]) ranks the candidate union by the
  * grid's min-over-rows estimate — overestimates only, never
  * undercounts — with (estimate desc, item) determinism. With
  * `AvailableNow` single-batch replay and no eviction this is
  * bit-equal to ranking exact counts by the same sketch (the st4
  * oracle); the eviction path is spec'd separately on crafted data.
  */
object HeavyHitters {

  /** JVM twin of `MarketFunctions.md5Hash60` (first 15 hex digits of
    * md5 = top 60 bits): the stream-side cell hash must equal the
    * column expression the batch reader and the oracle use.
    */
  private[graft] def h60(s: String): Long = {
    val bytes = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (bytes(i) & 0xffL); i += 1 }
    h >>> 4
  }

  private[graft] def cellOf(i: Int, item: String, w: Int): Long =
    h60(s"cms$i#$item") % w

  /** Deterministic weighted space-saving fold: existing items
    * accumulate; new items fill free slots; at capacity the minimum
    * entry (ties by item) is replaced and the newcomer inherits its
    * count + n (the classic overestimate — a candidate's count is
    * never below its true count). Batch entries are folded in
    * ascending item order, so the result depends only on the batch
    * SEQUENCE, not on partitioning or iterator order. Also returns the
    * number of evictions this batch performed: once a shard has ever
    * evicted, its candidate counts are upper bounds rather than exact,
    * so downstream exactness claims (the st4 oracle's bit-equality)
    * need the zero-eviction precondition to be CHECKABLE, not assumed.
    */
  private[graft] def ssFold(counts: Map[String, Long],
                                batch: Seq[(String, Long)],
                                cap: Int): (Map[String, Long], Long) =
    batch.sortBy(_._1).foldLeft((counts, 0L)) {
      case ((m, ev), (item, n)) =>
        if (m.contains(item)) (m.updated(item, m(item) + n), ev)
        else if (m.size < cap) (m.updated(item, n), ev)
        else {
          val (minItem, minCount) =
            m.minBy { case (it, c) => (c, it) }
          ((m - minItem).updated(item, minCount + n), ev + 1)
        }
    }

  case class HHIn(item: String, shard: Int)
  case class HHState(counts: Map[String, Long], seq: Long)
  case class HHEmit(shard: Int, kind: String, item: String, i: Int,
                    cell: Long, n: Long, seq: Long)

  val itemSchema: StructType =
    StructType(Seq(StructField("item", StringType)))

  /** The stateful operator: items in, (grid-delta ∪ candidate-snapshot)
    * rows out. Candidate snapshots carry a per-shard sequence number —
    * the reader keeps each shard's latest; grid deltas are summed.
    */
  def heavyHitterRows(incoming: DataFrame, shards: Int, cap: Int,
                      d: Int, w: Int): DataFrame = {
    val spark = incoming.sparkSession
    import spark.implicits._
    incoming
      .select(col("item"),
        (md5Hash60(concat(lit("hh#"), col("item"))) % shards)
          .cast("int").as("shard"))
      .where(col("item").isNotNull)
      .as[HHIn]
      .groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout)(
        (shard: Int, rows: Iterator[HHIn], state: GroupState[HHState]) => {
          var batch = Map.empty[String, Long]
          rows.foreach { r =>
            batch = batch.updated(r.item, batch.getOrElse(r.item, 0L) + 1L)
          }
          val prev = state.getOption.getOrElse(HHState(Map.empty, 0L))
          val (counts, evictions) = ssFold(prev.counts, batch.toSeq, cap)
          val seq = prev.seq + 1
          state.update(HHState(counts, seq))
          val cellRows = batch.toSeq
            .flatMap { case (item, n) =>
              (0 until d).map(i => ((i, cellOf(i, item, w)), n))
            }
            .groupBy(_._1).toSeq
            .map { case ((i, cell), xs) =>
              HHEmit(shard, "cell", "", i, cell, xs.map(_._2).sum, seq)
            }
          val candRows = counts.toSeq.sortBy(_._1)
            .map { case (item, n) =>
              HHEmit(shard, "cand", item, -1, -1L, n, seq)
            }
          // per-batch eviction count: a mergeable diagnostic row (sum
          // over the log = lifetime evictions). topK ignores the kind;
          // readers that claim exactness assert the sum is zero
          val evictRow = HHEmit(shard, "evict", "", -1, -1L, evictions, seq)
          (cellRows ++ candRows ++ Seq(evictRow)).iterator
        })
      .toDF()
  }

  /** Micro-batch file-source pipeline: landing dir (rows with an
    * `item` string column) → sketch rows → parquet sink (the mergeable
    * log [[topK]] reads).
    */
  def start(spark: SparkSession, landingDir: String, sinkDir: String,
            checkpointDir: String, shards: Int = 8, cap: Int = 64,
            d: Int = 4, w: Int = 1024,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    heavyHitterRows(
        graft.sources.Adaptive.streamSession(spark, landingDir)
          .readStream.schema(itemSchema).parquet(landingDir),
        shards, cap, d, w)
      .writeStream
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .start()

  /** Lifetime space-saving evictions recorded in the sink log (sum of
    * per-batch `evict` rows). Zero ⇔ every shard's candidate counts
    * are exact — the precondition under which [[topK]]'s `ss_count`
    * equals the true count (what st4's oracle bit-equality relies on).
    */
  def evictionCount(sinkRows: DataFrame): Long =
    sinkRows.filter(col("kind") === "evict")
      .agg(coalesce(sum(col("n")), lit(0L))).collect()(0).getLong(0)

  /** Batch read-back: reconstruct the global grid (sum of deltas),
    * take each shard's LATEST candidate snapshot, estimate every
    * candidate via min-over-rows, return the top `k` by (estimate
    * desc, item). `ss_count` is the shard-local space-saving count —
    * exact while the shard never evicted, an upper bound afterwards.
    */
  def topK(sinkRows: DataFrame, k: Int, d: Int = 4, w: Int = 1024)
      : DataFrame = {
    val cells = sinkRows.filter(col("kind") === "cell")
      .groupBy("i", "cell").agg(sum(col("n")).as("c"))
    val latest = sinkRows.filter(col("kind") === "cand")
      .withColumn("_mx",
        max(col("seq")).over(Window.partitionBy(col("shard"))))
      .filter(col("seq") === col("_mx"))
    val cand = latest
      .select(col("item"), col("n").as("ss_count"),
        explode(sequence(lit(0), lit(d - 1))).as("i"))
      .withColumn("cell",
        md5Hash60(concat(lit("cms"), col("i").cast("string"), lit("#"),
          col("item"))) % w)
    cand.join(cells, Seq("i", "cell"))
      .groupBy("item", "ss_count").agg(min(col("c")).as("cms_est"))
      .orderBy(col("cms_est").desc, col("item").asc)
      .limit(k)
  }
}
