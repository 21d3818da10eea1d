package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StreamingQuery, Trigger}

import graft.functions.MarketFunctions.md5Hash60

/** Streaming HyperLogLog distinct counting — the crawl monitor's
  * "how many unique urls/words/users so far" beside the Count-Min
  * top-k ([[HeavyHitters]]): an unbounded stream summarized in
  * `m = 2^p` registers that only ever grow.
  *
  * The register derivation is IDENTICAL to the batch sketch
  * (`Aggregates.approxCountDistinctHll`, a14): salted 60-bit md5, low
  * `p` bits pick the register, leading-zero rank of the rest updates
  * it via max. Because a register is monotone non-decreasing, the
  * operator needs only delta emission: `flatMapGroupsWithState` keyed
  * by register shard keeps each shard's register slice as state
  * (bounded at `m/shards` ints — state size is the SKETCH size, never
  * the stream size) and emits a row only when a register RISES. The
  * sink is a mergeable log — register value = MAX over emitted rows —
  * so reconstruction commutes across batches, shards, and restarts,
  * and a replayed batch re-emits at-most-equal values that the max
  * absorbs (exactly-once not required).
  *
  * [[estimate]] folds the reconstructed table through the SAME
  * driver-side estimator as the batch sketch, so a single-pass
  * `AvailableNow` replay is bit-equal to a14's answer on the same
  * items — the st5 oracle's claim.
  */
object HllStream {

  case class HllIn(shard: Int, idx: Int, rho: Int)
  case class HllState(regs: Map[Int, Int])
  case class HllEmit(shard: Int, idx: Int, rho: Int)

  /** items (`item` string column) → rising-register delta rows. */
  def hllRows(incoming: DataFrame, shards: Int, p: Int = 8): DataFrame = {
    val spark = incoming.sparkSession
    import spark.implicits._
    val m = 1 << p
    val wBits = 60 - p
    val h = md5Hash60(col("item").cast("string"))
    incoming
      .where(col("item").isNotNull)
      .select(h.bitwiseAND(lit((m - 1).toLong)).cast("int").as("idx"),
        shiftrightunsigned(h, p).as("w"))
      .withColumn("rho",
        when(col("w") === 0, lit(wBits + 1))
          .otherwise(lit(wBits + 1) - length(bin(col("w"))))
          .cast("int"))
      .select(pmod(col("idx"), lit(shards)).cast("int").as("shard"),
        col("idx"), col("rho"))
      .as[HllIn]
      .groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout)(
        (shard: Int, rows: Iterator[HllIn], state: GroupState[HllState]) => {
          var batchMax = Map.empty[Int, Int]
          rows.foreach { r =>
            if (r.rho > batchMax.getOrElse(r.idx, 0))
              batchMax = batchMax.updated(r.idx, r.rho)
          }
          val prev = state.getOption.getOrElse(HllState(Map.empty))
          val risen = batchMax.filter { case (i, rho) =>
            rho > prev.regs.getOrElse(i, 0)
          }
          if (risen.nonEmpty) state.update(HllState(prev.regs ++ risen))
          risen.toSeq.sortBy(_._1)
            .map { case (i, rho) => HllEmit(shard, i, rho) }.iterator
        })
      .toDF()
  }

  /** Micro-batch file-source pipeline: landing dir (rows with an
    * `item` string column) → register-delta rows → parquet sink.
    */
  def start(spark: SparkSession, landingDir: String, sinkDir: String,
            checkpointDir: String, shards: Int = 8, p: Int = 8,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    hllRows(
        graft.sources.Adaptive.streamSession(spark, landingDir)
          .readStream.schema(HeavyHitters.itemSchema)
          .parquet(landingDir),
        shards, p)
      .writeStream
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .start()

  /** Batch read-back: registers = MAX over the delta log, estimate =
    * the shared batch-sketch fold (`Aggregates.hllEstimate`).
    */
  def estimate(sinkRows: DataFrame, p: Int = 8): DataFrame = {
    val spark = sinkRows.sparkSession
    import spark.implicits._
    val regs = sinkRows.groupBy("idx").agg(max(col("rho")).as("rho"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    Seq(graft.operators.Aggregates.hllEstimate(regs, p)).toDF("est")
  }
}
