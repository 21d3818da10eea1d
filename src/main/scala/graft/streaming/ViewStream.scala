package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.sources.{AtomicTable, MaterializedAgg}

/** Streaming maintenance of an incrementally-folded materialized
  * aggregate: every micro-batch lands in the base corpus AND folds
  * into the view inside the same `foreachBatch`, each leg fenced by
  * its own manifest txn mark.
  *
  * The exactly-once story composes from the two fences rather than
  * needing a new mechanism:
  *
  *  - the base append commits with the `("mvingest", batchId)` mark —
  *    an at-least-once replay of the same micro-batch is a clean skip;
  *  - [[MaterializedAgg.refresh]] commits the partials with the base
  *    VERSION it folded up to — a crash between the append and the
  *    refresh replays into "append skips, refresh folds the missing
  *    delta", and a crash after both replays into two skips.
  *
  * Either way the view never double-counts a row, which
  * [[graft.StreamingSpec]] proves by re-delivering the whole landing
  * directory under a fresh checkpoint (batch ids restart at zero, both
  * fences hold, the serve is unchanged). At 100 TB this is the
  * dashboard view riding the ingest stream: one delta-sized shuffle
  * per micro-batch, never a corpus rescan, with the base's op history
  * still forcing a full recompute if an out-of-band mutation
  * (backfill upsert, GDPR delete) reassigns history.
  */
object ViewStream {

  /** The txn-mark stream name fencing the base-corpus appends. */
  val IngestStream = "mvingest"

  /** The base corpus under maintenance, partitioned like the batch
    * documents corpus (by `source`, keyed by `doc_id`).
    */
  def baseTable(spark: SparkSession, baseRoot: String): AtomicTable =
    graft.sources.DocTable(spark, baseRoot)

  /** The maintained view over `dims` / `valCol` for that base. */
  def view(spark: SparkSession, baseRoot: String, viewRoot: String,
           dims: Seq[String], valCol: String): MaterializedAgg =
    MaterializedAgg(baseTable(spark, baseRoot), viewRoot, dims, valCol)

  /** Land one micro-batch and fold the view forward — the foreachBatch
    * body, callable directly for batch-parity tests.
    */
  def commitBatch(spark: SparkSession, baseRoot: String, viewRoot: String,
                  dims: Seq[String], valCol: String,
                  batch: DataFrame, batchId: Long): Unit = {
    baseTable(spark, baseRoot)
      .append(batch, txn = Some((IngestStream, batchId)))
    view(spark, baseRoot, viewRoot, dims, valCol).refresh()
    ()
  }

  /** Micro-batch pipeline: landing dir of parquet rows (any schema
    * carrying `source`, `doc_id`, the dims, and `valCol`) → base
    * corpus append + view refresh, both fenced.
    */
  def start(spark: SparkSession, landingDir: String, schema: StructType,
            baseRoot: String, viewRoot: String,
            dims: Seq[String], valCol: String, checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream.schema(schema).parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: DataFrame, id: Long) =>
        commitBatch(spark, baseRoot, viewRoot, dims, valCol, df, id)
      }
      .trigger(trigger)
      .start()
}
