package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.Quality
import graft.sources.{AtomicTable, DocTable}

/** Expectation-gated ingest with a QUARANTINE table: every micro-batch
  * splits at the rule gate, clean rows land in the corpus, and the
  * rejects land — WITH their per-row `violations` tags — in a sibling
  * manifest table instead of vanishing.
  *
  * A drop-only gate (the curated-commit stream's shape) is fine for
  * throwaway filtering, but at 100 TB the rejects are operational
  * data: they are the evidence that decides whether a spike in
  * `short_text` means a broken upstream parser or a genuinely bad
  * crawl slice, and after the rule or the parser is fixed they
  * RE-INGEST from the quarantine table without re-crawling. Tags are
  * deterministic (declared rule order, null predicate = fail), so the
  * quarantine is replayable evidence, not a log line.
  *
  * Exactly-once composes the same way as [[ViewStream]]: each table's
  * append is fenced by its own `("qingest", batchId)` txn mark. A
  * crash between the two legs replays into "corpus skips, quarantine
  * commits its missing half"; a full re-delivery under a fresh
  * checkpoint advances neither (StreamingSpec proves both).
  */
object QuarantineStream {

  /** The txn-mark stream name fencing both tables' appends. */
  val IngestStream = "qingest"

  def corpusTable(spark: SparkSession, root: String): AtomicTable =
    DocTable(spark, root)

  def quarantineTable(spark: SparkSession, root: String): AtomicTable =
    DocTable(spark, root)

  /** Gate one micro-batch — the foreachBatch body, callable directly
    * for batch-parity tests.
    */
  def commitBatch(spark: SparkSession, corpusRoot: String,
                  quarRoot: String, rules: Seq[(String, Column)],
                  batch: DataFrame, batchId: Long): Unit = {
    val (pass, fail) = Quality.quarantineSplit(batch, rules)
    corpusTable(spark, corpusRoot)
      .append(pass, txn = Some((IngestStream, batchId)))
    quarantineTable(spark, quarRoot)
      .append(fail, txn = Some((IngestStream, batchId)))
  }

  /** Re-ingest after a rule fix: re-gate the quarantined rows under
    * the CURRENT rule set, move the now-passing rows into the corpus,
    * and rewrite the quarantine to keep only the still-failing rows
    * (with their tags refreshed — the old tags described the old
    * rules). This is why the quarantine exists: a relaxed rule or a
    * repaired upstream parser recovers the held-back data WITHOUT
    * re-crawling.
    *
    * Both legs carry the same `("requarantine", quarantine-version)`
    * fence: a crash between the corpus append and the quarantine
    * rewrite replays into "corpus skips, quarantine completes its
    * half" — never a duplicate, never a lost row. The rewrite is a
    * dynamic partition overwrite of only the partitions holding
    * recovered rows; an untouched quarantine partition is never read.
    * Returns the number of recovered rows.
    */
  def reingest(spark: SparkSession, corpusRoot: String, quarRoot: String,
               rules: Seq[(String, Column)]): Long = {
    val quar = quarantineTable(spark, quarRoot)
    if (!quar.hasData) return 0L
    val fence = Some(("requarantine", quar.version))
    val held = quar.read().drop("violations")
    val (pass, fail) = Quality.quarantineSplit(held, rules)
    val passP = pass.persist()
    try {
      val recovered = passP.count()
      if (recovered == 0L) return 0L
      val touched = passP.select(col("source").cast("string"))
        .distinct().collect().map(_.getString(0)).toSeq
      corpusTable(spark, corpusRoot).append(passP, txn = fence)
      quar.overwritePartitions(touched,
        fail.filter(col("source").isin(touched: _*)), txn = fence)
      recovered
    } finally passP.unpersist(blocking = false)
  }

  /** [[reingest]] as a TRIGGERED MAINTENANCE STREAM: each tick file
    * landing in `tickDir` re-gates the quarantine under the CURRENT
    * rule set, so held rows recover continuously as rules relax —
    * no operator remembering to run the batch job. A tick is a
    * one-row parquet drop (`tick: long`; content ignored) — the same
    * file-landing shape every triggered stream here uses, written by
    * a cron or by the config pipeline that just relaxed a rule.
    *
    * Exactly-once deliberately does NOT hang on the stream's batchId:
    * the recovery is a function of (quarantine state, rules), so the
    * fence is [[reingest]]'s own ("requarantine", quarantine-version)
    * mark. A restart under a FRESH checkpoint re-delivers every tick,
    * and the fence still recovers nothing twice — the replayed pass
    * re-gates the already-rewritten quarantine and, finding no newly
    * passing rows, commits neither table (StreamingSpec proves it).
    * A crash between the corpus append and the quarantine rewrite
    * heals on the next tick exactly as in the batch path.
    */
  def startReingest(spark: SparkSession, tickDir: String,
                    corpusRoot: String, quarRoot: String,
                    rules: Seq[(String, Column)], checkpointDir: String,
                    trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery = {
    import org.apache.spark.sql.types.{LongType, StructField}
    spark.readStream
      .schema(StructType(Seq(StructField("tick", LongType))))
      .parquet(tickDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (_: DataFrame, _: Long) =>
        reingest(spark, corpusRoot, quarRoot, rules); ()
      }
      .trigger(trigger)
      .start()
  }

  /** Micro-batch pipeline: landing dir → gate → corpus + quarantine,
    * each leg fenced.
    */
  def start(spark: SparkSession, landingDir: String, schema: StructType,
            corpusRoot: String, quarRoot: String,
            rules: Seq[(String, Column)], checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream.schema(schema).parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: DataFrame, id: Long) =>
        commitBatch(spark, corpusRoot, quarRoot, rules, df, id)
      }
      .trigger(trigger)
      .start()
}
