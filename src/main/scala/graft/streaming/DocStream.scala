package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.pipelines.TextAnalysis

/** A landed document with its registered domain, as consumed by
  * [[DocStream.capPerDomainStream]].
  */
final case class DomainDoc(doc_id: Long, lang: String, source: String,
                           ts: java.sql.Timestamp, domain: String)

/** Streaming CONTENT dedup for a document landing zone — the streaming
  * twin of [[graft.pipelines.Dedup.incrementalDedup]]'s exact stage: a
  * crawl drops files into a directory, every micro-batch fingerprints
  * the text (lowercased, whitespace-collapsed — same key as the batch
  * dedup and its DuckDB oracle) and `dropDuplicates` keeps the first
  * document per (lang, source, fingerprint) stratum, with the watermark
  * bounding dedup state. Stratifying by (lang, source) keeps the output
  * deterministic when the same text lands under different metadata (the
  * survivor's stratum is then fixed) — cross-stratum near-dup collapse
  * stays a batch job ([[graft.pipelines.Dedup.connectedComponents]]).
  */
object DocStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("ts", TimestampType)))

  /** Watermarked content-dedup transform, shared by batch parity tests
    * and the live stream. `dropDuplicatesWithinWatermark` — NOT plain
    * `dropDuplicates` — because the event-time column is not part of the
    * content key: the plain form would never evict per-key state (it
    * only cleans state for keys that include the watermarked column), so
    * a long-running ingest would grow the state store without bound.
    * The within-watermark form evicts each fingerprint once it falls
    * behind the watermark; a duplicate arriving later than the watermark
    * delay is re-admitted (at that point it is the batch layer's job —
    * [[graft.pipelines.Dedup.incrementalDedup]]).
    */
  def dedupeByContent(incoming: DataFrame,
                      watermark: String = "1 hour"): DataFrame =
    incoming
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(Seq("lang", "source", "fp"))

  /** The accreting corpus of an incremental-dedup stream as an
    * [[graft.sources.AtomicTable]] documents table under
    * `stateDir/corpus` — the caller seeds it (`init` with the base
    * corpus) before the stream starts; every committed micro-batch's
    * survivors join it by manifest commit. The stream name for the
    * exactly-once txn marks is `"incdedup"`.
    */
  def dedupTable(spark: SparkSession, stateDir: String,
                 failpoint: String => Unit = _ => ())
      : graft.sources.AtomicTable =
    graft.sources.DocTable(spark, s"$stateDir/corpus", failpoint)

  /** Seed the accreting corpus: the base rows commit WITH their stored
    * dedup keys ([[graft.pipelines.Dedup.withDedupKeys]]), so the very
    * first micro-batch — and every one after — hashes only its own
    * text. The base text is hashed exactly once, here.
    */
  def seedDedup(spark: SparkSession, stateDir: String,
                corpus: DataFrame): Unit =
    dedupTable(spark, stateDir)
      .init(graft.pipelines.Dedup.withDedupKeys(corpus, "text"))

  /** The corpus an incremental-dedup stream has accreted so far: the
    * seeded base plus every committed batch's survivors, resolved from
    * the table's current manifest.
    */
  def dedupState(spark: SparkSession, stateDir: String): DataFrame =
    dedupTable(spark, stateDir).read()

  /** Fold one micro-batch through
    * [[graft.pipelines.Dedup.incrementalDedup]] against the accreted
    * corpus — the NEAR-dup streaming layer above [[dedupeByContent]]'s
    * exact fingerprints: a batch doc drops on an exact fingerprint
    * already seen OR on a shared MinHash band bucket with ANY corpus
    * doc (base or an earlier batch's survivor); survivors join the
    * corpus for the next batch, through ONE manifest commit that also
    * records the `("incdedup", batchId)` high-water mark — the same
    * exactly-once fence [[startCuratedCommit]] uses, replacing the old
    * shard-overwrite + marker-file discipline: a foreachBatch replay
    * is a clean skip (data and mark committed atomically), a crash
    * before the publish leaves fully-old state the replay recomputes
    * against unchanged, the survivors history time-travels with the
    * manifests, and a concurrent writer turns into a clean OCC error
    * instead of corrupt state.
    */
  def incrementalRefresh(spark: SparkSession, stateDir: String,
                         batch: DataFrame, batchId: Long): Unit = {
    val table = dedupTable(spark, stateDir)
    // fast replay exit (append would also skip on the mark, but only
    // after paying the dedup computation)
    if (table.lastCommittedBatch("incdedup").exists(batchId <= _)) return
    val corpus = table.read()
    // survivors are unique by construction (deduped against the corpus
    // AND in-batch), so the commit is a blind append — no per-batch
    // key anti-join re-scan of the accreted table. The corpus stores
    // its _fp/_sig keys ([[seedDedup]]; survivors carry theirs), so
    // only the BATCH text is hashed: the corpus side is two pruned
    // key-column scans, and the per-batch cost stays flat as the
    // corpus accretes
    table.append(
      graft.pipelines.Dedup
        .incrementalDedupKeyed(corpus, batch, "doc_id", "text"),
      txn = Some(("incdedup", batchId)))
  }

  /** Micro-batch pipeline: landing dir of document parquet →
    * incremental exact+near-dup against the accreting corpus state.
    */
  def startIncremental(spark: SparkSession, landingDir: String,
                       stateDir: String, checkpointDir: String,
                       trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery =
    spark.readStream.schema(docSchema).parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: DataFrame, id: Long) =>
        incrementalRefresh(spark, stateDir, df, id)
      }
      .trigger(trigger)
      .start()

  /** Micro-batch file-source pipeline: landing dir → content dedup →
    * parquet table. Pass `Trigger.AvailableNow()` + a very wide
    * watermark for an exact historical replay (state never evicted ≡
    * batch DISTINCT).
    */
  def start(spark: SparkSession, landingDir: String, tableDir: String,
            checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime("15 seconds"),
            watermark: String = "1 hour"): StreamingQuery =
    dedupeByContent(
        graft.sources.Adaptive.streamSession(spark, landingDir)
          .readStream.schema(docSchema).parquet(landingDir), watermark)
      .writeStream
      .format("parquet")
      .option("path", tableDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Curated streaming ingest: content dedup composed with the
    * stateless Gopher quality gate — duplicates are dropped by keyed
    * state, then each survivor is gated scan-side (`keep`) before it
    * reaches the table. The gate adds NO state: it is the same one-scan
    * projection as the batch [[TextAnalysis.qualityRules]], so the
    * composition's only stateful piece remains the dedup. Rule columns
    * are retained in the output for audit (WHICH rule dropped a doc).
    */
  def curate(incoming: DataFrame, watermark: String = "1 hour",
             minWords: Int = 50, minStopHits: Int = 2): DataFrame =
    TextAnalysis.qualityRules(
        dedupeByContent(incoming, watermark), col("text"),
        minWords = minWords, minStopHits = minStopHits)
      .filter(col("keep"))

  /** Exactly-once curated commit into an [[graft.sources.AtomicTable]]
    * documents corpus ([[graft.sources.DocTable]]): every micro-batch
    * of the curated stream lands through `foreachBatch` as ONE manifest
    * commit that also records the (stream, batchId) high-water mark.
    * The failure this closes: `foreachBatch` is at-least-once — a crash
    * after the sink write but before the checkpoint advances makes
    * Spark re-deliver the batch on restart. A plain parquet sink would
    * duplicate those rows; here the replayed batch id is at or below
    * the mark recorded WITH the data, so the table skips it — the
    * commit is exactly-once because mark and data share one atomic
    * manifest publish. StreamingSpec proves the fence across a
    * restart; the table must be initialized (one seed commit) before
    * the stream starts.
    */
  def startCuratedCommit(spark: SparkSession, landingDir: String,
                         table: graft.sources.AtomicTable,
                         checkpointDir: String,
                         stream: String = "curate",
                         trigger: Trigger = Trigger.AvailableNow(),
                         watermark: String = "1 hour",
                         minWords: Int = 50,
                         minStopHits: Int = 2): StreamingQuery =
    curate(graft.sources.Adaptive.streamSession(spark, landingDir)
          .readStream.schema(docSchema).parquet(landingDir),
        watermark, minWords, minStopHits)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: DataFrame, id: Long) =>
        table.insertIgnore(df, txn = Some((stream, id)))
        ()
      }
      .trigger(trigger)
      .start()

  val domainDocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("ts", TimestampType),
    StructField("domain", StringType)))

  /** Streaming per-domain document cap — the incremental twin of
    * [[graft.pipelines.Web.capPerDomain]]: each domain's ADMITTED count
    * lives in `flatMapGroupsWithState` keyed state, so the cap holds
    * across micro-batches and restarts (the count rides the checkpoint)
    * without ever re-scanning the corpus. Within a micro-batch a
    * domain's arrivals are admitted in `doc_id` order, which makes a
    * single-batch `AvailableNow` replay bit-equal to the batch cap
    * ordered by `doc_id` (the parity StreamingSpec proves it, including
    * across a stop/restart).
    *
    * State is ONE long per domain and must never expire — the cap is a
    * corpus-lifetime budget, not a window (`NoTimeout` is the point,
    * not a leak: state size is |domains|, not |docs|).
    */
  def capPerDomainStream(incoming: DataFrame, maxDocs: Int): DataFrame = {
    val spark = incoming.sparkSession
    import spark.implicits._
    incoming
      .select(col("doc_id"), col("lang"), col("source"), col("ts"),
        col("domain"))
      .as[DomainDoc]
      .groupByKey(_.domain)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout)(
        (_: String, docs: Iterator[DomainDoc], state: GroupState[Long]) => {
          val admitted = state.getOption.getOrElse(0L)
          val room = math.max(0L, maxDocs - admitted).toInt
          if (room == 0) Iterator.empty
          else {
            // bounded selection: keep the `room` lowest doc_ids via a
            // size-capped max-heap instead of materializing + sorting
            // the whole group — a mega-domain's micro-batch costs
            // O(room) memory, not O(batch)
            val heap = new scala.collection.mutable.PriorityQueue[
              DomainDoc]()(Ordering.by(_.doc_id))
            docs.foreach { d =>
              if (heap.size < room) heap.enqueue(d)
              else if (d.doc_id < heap.head.doc_id) {
                heap.dequeue(); heap.enqueue(d)
              }
            }
            val take = heap.toArray.sortBy(_.doc_id)
            state.update(admitted + take.length)
            take.iterator
          }
        })
      .toDF()
  }

  /** Micro-batch file-source pipeline: landing dir (docs with a
    * precomputed `domain` column) → per-domain cap → parquet table.
    *
    * Bit-equality with the batch `capPerDomain` (the st3 oracle and
    * the parity spec) additionally requires that each landed fileset
    * arrives as ONE micro-batch: admission is lowest-doc_id-first
    * WITHIN a batch, so a read limit that splits the backlog (e.g. a
    * `maxFilesPerTrigger` option) re-orders admission and the cap,
    * while still exact in SIZE, may keep different doc_ids than the
    * global doc_id-ordered batch cap. The source is therefore built
    * here without read-limit options — add none when extending.
    */
  def startDomainCap(spark: SparkSession, landingDir: String,
                     tableDir: String, checkpointDir: String, maxDocs: Int,
                     trigger: Trigger = Trigger.ProcessingTime("15 seconds"))
      : StreamingQuery =
    capPerDomainStream(
        // deliberately NO .option("maxFilesPerTrigger", ...): see above
        graft.sources.Adaptive.streamSession(spark, landingDir)
          .readStream.schema(domainDocSchema).parquet(landingDir),
        maxDocs)
      .writeStream
      .format("parquet")
      .option("path", tableDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .start()
}
