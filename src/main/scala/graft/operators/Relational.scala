package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Filter / sort / pagination / dedup / mutation operators —
  * SURVEY.md §2.2 (F*), §2.6 (O*), §2.7, §2.8 (U*), plus the procedural
  * join patterns J2–J4. All are pure DataFrame → DataFrame transforms;
  * Catalyst pushes the predicates and prunes columns into the scan, so at
  * cluster scale these compile to partition-pruned parquet reads.
  */
object Relational {

  /** F1/F2 — dynamic AND of optional predicates
    * (/root/reference/app/db.py:271-302, 210-241): only the present
    * filters appear in the plan, mirroring the reference's dynamic WHERE
    * assembly — pushdown by construction.
    */
  def filterAll(df: DataFrame, conds: Seq[Column]): DataFrame =
    conds.foldLeft(df)((d, c) => d.filter(c))

  /** O1/O4/O5 — ordered page with limit/offset
    * (/root/reference/app/db.py:296-298). Spark ≥3.4 has a native OFFSET
    * operator, so the whole page is a single `TakeOrderedAndProject`-style
    * plan rather than a full sort.
    */
  def page(df: DataFrame, order: Seq[Column], limit: Int,
           offset: Int): DataFrame = {
    val sorted = df.orderBy(order: _*)
    (if (offset > 0) sorted.offset(offset) else sorted).limit(limit)
  }

  /** O5 — `next_offset` contract (/root/reference/app/main.py:548):
    * offset+limit iff the page is full, else None.
    */
  def nextOffset(pageRows: Long, limit: Int, offset: Int): Option[Int] =
    if (pageRows == limit.toLong) Some(offset + limit) else None

  /** O5 — the whole pagination contract as one relation: every page of
    * the ordered stream with its row count, rank span, offset, and
    * `next_offset` (offset+limit iff the page is full — the invariant the
    * reference tests at tests/test_api_and_ingest.py:42-63). Consecutive
    * pages partition the stream exactly: last_rn(page k) + 1 =
    * first_rn(page k+1).
    *
    * Scale path: NO global window (a `row_number` over an unpartitioned
    * Window funnels the entire ordered stream through one task). Instead:
    * range-partition on the sort key, sort within partitions, derive each
    * row's partition-local index from `monotonically_increasing_id` (upper
    * bits = partition id, lower bits = position in partition order), count
    * rows per partition (a ≤numShufflePartitions-row side result), and add
    * the broadcast prefix-sum offset — global rank with every partition
    * working in parallel.
    */
  /** Scale-safe GLOBAL ranks: the whole frame with a `_rn` column giving
    * each row's 1-based rank in `order`, computed with NO single-task
    * window — range partition on the sort key, partition-local indices
    * from `monotonically_increasing_id`, broadcast prefix-sum offsets.
    * Backs [[pageStats]] and the deterministic corpus shuffle.
    */
  def globalRanks(df: DataFrame, order: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    // Persist the ranged frame: the offset pass and the rank pass must see
    // identical partitioning (repartitionByRange samples its input).
    val ranged = graft.Caches.persist(
      df.repartitionByRange(parts, order: _*)
        .sortWithinPartitions(order: _*)
        .withColumn("_mid", monotonically_increasing_id())
        .withColumn("_pid", shiftrightunsigned(col("_mid"), 33))
        .withColumn("_li", col("_mid").bitwiseAND(lit((1L << 33) - 1))))
    // Bounded driver-side collect: one row per shuffle partition.
    val counts = ranged.groupBy(col("_pid")).agg(count(lit(1)).as("_pc"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.scanLeft(0L)(_ + _._2)).toMap
    val offExpr =
      if (offsets.isEmpty) lit(0L)
      else element_at(typedLit(offsets), col("_pid"))
    ranged
      .withColumn("_rn", offExpr + col("_li") + 1L)
      .drop("_mid", "_pid", "_li")
  }

  def pageStats(df: DataFrame, order: Seq[Column], limit: Int): DataFrame =
    globalRanks(df, order)
      .withColumn("page", floor((col("_rn") - 1) / limit).cast("long"))
      .groupBy("page")
      .agg(count(lit(1)).as("n_rows"),
        min(col("_rn")).as("first_rn"), max(col("_rn")).as("last_rn"))
      .withColumn("offset", col("page") * limit)
      .withColumn("next_offset",
        when(col("n_rows") === limit, col("offset") + limit))

  /** F3 — point lookup, newest id wins
    * (/root/reference/app/db.py:305-321).
    */
  def pointLookup(df: DataFrame, conds: Seq[Column],
                  idCol: Column): DataFrame =
    filterAll(df, conds).orderBy(idCol.desc).limit(1)

  /** S5/S6/U7 — idempotent `INSERT OR IGNORE` keyed append
    * (/root/reference/app/db.py:244-261): dedupe the incoming batch on
    * the key, anti-join against existing keys, append survivors. The
    * anti-join broadcasts whichever side Catalyst sizes smaller; at scale
    * the existing side is the big one so the batch keys broadcast.
    * Returns (new table, rows actually inserted) — the reference's 0/1
    * rowcount contract (tests/test_db.py:18) generalized to batches.
    */
  /** Lazy form: the merged table only (no inserted-count action). */
  def insertIgnoreDf(existing: DataFrame, batch: DataFrame,
                     keys: Seq[String]): DataFrame = {
    val fresh = batch
      .dropDuplicates(keys)
      .join(existing.select(keys.map(col): _*).distinct(), keys, "left_anti")
    existing.unionByName(fresh, allowMissingColumns = true)
  }

  def insertIgnore(existing: DataFrame, batch: DataFrame,
                   keys: Seq[String]): (DataFrame, Long) = {
    val fresh = batch
      .dropDuplicates(keys)
      .join(existing.select(keys.map(col): _*).distinct(), keys, "left_anti")
    val inserted = fresh.count()
    (existing.unionByName(fresh, allowMissingColumns = true), inserted)
  }

  /** U1/U2 — keyed upsert (/root/reference/app/db.py:166-201): rows whose
    * key matches the source are replaced; everything else is kept. The
    * Delta `MERGE WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT` pattern
    * expressed as anti-join ∪ source.
    */
  def upsert(target: DataFrame, source: DataFrame,
             keys: Seq[String]): DataFrame =
    target.join(source.select(keys.map(col): _*).distinct(), keys,
      "left_anti").unionByName(source, allowMissingColumns = true)

  /** U4 — delete by key, reporting the deleted rowcount
    * (/root/reference/app/db.py:204-207; 404-if-zero contract at
    * /root/reference/app/main.py:323-325).
    */
  def deleteWhere(target: DataFrame, cond: Column): (DataFrame, Long) = {
    val deleted = target.filter(cond).count()
    (target.filter(!coalesce(cond, lit(false))), deleted)
  }

  /** J4 — FK `ON DELETE CASCADE` (/root/reference/app/db.py:106): child
    * rows of deleted parents are dropped via anti-join.
    */
  def cascadeDelete(child: DataFrame, deletedParentKeys: DataFrame,
                    fk: Seq[String]): DataFrame =
    child.join(deletedParentKeys, fk, "left_anti")

  /** J2 — precedence-dedup union (server wins) on a content signature
    * (/root/reference/static/main.js:853-858). Implemented as
    * union + row_number over (sig ORDER BY priority, tiebreak) so the
    * whole merge is one shuffle on the signature.
    */
  def dedupUnion(preferred: DataFrame, other: DataFrame, sigCol: String,
                 tieBreak: Column): DataFrame = {
    val tagged = preferred.withColumn("_prio", lit(0))
      .unionByName(other.withColumn("_prio", lit(1)),
        allowMissingColumns = true)
    val w = Window.partitionBy(col(sigCol))
      .orderBy(col("_prio").asc, tieBreak)
    tagged.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn", "_prio")
  }

  /** J3 — backfill anti-join (/root/reference/static/main.js:862-867):
    * local rows whose signature is unknown to the server.
    */
  def backfill(local: DataFrame, server: DataFrame,
               sigCols: Seq[String]): DataFrame =
    local.join(server.select(sigCols.map(col): _*).distinct(), sigCols,
      "left_anti")

  /** U6 — latest-code validity check (/root/reference/app/db.py:495-514):
    * newest row per (email, code), valid iff unexpired and unused.
    */
  def verifyCode(codes: DataFrame, now: Column): DataFrame = {
    val w = Window.partitionBy(col("email"), col("code"))
      .orderBy(col("id").desc)
    codes.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
      .withColumn("valid",
        col("used") === 0 && now < col("expires_at"))
  }

  /** F8/ST4 — TTL expiry predicate
    * (/root/reference/app/main.py:237-251).
    */
  def unexpired(df: DataFrame, expiresAt: Column, now: Column): DataFrame =
    df.filter(now < expiresAt)

  /** Keep the best `ceil(fraction · |stratum|)` rows per stratum under
    * `order` — exact per-stratum top-fraction selection (a FineWeb-style
    * quality cut applies it per language: a GLOBAL score threshold
    * silently starves whichever languages score systematically lower).
    * Both windows partition by the stratum, so the selection is
    * per-partition work with no global sort; determinism requires
    * `order` to be a total order (add a key tiebreak).
    */
  def keepTopFraction(df: DataFrame, stratum: Column,
                      order: Seq[Column], fraction: Double): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"fraction must be in (0, 1]: $fraction")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(order: _*)
    val cw = org.apache.spark.sql.expressions.Window.partitionBy(stratum)
    df.withColumn("_rk", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(cw))
      .filter(col("_rk") <= ceil(col("_n") * fraction))
      .drop("_rk", "_n")
  }

  /** Slowly-changing-dimension type-2 history from an observation log:
    * per key, collapse the (value, ts) stream into validity intervals —
    * one row per STATE CHANGE, with `valid_from` = the change's ts,
    * `valid_to` = the next change's ts (null while current), a 1-based
    * `version`, and `is_current`. Re-observations of the unchanged state
    * are absorbed (null-safe compare, so null-valued states collapse
    * too); `tie` must make (ts, tie) a total order per key or the
    * interval boundaries are nondeterministic.
    *
    * Scale shape: both windows partition by the key, and the second
    * (lead/row_number over the surviving change rows) reuses the first's
    * hash partitioning and sort — one shuffle total, no global window.
    * This is the batch dual of a MERGE-based SCD2 pipeline: deriving the
    * full history from the log is idempotent and replayable where
    * per-batch MERGEs must order their inputs carefully.
    */
  def scd2History(obs: DataFrame, key: Column, value: Column,
                  ts: Column, tie: Column): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("valid_from"),
      col("_tb"))
    obs.select(key.as("key"), value.as("value"), ts.as("valid_from"),
        tie.as("_tb"))
      .withColumn("_prev", lag(col("value"), 1).over(w))
      .withColumn("_rn", row_number().over(w))
      // the _rn guard disambiguates "no previous row" from "previous
      // value was null" — a key whose FIRST observed state is null
      // must still open version 1
      .filter(col("_rn") === 1 || !(col("_prev") <=> col("value")))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("is_current", col("valid_to").isNull)
      .select("key", "version", "value", "valid_from", "valid_to",
        "is_current")
  }
}
