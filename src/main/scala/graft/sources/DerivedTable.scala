package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A transformed replica of an [[AtomicTable]], kept current by
  * CONSUMING the change feed — the non-aggregate sibling of
  * [[MaterializedAgg]]: where the view folds mergeable partials, this
  * maintains `transform(base)` row-for-row (the "silver table" of the
  * medallion pipelines: filter + project + derive columns off the raw
  * corpus without ever rescanning it).
  *
  * `transform` must be ROW-WISE and deterministic (filters,
  * projections, per-row derived columns — no aggregates, no joins
  * against other rows): each base row then maps to at most one derived
  * row independent of every other row, which is what lets a change
  * feed drive the replica exactly:
  *
  *  - feed `insert` rows transform into the images to add (a row the
  *    transform filters out simply contributes nothing);
  *  - feed `delete` rows transform into the images to retract — the
  *    SAME function on the same row reproduces the image that was
  *    added before, so the retraction key always finds its target
  *    (and a filtered-out row never had an image to retract);
  *  - an update (its delete+insert pair) therefore retracts the old
  *    image and adds the new one, INCLUDING the subtle case where the
  *    update moves the row across the filter boundary — in one
  *    direction the image appears, in the other it disappears.
  *
  * The application is ONE crash-atomic commit per sync:
  * [[AtomicTable.overwritePartitions]] replaces exactly the partitions
  * the delta touches with `(existing − retractions) ∪ additions`,
  * fenced by the base version it synced to (same txn-mark discipline
  * as the view: a replayed sync is a clean skip, a crash before the
  * publish replays against fully-old state). Incremental soundness
  * needs only that the last-synced version's manifest still exists —
  * unlike the aggregate view, reassigning base mutations are FINE
  * (the feed expresses them as exact delete+insert pairs); a vacuumed
  * sync point falls back to a full recompute.
  *
  * At 100 TB: ingest appends drive delta-sized syncs (the feed of an
  * append-only span is Except-free — just the new rows through the
  * transform), a GDPR delete flows through as retractions of exactly
  * the deleted images, and the replica never pays a corpus rescan
  * unless its own history was vacuumed out from under it.
  */
final case class DerivedTable(base: AtomicTable, root: String,
                              transform: DataFrame => DataFrame,
                              keys: Seq[String], partCol: String) {
  require(keys.nonEmpty, "derived table needs retraction keys")

  private val stream = s"derive:${base.root}"

  /** The replica's own manifest-committed table. */
  val table: AtomicTable =
    AtomicTable(base.spark, root, partCol = partCol, defaultKeys = keys)

  /** Bring the replica up to the base's current version: a change-feed
    * delta when the last-synced manifest survives, a full recompute
    * otherwise. Idempotent per base version. Returns "noop", "delta",
    * or "full".
    */
  def sync(): String = {
    val cur = base.version
    val last = table.lastCommittedBatch(stream)
    if (cur == 0L || last.exists(_ >= cur) || !base.hasData) return "noop"
    val txn = Some((stream, cur))
    last.filter(base.versions.contains) match {
      case None =>
        table.init(transform(base.read()), txn); "full"
      case Some(v) =>
        val feed = base.changesBetween(v, cur)
        val adds = transform(
          feed.filter(col("change_type") === "insert").drop("change_type"))
        val dels = transform(
          feed.filter(col("change_type") === "delete").drop("change_type"))
          .select(keys.map(col) :+ col(partCol): _*)
        applyDelta(adds, dels, txn)
        "delta"
    }
  }

  /** Apply one feed delta as ONE commit: the touched partitions are
    * replaced with their current images minus the retractions plus the
    * additions. Both sides are tiny relative to the replica (the whole
    * point), so the anti-join runs over pruned partitions only.
    */
  private def applyDelta(adds: DataFrame, dels: DataFrame,
                         txn: Option[(String, Long)]): Unit = {
    val touched = (adds.select(col(partCol).cast("string")).distinct()
      .unionByName(dels.select(col(partCol).cast("string")).distinct()))
      .distinct().collect().map(_.getString(0)).toSeq
    if (touched.isEmpty) {
      // feed changes all transformed away: advance the fence only
      table.append(transform(base.read().limit(0)), txn)
      return
    }
    val existing =
      if (table.hasData)
        table.read().filter(
          col(partCol).isin(touched.map(table.partType): _*))
      else transform(base.read().limit(0))
    val merged = existing
      .join(dels.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(adds)
    if (table.hasData) table.overwritePartitions(touched, merged, txn)
    else table.init(merged, txn)
  }
}
