package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — SURVEY.md §2.3's marquee generalization
  * of J1's "positions × latest price": instead of ONE latest price per
  * symbol, every left row picks the most recent right row at or before
  * its own timestamp (/root/reference/app/db.py:131-141 resolves the
  * same question with a correlated latest-price subquery; generalized
  * here to arbitrary event times).
  *
  * Implemented with the union-merge strategy, not a range join: tag both
  * sides, union on the key, sort per key by (time, side), and carry the
  * latest right payload forward with `last(ignoreNulls)` over a running
  * rows frame. That is ONE shuffle on the key and a linear per-partition
  * pass — a θ-join on `l.t >= r.t` would explode to |L|×|R| pairs per
  * key before filtering, which no optimizer saves at 100 TB. Matches
  * DuckDB's `ASOF JOIN` / pandas `merge_asof` semantics (left join:
  * unmatched left rows keep null payload).
  */
object AsOf {

  /** Left as-of join.
    *
    * @param by       equality key column (present on both sides)
    * @param leftOn   left event-time column
    * @param rightOn  right event-time column
    * @param payload  right columns to carry (names must not collide with
    *                 left columns)
    * @param direction "backward" (most recent right ≤ left, default) or
    *                  "forward" (earliest right ≥ left)
    * @param allowExactMatches whether a right row at exactly the left
    *                  timestamp counts as a match
    * @param tolerance optional SQL interval literal (e.g. "45 MINUTES")
    *                  bounding the match's staleness — pandas
    *                  merge_asof's `tolerance`: a match further than
    *                  this from the left timestamp yields null payload
    *                  (market-data reads bound quote staleness this
    *                  way). Inclusive at exactly the tolerance.
    *                  Requires timestamp time columns.
    *
    * Ties among right rows on (by, rightOn) are resolved arbitrarily —
    * pre-aggregate the right side (e.g. arg-max by ingest id) when the
    * payload must be deterministic.
    */
  def asofJoin(left: DataFrame, right: DataFrame, by: String,
               leftOn: String, rightOn: String, payload: Seq[String],
               direction: String = "backward",
               allowExactMatches: Boolean = true,
               tolerance: Option[String] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val clash = payload.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"payload columns collide with left: $clash")
    require(!payload.contains("_rt"), "payload name _rt is reserved")

    // the matched right timestamp rides the payload struct (as `_rt`)
    // so a tolerance bound can be evaluated after the carry-forward
    val lRow = struct(left.columns.map(col): _*)
    val payStruct = payload.map(col) :+ col(rightOn).as("_rt")
    val lNorm = left.select(col(by).as("_by"),
      col(leftOn).as("_t"), lit(1).as("_side"),
      lRow.as("_lrow"),
      lit(null).cast(right.select(payStruct: _*).schema).as("_pay"))
    val rNorm = right.select(col(by).as("_by"),
      col(rightOn).as("_t"), lit(0).as("_side"),
      lit(null).cast(left.schema).as("_lrow"),
      struct(payStruct: _*).as("_pay"))

    // traversal order: backward walks time ascending, forward descending;
    // on timestamp ties the right row comes first iff exact matches count
    val tOrd = if (direction == "backward") col("_t").asc else col("_t").desc
    val sOrd = if (allowExactMatches) col("_side").asc else col("_side").desc
    val w = Window.partitionBy(col("_by")).orderBy(tOrd, sOrd)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // null event times never match (merge_asof / DuckDB ASOF semantics).
    // Routed explicitly rather than through sort order: a null-t left row
    // would otherwise sort LAST under `desc` (forward) and spuriously
    // match the minimum-t right row, and a null-t right row would sort
    // FIRST under `asc` (backward) and leak its payload everywhere.
    val leftNullable = left.schema(leftOn).nullable
    val merged =
      (if (leftNullable) lNorm.filter(col("_t").isNotNull) else lNorm)
        .unionByName(
          if (right.schema(rightOn).nullable)
            rNorm.filter(col("_t").isNotNull)
          else rNorm)

    // the payload travels as ONE struct: a right row whose payload fields
    // are null still matches (last(ignoreNulls) on bare fields would
    // skip it and wrongly reach further back)
    // tolerance: a carried match further than the bound from the left
    // timestamp is nulled — unmatched, exactly merge_asof's contract
    // (inclusive at the bound; a null _m propagates null through when)
    val inTol = tolerance.map { tol =>
      if (direction == "backward")
        col("_m._rt") >= col("_t") - expr(s"INTERVAL $tol")
      else col("_m._rt") <= col("_t") + expr(s"INTERVAL $tol")
    }
    def payCol(p: String) = inTol match {
      case None       => col(s"_m.$p").as(p)
      case Some(cond) => when(cond, col(s"_m.$p")).otherwise(lit(null)).as(p)
    }
    val matched = merged
      .withColumn("_m", last(col("_pay"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("_lrow.*") +: payload.map(payCol): _*)
    // the extra left scan only exists when null timestamps are possible
    if (!leftNullable) matched
    else matched.unionByName(
      lNorm.filter(col("_t").isNull).select(col("_lrow.*") +:
        payload.map(p => col(s"_pay.$p").as(p)): _*))
  }

  /** Interval (range) join: left point-events matched to right
    * [start, end] intervals containing them (bounds inclusive), equi-keyed
    * by `by`. Spark plans a bare `l.t BETWEEN r.s AND r.e` as a
    * nested-loop join — |L|×|R| per key. Instead both sides bucket into
    * fixed-width time bins (the interval explodes into every bin it
    * covers, the point into its single bin) and join on (key, bin) before
    * the exact containment filter: one hash shuffle, pair space bounded
    * by co-binned rows. Each (point, interval) pair meets in exactly one
    * bin — the point's — so no dedup pass is needed.
    *
    * `binWidthSec` should be on the order of typical interval length:
    * too small explodes the interval into many bins, too large degrades
    * toward per-key all-pairs.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, by: String,
                leftTs: String, rightStart: String, rightEnd: String,
                binWidthSec: Long): DataFrame = {
    // floor, not cast-truncation: truncation rounds toward zero, which
    // would put pre-1970 timestamps in the wrong bin
    val lBin = floor(unix_seconds(col(leftTs)) / binWidthSec).cast("long")
    val rFrom =
      floor(unix_seconds(col(rightStart)) / binWidthSec).cast("long")
    val rTo = floor(unix_seconds(col(rightEnd)) / binWidthSec).cast("long")
    val l = left.withColumn("_bin", lBin)
    val r = right.withColumn("_bin", explode(sequence(rFrom, rTo)))
    l.join(r, Seq(by, "_bin"))
      .filter(col(leftTs) >= col(rightStart) &&
        col(leftTs) <= col(rightEnd))
      .drop("_bin")
  }
}
