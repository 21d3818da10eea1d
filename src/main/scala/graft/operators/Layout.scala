package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering and the
  * file-skipping accounting that justifies it.
  *
  * At 100 TB the dominant cost of a selective query is how many files
  * its predicates force the scan to open. Min/max file statistics prune
  * perfectly only for the ONE column the data is sorted by; a linear
  * sort on `ts` leaves every other predicate (`user_id`, …) scanning
  * the whole table. Interleaving the bits of several bounded dimensions
  * into one sort key (the Z-value) keeps every dimension partially
  * clustered, so per-file min/max ranges stay narrow in ALL of them and
  * a 2-D box query opens O(√files) instead of O(files) — the standard
  * lakehouse `OPTIMIZE ZORDER BY` layout, built here from first
  * principles: bit math + the scale-safe [[Relational.globalRanks]]
  * (range partition + partition-local ids; no single-task window).
  *
  * Reference scope: the reference app keeps SQLite tables ordered by
  * rowid and pays a full scan for every non-key filter (see
  * market-insights-app `app/db.py`); this operator is the layout a
  * 100 TB Spark port of those tables would need instead.
  */
object Layout {

  /** Morton Z-value of `cols`: bit `i` of dimension `j` lands at
    * interleaved position `i * cols.size + j`. Every input must already
    * be a non-negative integer below `2^bits` (bucket/clamp first —
    * [[zBucket]]); values are cast to long and the result occupies
    * `bits * cols.size` bits, so `bits * cols.size ≤ 63`. Pure
    * shift/mask column arithmetic — codegen'd, no UDF, and mirrored
    * term-for-term by the DuckDB oracle via [[zValueSql]].
    */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(bits * cols.size <= 63,
      s"interleaved width ${bits * cols.size} exceeds a signed long")
    val n = cols.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(
      shiftrightunsigned(c.cast("long"), i).bitwiseAND(lit(1L)),
      i * n + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** The same Z-value as a DuckDB SQL expression over column names —
    * the oracle twin is generated from the SAME (i, j) → position map,
    * so the two engines agree bit-for-bit by construction.
    */
  def zValueSql(cols: Seq[String], bits: Int = 16): String = {
    val n = cols.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield s"((($c >> $i) & 1) << ${i * n + j})"
    terms.mkString("(", " | ", ")")
  }

  /** Bounded non-negative bucket for one Z dimension. */
  def zBucket(c: Column, bits: Int = 16): Column =
    pmod(c.cast("long"), lit(1L << bits))

  /** Cluster `df` by the Z-value of `dims` and pack `rowsPerFile` rows
    * per target file in Z order (`tieBreak` makes the assignment total
    * and deterministic). Emits the input columns plus `file_id` — the
    * write side would `repartitionByRange(col("file_id"))` and write;
    * kept as a column here so the layout is inspectable/testable.
    */
  def assignZFiles(df: DataFrame, dims: Seq[Column], tieBreak: Column,
                   rowsPerFile: Long, bits: Int = 16): DataFrame =
    Relational.globalRanks(
        df.withColumn("_z", zValue(dims.map(zBucket(_, bits)), bits)),
        Seq(col("_z").asc, tieBreak.asc))
      .withColumn("file_id",
        ((col("_rn") - 1L) / lit(rowsPerFile)).cast("long"))
      .drop("_z", "_rn")

  /** Per-file min/max statistics over the layout's dimension columns
    * plus the `scanned` verdict for one rectangular query box: a file
    * must be opened iff its [min, max] envelope intersects the box in
    * EVERY dimension — exactly the pruning decision a parquet reader
    * makes from footer statistics. `box` maps dimension column name →
    * (lo, hi) inclusive bounds.
    */
  def fileStats(laidOut: DataFrame, dims: Seq[String],
                box: Map[String, (Long, Long)]): DataFrame = {
    val aggs = dims.flatMap { d =>
      Seq(min(col(d)).as(s"min_$d"), max(col(d)).as(s"max_$d"))
    } :+ count(lit(1)).as("n_rows")
    val scanned = box.map { case (d, (lo, hi)) =>
      col(s"min_$d") <= hi && col(s"max_$d") >= lo
    }.reduce(_ && _)
    laidOut.groupBy("file_id")
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("scanned", scanned)
  }
}
