package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

/** Z-order layout: bit-exact Morton values, deterministic file
  * assignment, and the file-skipping win over a linear sort.
  */
class LayoutSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("zValue interleaves bits exactly") {
    // x = 0b101, y = 0b011 at 3 bits: positions (xi → 2i, yi → 2i+1)
    // give 0b011011 = 27
    val got = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zValue(Seq($"x", $"y"), bits = 3).as("z"))
      .as[Long].head()
    assert(got === 27L)
    // single dimension degenerates to the identity (bits permitting)
    val idf = Seq(45L).toDF("x")
      .select(Layout.zValue(Seq($"x"), bits = 8).as("z"))
      .as[Long].head()
    assert(idf === 45L)
  }

  test("zValue matches an independent Scala interleave on a value grid") {
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((x >>> i) & 1L) << (2 * i)) |
          (((y >>> i) & 1L) << (2 * i + 1))
      }
    val pts = (0L until 64L).map(i => (i * 37 % 64, i * 11 % 64))
    val cols = pts.toDF("x", "y")
      .select(Layout.zValue(Seq($"x", $"y"), 6).as("z"))
      .as[Long].collect().toSeq
    assert(cols === pts.map { case (x, y) => ref(x, y, 6) })
  }

  test("Z layout opens fewer files than a linear sort for a 2-D box") {
    // a full 64×64 (u, day) grid, 64 rows per file: Z-order packs each
    // file into an aligned 8×8 tile, a day-sorted layout packs each
    // file as one full day stripe
    val grid = (for (u <- 0L until 64L; d <- 0L until 64L)
      yield (u * 64 + d, u, d)).toDF("id", "u", "day")
    val box = Map("u" -> (16L, 23L), "day" -> (32L, 39L))

    val zLaid = Layout.assignZFiles(grid, Seq($"u", $"day"), $"id", 64L)
    val zStats = Layout.fileStats(zLaid, Seq("u", "day"), box)
    val zScanned = zStats.filter($"scanned").count()

    val linLaid = linearFiles(grid, $"day", $"id", 64L)
    val linStats = Layout.fileStats(linLaid, Seq("u", "day"), box)
    val linScanned = linStats.filter($"scanned").count()

    // the 8×8 box is one aligned Z tile but eight day stripes
    assert(zScanned === 1L)
    assert(linScanned === 8L)
    // pruning is sound: every box row lives in a scanned file
    val zScannedRows = zLaid.join(
        zStats.filter($"scanned").select("file_id"), "file_id")
      .filter($"u".between(16, 23) && $"day".between(32, 39)).count()
    assert(zScannedRows === 64L)
    // deterministic: the same input produces the same assignment
    val again = Layout.assignZFiles(grid, Seq($"u", $"day"), $"id", 64L)
      .select("id", "file_id").as[(Long, Long)].collect().toMap
    val first = zLaid.select("id", "file_id")
      .as[(Long, Long)].collect().toMap
    assert(again === first)
  }

  /** Linear (single-column) layout twin used as the baseline. */
  private def linearFiles(df: org.apache.spark.sql.DataFrame,
                          order: org.apache.spark.sql.Column,
                          tieBreak: org.apache.spark.sql.Column,
                          rowsPerFile: Long)
      : org.apache.spark.sql.DataFrame =
    graft.operators.Relational.globalRanks(df,
        Seq(order.asc, tieBreak.asc))
      .withColumn("file_id",
        ((col("_rn") - 1L) / lit(rowsPerFile)).cast("long"))
      .drop("_rn")
}
