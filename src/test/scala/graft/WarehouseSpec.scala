package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Warehouse

/** Physical layout: symbol partition pruning and bucketed shuffle-free
  * joins, asserted on the actual physical plans.
  */
class WarehouseSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("symbol-partitioned prices prune to the queried partition") {
    val root = Files.createTempDirectory("graft_wh").toString
    val prices = Seq(
      (1L, "EURUSD", 1.08, ts("2024-01-01 10:00:00")),
      (2L, "AAPL", 190.0, ts("2024-01-01 10:00:00")),
      (3L, "EURUSD", 1.09, ts("2024-01-01 11:00:00")))
      .toDF("id", "symbol", "price", "as_of")
    Warehouse.writePrices(prices, root)
    val q = Warehouse.readPrices(spark, root)
      .filter($"symbol" === "EURUSD")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
    assert(plan.contains("symbol"), plan)
    assert(q.count() === 2)
    // the pruned scan reads only the EURUSD directory
    val scanned = q.queryExecution.executedPlan.collectLeaves()
      .head.toString
    assert(scanned.contains("isnotnull(symbol"))
  }

  test("bucketed tables join without an exchange on the bucket key") {
    val a = (1 to 100).map(i => (i.toLong, i * 2.0)).toDF("k", "va")
    val b = (1 to 100).map(i => (i.toLong, s"n$i")).toDF("k", "vb")
    Warehouse.writeBucketed(a, "bkt_a", "k", 4)
    Warehouse.writeBucketed(b, "bkt_b", "k", 4)
    val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    // co-located: no shuffle exchange feeding the join
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(joined.count() === 100)
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")
  }
}
