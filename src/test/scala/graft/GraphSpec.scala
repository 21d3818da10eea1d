package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** PageRank fixed-point semantics: mass conservation (up to floor
  * losses), dangling redistribution, ordering, and bit-determinism
  * under repartitioning.
  */
class GraphSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // A feeds B heavily, B feeds C, C is dangling (no out-edges)
  private val edges = Seq(
    ("A", "B", 9L), ("A", "C", 1L), ("B", "C", 10L))
    .toDF("src", "dst", "w")

  test("ranks sum to ~total (floor losses only) and follow the flow") {
    val r = Graph.pageRank(edges, "src", "dst", "w", iters = 10)
      .as[(String, Long)].collect().toMap
    assert(r.keySet === Set("A", "B", "C"))
    val total = r.values.sum
    // each of 3 nodes can floor-lose a few pico-units per division per
    // iteration; anything beyond a thousand lost units is a logic bug
    assert(total <= 1000000000000L && total > 1000000000000L - 1000L)
    // C receives everything B has plus a tenth of A: must rank first;
    // A only gets teleport + dangling share: must rank last
    assert(r("C") > r("B") && r("B") > r("A"))
  }

  test("bit-identical under repartitioning and resilient to pre-split edges") {
    val base = Graph.pageRank(edges, "src", "dst", "w", iters = 10)
      .orderBy("node").as[(String, Long)].collect().toSeq
    val re = Graph.pageRank(edges.repartition(13), "src", "dst", "w",
        iters = 10)
      .orderBy("node").as[(String, Long)].collect().toSeq
    assert(re === base)
    // the same edge split across rows must aggregate to the same graph
    val split = Seq(("A", "B", 4L), ("A", "B", 5L), ("A", "C", 1L),
      ("B", "C", 7L), ("B", "C", 3L)).toDF("src", "dst", "w")
    val sp = Graph.pageRank(split, "src", "dst", "w", iters = 10)
      .orderBy("node").as[(String, Long)].collect().toSeq
    assert(sp === base)
  }

  test("trustRank: unreachable-from-seeds decays to zero; all-seeds ≡ pageRank") {
    // A is trusted; C pumps into B but has no inbound path from A, so
    // C's rank must decay to exactly zero (it starts at 0 and only
    // teleport/dangling mass — seeds-only — could refill it)
    val e = Seq(("A", "B", 1L), ("C", "B", 1L)).toDF("src", "dst", "w")
    val r = Graph.trustRank(e, "src", "dst", "w", seeds = Seq("A"),
        iters = 10)
      .as[(String, Long)].collect().toMap
    assert(r("C") === 0L)
    assert(r("A") > 0L && r("B") > 0L)
    // B additionally receives nothing through C (C never has mass to
    // push), so total mass ≈ total (floor losses only)
    assert(r.values.sum > 1000000000000L - 1000L)
    // seeding EVERY node reduces exactly to the uniform operator
    val all = Graph.trustRank(edges, "src", "dst", "w",
        seeds = Seq("A", "B", "C"), iters = 10)
      .orderBy("node").as[(String, Long)].collect().toSeq
    val uni = Graph.pageRank(edges, "src", "dst", "w", iters = 10)
      .orderBy("node").as[(String, Long)].collect().toSeq
    assert(all === uni)
    // absent seeds are ignored; an all-absent seed set refuses
    assertThrows[IllegalArgumentException] {
      Graph.trustRank(edges, "src", "dst", "w", seeds = Seq("ZZ"),
        iters = 2).collect()
    }
  }

  test("dangling-only graph: uniform stationary ranks") {
    // one edge A->B: B is dangling, its mass teleports back; symmetric
    // enough that both ranks stay positive and total is conserved
    val tiny = Seq(("A", "B", 1L)).toDF("src", "dst", "w")
    val r = Graph.pageRank(tiny, "src", "dst", "w", iters = 10)
      .as[(String, Long)].collect().toMap
    assert(r("B") > r("A")) // B gets all of A's flow, A only recycles
    assert(r.values.sum > 1000000000000L - 100L)
  }
}
