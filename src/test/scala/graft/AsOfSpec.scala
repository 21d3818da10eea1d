package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf

/** As-of join semantics: backward/forward, exact-match toggle, unmatched
  * left rows, and null-payload right rows.
  */
class AsOfSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val left = Seq(
    (1L, "A", ts("2024-01-01 10:00:00")),
    (2L, "A", ts("2024-01-01 10:30:00")),
    (3L, "A", ts("2024-01-01 09:00:00")), // before any price
    (4L, "B", ts("2024-01-01 10:00:00"))) // B has only a later price
    .toDF("id", "sym", "t")

  private val right = Seq(
    ("A", ts("2024-01-01 09:30:00"), Some(1.0)),
    ("A", ts("2024-01-01 10:30:00"), Some(2.0)),
    ("B", ts("2024-01-01 11:00:00"), Some(5.0)))
    .toDF("sym", "as_of", "price")

  private def run(l: org.apache.spark.sql.DataFrame,
                  r: org.apache.spark.sql.DataFrame,
                  dir: String, exact: Boolean = true): Map[Long, Option[Double]] =
    AsOf.asofJoin(l, r, "sym", "t", "as_of", Seq("price"),
        direction = dir, allowExactMatches = exact)
      .select("id", "price").as[(Long, Option[Double])]
      .collect().toMap

  test("backward: most recent right at-or-before; unmatched → null") {
    val got = run(left, right, "backward")
    assert(got === Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> None,
      4L -> None))
  }

  test("backward without exact matches skips the tied right row") {
    val got = run(left, right, "backward", exact = false)
    assert(got(2L) === Some(1.0))
  }

  test("forward: earliest right at-or-after") {
    val got = run(left, right, "forward")
    assert(got === Map(1L -> Some(2.0), 2L -> Some(2.0), 3L -> Some(1.0),
      4L -> Some(5.0)))
  }

  test("a right row with null payload still matches (no reach-back)") {
    val r2 = right.unionByName(
      Seq(("A", ts("2024-01-01 09:45:00"), Option.empty[Double]))
        .toDF("sym", "as_of", "price"))
    val got = run(left, r2, "backward")
    assert(got(1L) === None) // 09:45 null row shadows the 09:30 price
  }

  test("rangeJoin: inclusive bounds, bin-crossing intervals, no dupes") {
    val l = Seq(
      (1L, "A", ts("2024-01-01 10:00:00")),  // exactly at start
      (2L, "A", ts("2024-01-01 11:30:00")),  // inside, next bin
      (3L, "A", ts("2024-01-01 12:00:00")),  // exactly at end
      (4L, "A", ts("2024-01-01 12:00:01")),  // just past end
      (5L, "B", ts("2024-01-01 10:30:00")))  // wrong key
      .toDF("id", "k", "t")
    val r = Seq(("A", 7L, ts("2024-01-01 10:00:00"),
      ts("2024-01-01 12:00:00"))).toDF("k", "iv", "s", "e")
    val got = AsOf.rangeJoin(l, r, "k", "t", "s", "e", binWidthSec = 3600)
      .select("id", "iv").as[(Long, Long)].collect().sorted
    assert(got.toSeq === Seq((1L, 7L), (2L, 7L), (3L, 7L)))
    // pair space bounded: plan is a hash join on (key, bin), not a
    // nested loop
    val plan = AsOf.rangeJoin(l, r, "k", "t", "s", "e", 3600)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("nestedloop") && !plan.contains("cartesian"),
      plan)
  }

  test("sessionize: gaps split sessions, running ids per key") {
    val e = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 10:10:00")),  // 10 min gap: same session
      (3L, "u1", ts("2024-01-01 12:00:00")),  // 110 min gap: new session
      (4L, "u2", ts("2024-01-01 10:00:00")))
      .toDF("id", "user", "t")
    val got = graft.operators.Series.sessionize(e, "user", $"t", $"id",
        maxGapSec = 1800)
      .select("id", "session").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("null event times never match, in either direction") {
    // merge_asof / DuckDB ASOF semantics: a null-timestamp left row gets
    // a null payload (it would otherwise sort last under forward's desc
    // order and spuriously match the minimum-t right row), and a
    // null-timestamp right row matches nothing (it would otherwise sort
    // first under backward's asc order and leak its payload everywhere)
    val lNull = left.unionByName(
      Seq((9L, "A", null.asInstanceOf[java.sql.Timestamp]))
        .toDF("id", "sym", "t"))
    val rNull = right.unionByName(
      Seq(("A", null.asInstanceOf[java.sql.Timestamp], Some(99.0)))
        .toDF("sym", "as_of", "price"))
    for (dir <- Seq("backward", "forward")) {
      val got = run(lNull, rNull, dir)
      assert(got(9L) === None, s"null left t must not match ($dir)")
      assert(!got.values.flatten.exists(_ == 99.0),
        s"null right t must never contribute payload ($dir)")
    }
  }

  test("one shuffle on the key: a single Exchange below the window") {
    val plan = AsOf.asofJoin(left, right, "sym", "t", "as_of",
      Seq("price")).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges === 1, plan)
    assert(!plan.toLowerCase.contains("cartesian"), plan)
  }

  test("tolerance nulls stale matches, inclusive at the bound") {
    def runTol(dir: String, tol: String): Map[Long, Option[Double]] =
      AsOf.asofJoin(left, right, "sym", "t", "as_of", Seq("price"),
          direction = dir, tolerance = Some(tol))
        .select("id", "price").as[(Long, Option[Double])]
        .collect().toMap
    // id=1 matched 09:30 (30 min stale): kept at exactly 30 MINUTES
    // (inclusive), dropped at 29; the exact-timestamp match (id=2,
    // zero staleness) always survives
    val at30 = runTol("backward", "30 MINUTES")
    assert(at30 === Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> None,
      4L -> None))
    val at29 = runTol("backward", "29 MINUTES")
    assert(at29(1L) === None && at29(2L) === Some(2.0))
    // forward: id=4 matches B's 11:00 price 60 min ahead — kept at 60,
    // dropped at 59
    assert(runTol("forward", "60 MINUTES")(4L) === Some(5.0))
    assert(runTol("forward", "59 MINUTES")(4L) === None)
  }
}
