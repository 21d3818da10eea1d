package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's failure contract: a query that dies must surface as a
  * failure, never as a (fast) timing — round 8's testdata drift was
  * masked for a full round because analysis failures were timed at
  * their 0.05s failure latency and reported as speedups.
  */
class BenchSpec extends AnyFunSuite {

  test("timeQuery reports a dead query as Left, not a timing") {
    val dead = (_: org.apache.spark.sql.SparkSession, _: String) =>
      TestSpark.spark.sql("SELECT unix_micros(CAST('x' AS INT))")
    val r = Bench.timeQuery(TestSpark.spark, "/root/testdata/sf0.001", dead, 2)
    assert(r.isLeft, s"dead query must not produce a timing: $r")
  }

  test("timeQuery times a live query and survives one transient failure") {
    var first = true
    val flaky = (s: org.apache.spark.sql.SparkSession, _: String) => {
      if (first) { first = false; throw new RuntimeException("transient") }
      s.range(10).toDF("id")
    }
    val r = Bench.timeQuery(TestSpark.spark, "/root/testdata/sf0.001", flaky, 3)
    assert(r.isRight, s"one failed rep must not mask the real timing: $r")
    assert(r.toOption.get > 0.0)
  }

  test("rep tiering: expensive queries run once, cheap keep the cap") {
    // the r15 driver bench timed out running 23s lifecycle queries at
    // a uniform min-of-3; the tier policy is the committed fix and its
    // thresholds are load-bearing — pin them
    assert(Bench.tieredReps(23.0, 3) == 1, ">3s floors run once")
    assert(Bench.tieredReps(3.01, 3) == 1)
    assert(Bench.tieredReps(2.0, 3) == 2, "0.25-3s floors run twice")
    assert(Bench.tieredReps(0.3, 3) == 2)
    assert(Bench.tieredReps(0.2, 3) == 3, "only the ≤0.25s tail keeps the cap")
    assert(Bench.tieredReps(2.0, 1) == 1, "cap is an upper bound")
  }

  test("timeQuery never exceeds the rep cap even after failed attempts") {
    // ADVICE r16: attempts spent finding the first success used to be
    // free — a flaky-then-cheap query could run n + cap - 1 reps
    var calls = 0
    var failures = 2
    val flakyCheap = (s: org.apache.spark.sql.SparkSession, _: String) => {
      calls += 1
      if (failures > 0) { failures -= 1; throw new RuntimeException("flake") }
      s.range(10).toDF("id")
    }
    val r = Bench.timeQuery(TestSpark.spark, "/root/testdata/sf0.001",
      flakyCheap, 3)
    assert(r.isRight)
    assert(calls <= 3, s"cap is a hard bound on total executions, ran $calls")
  }

  test("pressured (min-of-1) measurements never ratchet floors upward") {
    // VERDICT r16: the budget valve's single-rep samples fed the
    // two-consecutive-runs floor-reset handshake, and a contaminated
    // box permanently inflated eight floors. Degraded queries must be
    // invisible to the handshake: no elevated entry, no reset, floor
    // preserved (or lowered) exactly as if the query had not spiked.
    val floors = Map("q" -> 0.10, "r" -> 0.10)
    val prevElevated = Map("q" -> 0.55, "r" -> 0.55) // both confirmed last run
    val results = Seq("q" -> 0.60, "r" -> 0.60)      // both >2x floor again
    // r was measured under pressure this run; q was not
    val (resets, elevated, newFloors) = Bench.floorHandshake(
      results, floors, prevElevated, flagged = Set.empty,
      degraded = Set("r"))
    assert(resets.contains("q"), "full-rep evidence still resets")
    assert(!resets.contains("r"), "degraded evidence must not reset")
    assert(!elevated.exists(_._1 == "r"),
      "degraded queries must not become next round's reset evidence")
    assert(newFloors.toMap.apply("r") == 0.10,
      "a pressured run leaves the floor untouched")
    assert(newFloors.toMap.apply("q") == 0.55,
      "the non-degraded reset takes the better confirmed time")
  }

  test("floorHandshake still ratchets floors down for degraded queries") {
    val floors = Map("s" -> 1.00)
    val (resets, elevated, newFloors) = Bench.floorHandshake(
      Seq("s" -> 0.40), floors, Map.empty, Set.empty, degraded = Set("s"))
    assert(resets.isEmpty && elevated.isEmpty)
    assert(newFloors.toMap.apply("s") == 0.40,
      "downward ratchet is always safe, pressured or not")
  }

  test("timeQuery runs exactly one rep for a multi-second query") {
    var calls = 0
    val slow = (s: org.apache.spark.sql.SparkSession, _: String) => {
      calls += 1
      // a genuinely slow plan without burning bench-suite time: sleep
      // inside a 1-partition mapPartitions so the measured rep is >3s
      import s.implicits._
      s.range(0, 1, 1, 1).mapPartitions { it =>
        Thread.sleep(3100); it
      }.toDF("id")
    }
    val r = Bench.timeQuery(TestSpark.spark, "/root/testdata/sf0.001", slow, 3)
    assert(r.isRight && r.toOption.get > 3.0)
    assert(calls == 1, s"a >3s first rep must stop the loop, ran $calls")
  }
}
