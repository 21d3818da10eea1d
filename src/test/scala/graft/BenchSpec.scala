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
}
