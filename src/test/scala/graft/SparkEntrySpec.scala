package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: every oracle has a query, names are
  * column-compare-safe, and the flagship entry produces rows on sf0.001.
  */
class SparkEntrySpec extends AnyFunSuite {

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("query inventory is non-trivial and named uniquely") {
    assert(SparkEntry.queries.size >= 40)
  }

  test("entry() yields rows on sf0.001 (driver smoke contract)") {
    val df = SparkEntry.entry(TestSpark.spark)
    assert(df.count() > 0)
  }

  test("all queries execute on sf0.001 (plans resolve end-to-end)") {
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try { fn(TestSpark.spark, "/root/testdata/sf0.001").count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
