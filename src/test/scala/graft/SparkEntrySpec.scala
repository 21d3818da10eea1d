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

  test("every oracle round() is signed-zero normalized with + 0.0") {
    // DuckDB's round preserves IEEE -0.0 where Spark's BigDecimal
    // round emits +0.0, so any rounded oracle value that can be
    // negative-and-round-to-zero hash-mismatches the engine (caught
    // live: w23 Williams %R on the 101 close-at-high bars in r9).
    // The corpus-wide discipline: every round(...) in oracle SQL is
    // immediately followed by `+ 0.0` (-0.0 + 0.0 = +0.0 in IEEE,
    // every other value unchanged), so the class cannot recur.
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        var bad = List.empty[String]
        var i = sql.indexOf("round(")
        while (i >= 0) {
          var depth = 0
          var j = i + "round".length
          var close = -1
          while (close < 0 && j < sql.length) {
            sql.charAt(j) match {
              case '(' => depth += 1
              case ')' => depth -= 1; if (depth == 0) close = j
              case _ =>
            }
            j += 1
          }
          val tail =
            if (close < 0) "" else sql.substring(close + 1).take(12)
          if (!tail.replaceAll("\\s+", " ").startsWith(" + 0.0"))
            bad ::= s"$name@$i"
          i = sql.indexOf("round(", i + 1)
        }
        bad
    }
    assert(offenders.isEmpty,
      s"un-normalized oracle round() sites (append ` + 0.0`): $offenders")
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
