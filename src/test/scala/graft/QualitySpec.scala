package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quality

/** Drift-detection semantics of the population stability index. */
class QualitySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def corpus(rows: (String, Int)*) =
    rows.flatMap { case (lang, n) => Seq.fill(n)(lang) }
      .zipWithIndex.map { case (l, i) => (i.toLong, l) }
      .toDF("id", "lang")

  test("identical distributions score zero PSI per stratum") {
    val a = corpus("en" -> 60, "de" -> 30, "fr" -> 10)
    val got = Quality.populationStability(a, a, $"lang")
      .select("stratum", "psi").as[(String, Double)].collect().toMap
    assert(got.values.forall(_ == 0.0), got.toString)
  }

  test("a shifted stratum scores positive PSI; novel stratum yields null") {
    val old = corpus("en" -> 60, "de" -> 30, "fr" -> 10)
    val now = corpus("en" -> 30, "de" -> 30, "fr" -> 40, "zh" -> 0)
      .unionByName(Seq((999L, "zh")).toDF("id", "lang"))
    val got = Quality.populationStability(old, now, $"lang")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // en shrank and fr grew: both directions read as positive drift
    assert(got("en").get > 0.0 && got("fr").get > 0.0)
    // de's share barely moved (30/100 -> 30/101): near-zero psi
    assert(got("de").get < 0.01)
    // zh exists only in the new snapshot: null, not a silent number
    assert(got("zh").isEmpty)
  }

  test("ksDrift: identical halves 0, disjoint supports 1, single row null") {
    // A: values repeat across halves → CDFs coincide → ks = 0
    // B: first half all 1.0, second all 10.0 → ks = 1
    // C: one row → lands in the later half (strict midpoint) → null
    val ev = Seq(
      ("A", 0L, 1.0), ("A", 1L, 2.0), ("A", 2L, 1.0), ("A", 3L, 2.0),
      ("B", 0L, 1.0), ("B", 1L, 1.0), ("B", 2L, 10.0), ("B", 3L, 10.0),
      ("C", 5L, 7.0))
      .toDF("k", "sec", "v")
      .withColumn("t", col("sec").cast("timestamp"))
    val got = Quality.ksDrift(ev, "k", col("t"), col("v"))
      .orderBy("k").collect()
    assert(got(0).getLong(1) === 2L && got(0).getAs[Double]("ks") === 0.0)
    assert(got(1).getAs[Double]("ks") === 1.0)
    assert(got(2).getLong(1) === 0L && got(2).getLong(2) === 1L &&
      got(2).isNullAt(got(2).fieldIndex("ks")))
  }

  test("mannWhitneyDrift: ties count half, z matches hand computation") {
    // A: early {1,2} all below late {3,4} → U = 0, m = 2,
    //    σ² = (4/12)·(5 − 0) = 5/3 → z = −2/√(5/3) = −1.549193
    // B: early {1,1} vs late {1,2} → per cell v=1: 2U += 2·1 (two
    //    tied pairs at ½ each) → U = 1; tie term t=3 → Σ(t³−t)=24,
    //    σ² = (1/3)·(5 − 24/12) = 1 → z = (1−2)/1 = −1 exactly
    val ev = Seq(
      ("A", 0L, 1.0), ("A", 1L, 2.0), ("A", 2L, 3.0), ("A", 3L, 4.0),
      ("B", 0L, 1.0), ("B", 1L, 1.0), ("B", 2L, 1.0), ("B", 3L, 2.0))
      .toDF("k", "sec", "v")
      .withColumn("t", col("sec").cast("timestamp"))
    val got = Quality.mannWhitneyDrift(ev, "k", col("t"), col("v"))
      .orderBy("k").collect()
    assert(got(0).getAs[Double]("u") === 0.0)
    assert(got(0).getAs[Double]("z") === -1.549193)
    assert(got(1).getAs[Double]("u") === 1.0)
    assert(got(1).getAs[Double]("z") === -1.0)
  }

  test("profileNumeric: null-aware counts, exact ndv, one row per column") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 5.0), (2.0, 5.0), (2.0, null), (3.0, 7.0))
      .toDF("a", "b")
    val got = Quality.profileNumeric(df, Seq("a", "b"))
      .orderBy("col_name")
      .as[(String, Long, Long, Double, Double, Long)].collect().toSeq
    assert(got === Seq(
      ("a", 4L, 0L, 1.0, 3.0, 3L),
      ("b", 3L, 1L, 5.0, 7.0, 2L)))
  }
}
