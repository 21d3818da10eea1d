package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOf, Relational}

/** Randomized-input properties for the operators whose contracts are easy
  * to state but easy to get wrong at the edges: the as-of join against a
  * brute-force per-row reference, and the pagination relation against
  * the driver-side next_offset helper. Seeded generators — failures
  * reproduce.
  */
class PropertiesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("asofJoin backward equals the brute-force per-row lookup") {
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val keys = Seq("A", "B", "C")
      val left = (1 to 60).map(i =>
        (i.toLong, keys(rng.nextInt(3)), rng.nextInt(1000).toLong))
      val right = (1 to 40).map(i =>
        (keys(rng.nextInt(3)), rng.nextInt(1000).toLong,
          rng.nextInt(500).toDouble))
        // unique (key, t) so the matched payload is deterministic
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val lDf = left.toDF("id", "k", "t")
      val rDf = right.toDF("k", "rt", "price")
      val got = AsOf.asofJoin(lDf, rDf, "k", "t", "rt", Seq("price"))
        .select("id", "price").as[(Long, Option[Double])].collect().toMap
      // brute force: max rt <= t per (key, t)
      val expect = left.map { case (id, k, t) =>
        val cands = right.filter(r => r._1 == k && r._2 <= t)
        id -> (if (cands.isEmpty) None
               else Some(cands.maxBy(_._2)._3))
      }.toMap
      assert(got === expect, s"trial $trial")
    }
  }

  test("pageStats: pages partition the stream; next_offset matches helper") {
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 1 + rng.nextInt(300)
      val limit = 1 + rng.nextInt(40)
      val df = (1 to n).map(i => Tuple1(i.toLong)).toSeq.toDF("id")
      val pages = Relational.pageStats(df, Seq(col("id").asc), limit)
        .orderBy("page")
        .select("page", "n_rows", "first_rn", "last_rn", "offset",
          "next_offset")
        .as[(Long, Long, Long, Long, Long, Option[Long])].collect()
      // partition: counts sum to n, rank spans are contiguous
      assert(pages.map(_._2).sum === n, s"trial $trial n=$n limit=$limit")
      pages.sliding(2).foreach {
        case Array(a, b) => assert(a._4 + 1 === b._3)
        case _ =>
      }
      // every page's next_offset agrees with the driver-side helper,
      // and equals the next page's offset (or None past the end)
      pages.zipWithIndex.foreach { case ((_, rows, _, _, off, nxt), i) =>
        assert(nxt ===
          Relational.nextOffset(rows, limit, off.toInt).map(_.toLong))
        if (i < pages.length - 1) assert(nxt === Some(pages(i + 1)._5))
      }
      assert(pages.last._6.forall(_ >= n)) // full last page → offset past end
    }
  }

  test("insertIgnoreDf: idempotent, key-unique, preserves existing rows") {
    val rng = new scala.util.Random(3)
    for (trial <- 1 to 3) {
      val existing = (1 to 30).map(_ =>
        (rng.nextInt(20).toLong, rng.nextInt(100)))
        .distinctBy(_._1).toDF("k", "v")
      val batch = (1 to 30).map(_ =>
        (rng.nextInt(30).toLong, 1000 + rng.nextInt(100))).toDF("k", "v")
      val once = Relational.insertIgnoreDf(existing, batch, Seq("k"))
      val twice = Relational.insertIgnoreDf(once, batch, Seq("k"))
      assert(once.count() === twice.count(), s"trial $trial")
      // keys unique after merge
      assert(once.select("k").distinct().count() === once.count())
      // existing rows never overwritten
      val ex = existing.as[(Long, Int)].collect().toMap
      once.as[(Long, Int)].collect().foreach { case (k, v) =>
        ex.get(k).foreach(ev => assert(v === ev))
      }
    }
  }

  test("indicator ranges on random walks: RSI/%K in [0,100], bands straddle") {
    import graft.operators.Series
    val rng = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val n = 60 + rng.nextInt(120)
      var px = 100.0
      val rows = (0 until n).map { i =>
        px = math.max(1.0, px + rng.nextGaussian() * 2.0)
        (i.toLong, if (i % 2 == 0) "A" else "B",
          java.sql.Timestamp.valueOf(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00"),
          math.rint(px * 100) / 100)
      }
      val df = rows.toDF("id", "k", "t", "v")
      val w = Series.ordered("k", col("t"), col("id"))
      val rsi = Series.rsiCutler(df, col("v"), 5, w)
        .select("rsi").as[Option[Double]].collect().flatten
      assert(rsi.forall(r => r >= 0.0 && r <= 100.0), s"trial $trial rsi")
      val kp = Series.stochasticK(df, col("v"), 5, w)
        .select("k_pct").as[Option[Double]].collect().flatten
      assert(kp.forall(p => p >= 0.0 && p <= 100.0), s"trial $trial %K")
      val bands = Series.bollinger(df, col("v"), 5, 2.0, w)
        .select("mid", "band_up", "band_dn")
        .as[(Option[Double], Option[Double], Option[Double])].collect()
      bands.foreach {
        case (Some(m), Some(u), Some(l)) =>
          assert(u >= m && m >= l, s"trial $trial band order")
        case _ =>
      }
      // ATR non-negative over the derived hourly bars
      val bars = Series.ohlcBars(df, "k", col("t"), col("id"), col("v"),
        "1 hour")
      val atrs = Series.atr(bars, "k", 2)
        .select("tr", "atr").as[(Double, Option[Double])].collect()
      assert(atrs.forall(_._1 >= 0.0), s"trial $trial tr")
      assert(atrs.flatMap(_._2).forall(_ >= 0.0), s"trial $trial atr")
    }
  }

  test("benford shares sum to 1; oovRate bounded and vocab-monotone") {
    import graft.operators.Aggregates
    import graft.pipelines.TextAnalysis
    val rng = new scala.util.Random(23)
    val vals = (1 to 400).map(_ =>
      math.rint(math.exp(rng.nextDouble() * 9) ) / 100.0)
    val bf = Aggregates.benford(vals.toDF("v"), col("v")).collect()
    val shares = bf.map(_.getAs[Double]("obs_share")).sum
    assert(math.abs(shares - 1.0) < 1e-4)
    assert(bf.forall(r => r.getInt(0) >= 1 && r.getInt(0) <= 9))

    val docs = (1 to 50).map { i =>
      (i.toLong, (1 to 10).map(_ => s"w${rng.nextInt(30)}").mkString(" "))
    }.toDF("doc_id", "text")
    def shares2(k: Int) =
      TextAnalysis.oovRate(docs, "doc_id", col("text"), k)
        .select("doc_id", "oov_share").as[(Long, Double)].collect().toMap
    val s5 = shares2(5)
    val s20 = shares2(20)
    assert(s5.values.forall(v => v >= 0.0 && v <= 1.0))
    // a larger vocabulary can only lower (or keep) every doc's OOV share
    s20.foreach { case (id, v) => assert(v <= s5(id) + 1e-12) }
  }
}
