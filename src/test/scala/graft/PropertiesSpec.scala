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
}
