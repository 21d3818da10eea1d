package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** F/O/U/J operator semantics: idempotent ingest, upsert, delete
  * counts, precedence-dedup union, pagination invariants — reference
  * contracts at /root/reference/app/db.py:166-261 and
  * static/main.js:853-874; pagination at app/main.py:537-549.
  */
class RelationalSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("insertIgnore: batch dedup + anti-join; re-ingest is a no-op") {
    val existing = Seq((1L, "A", "s1"), (2L, "B", "s1"))
      .toDF("id", "sym", "src")
    val batch = Seq((10L, "A", "s1"), (11L, "C", "s1"), (11L, "C", "s1"))
      .toDF("id", "sym", "src")
    val (merged, inserted) =
      Relational.insertIgnore(existing, batch, Seq("sym", "src"))
    assert(inserted === 1L) // only C is new; in-batch dup collapsed
    assert(merged.count() === 3L)
    // idempotence: replaying the same batch inserts nothing
    val (merged2, inserted2) =
      Relational.insertIgnore(merged, batch, Seq("sym", "src"))
    assert(inserted2 === 0L && merged2.count() === 3L)
  }

  test("upsert: matched keys replaced, unmatched kept, new inserted") {
    val target = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
    val source = Seq((2L, 99.0), (3L, 30.0)).toDF("id", "v")
    val got = Relational.upsert(target, source, Seq("id"))
      .orderBy("id").as[(Long, Double)].collect()
    assert(got.toSeq === Seq((1L, 10.0), (2L, 99.0), (3L, 30.0)))
  }

  test("deleteWhere: rowcount contract incl. null-condition rows") {
    val df = Seq((1L, Some("x")), (2L, None), (3L, Some("del")))
      .toDF("id", "tag")
    val (remaining, deleted) =
      Relational.deleteWhere(df, $"tag" === "del")
    assert(deleted === 1L)
    // null condition (id=2) must be KEPT, not dropped
    assert(remaining.orderBy("id").as[(Long, Option[String])].collect()
      .map(_._1).toSeq === Seq(1L, 2L))
  }

  test("cascadeDelete removes children of deleted parents (db.py:106)") {
    val child = Seq((1L, 100L), (2L, 200L), (3L, 100L)).toDF("id", "pid")
    val deleted = Seq(100L).toDF("pid")
    assert(Relational.cascadeDelete(child, deleted, Seq("pid"))
      .select("id").as[Long].collect().toSeq === Seq(2L))
  }

  test("dedupUnion: server wins on signature collision (main.js:853-858)") {
    val server = Seq(("sig1", "server-a"), ("sig2", "server-b"))
      .toDF("sig", "who")
    val local = Seq(("sig1", "local-a"), ("sig3", "local-c"))
      .toDF("sig", "who")
    val got = Relational.dedupUnion(server, local, "sig", $"who")
      .orderBy("sig").as[(String, String)].collect()
    assert(got.toSeq === Seq(("sig1", "server-a"), ("sig2", "server-b"),
      ("sig3", "local-c")))
  }

  test("backfill: local rows unknown to server (main.js:862-867)") {
    val local = Seq(("sig1", 1), ("sig9", 2)).toDF("sig", "v")
    val server = Seq(("sig1", 0)).toDF("sig", "v")
    assert(Relational.backfill(local, server, Seq("sig"))
      .as[(String, Int)].collect().map(_._1).toSeq === Seq("sig9"))
  }

  test("page + nextOffset: pages partition the ordered stream (O5)") {
    val df = (1 to 25).map(i => (i.toLong, s"r$i")).toDF("id", "v")
    val limit = 10
    val pages = Seq(0, 10, 20).map(off =>
      Relational.page(df, Seq($"id".asc), limit, off)
        .as[(Long, String)].collect().toSeq)
    assert(pages(0).map(_._1) === (1L to 10L))
    assert(pages(1).map(_._1) === (11L to 20L))
    assert(pages(2).map(_._1) === (21L to 25L))
    assert(pages.flatten === df.orderBy("id").as[(Long, String)]
      .collect().toSeq) // no gaps, no overlaps
    assert(Relational.nextOffset(pages(0).size, limit, 0) === Some(10))
    assert(Relational.nextOffset(pages(2).size, limit, 20) === None)
  }

  test("pointLookup: newest id wins (db.py:305-321)") {
    val df = Seq((1L, "A", 10.0), (5L, "A", 50.0), (3L, "A", 30.0))
      .toDF("id", "sym", "v")
    val got = Relational.pointLookup(df, Seq($"sym" === "A"), $"id")
      .collect()
    assert(got.length === 1 && got(0).getDouble(2) === 50.0)
  }

  test("verifyCode: newest row per (email, code); expiry + used flag") {
    val now = to_timestamp(lit("2024-01-01 00:05:00"))
    val codes = Seq(
      (1L, "a@x.com", "111111", "2024-01-01 00:10:00", 0), // valid
      (2L, "b@x.com", "222222", "2024-01-01 00:01:00", 0), // expired
      (3L, "c@x.com", "333333", "2024-01-01 00:10:00", 1), // used
      (4L, "c@x.com", "333333", "2024-01-01 00:10:00", 0)) // newer, unused
      .toDF("id", "email", "code", "exp", "used")
      .withColumn("expires_at", to_timestamp($"exp")).drop("exp")
    val got = Relational.verifyCode(codes, now)
      .orderBy("email").select("email", "valid")
      .as[(String, Boolean)].collect()
    assert(got.toSeq === Seq(("a@x.com", true), ("b@x.com", false),
      ("c@x.com", true))) // id=4 (newest) wins for c@x.com
  }

  test("unexpired keeps only rows with now < expires_at (F8)") {
    val df = Seq(("s1", "2024-01-01 00:10:00"), ("s2", "2024-01-01 00:01:00"))
      .toDF("token", "exp").withColumn("expires_at", to_timestamp($"exp"))
    val got = Relational.unexpired(df, $"expires_at",
      to_timestamp(lit("2024-01-01 00:05:00")))
    assert(got.select("token").as[String].collect().toSeq === Seq("s1"))
  }

  test("keepTopFraction: per-stratum ceil cut, best rows survive") {
    // en: 4 rows → ceil(4·0.7)=3 kept; fr: 1 row → ceil(0.7)=1 kept
    val df = Seq(("en", 1L, 0.5), ("en", 2L, 0.1), ("en", 3L, 0.9),
      ("en", 4L, 0.3), ("fr", 5L, 0.8))
      .toDF("lang", "id", "score")
    val kept = Relational.keepTopFraction(df, $"lang",
        Seq($"score".asc, $"id".asc), fraction = 0.7)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(2L, 4L, 1L, 5L)) // en drops its worst (id=3)
    // fraction 1.0 keeps everything; the helper columns don't leak
    val all = Relational.keepTopFraction(df, $"lang",
      Seq($"score".asc, $"id".asc), fraction = 1.0)
    assert(all.count() === 5 && all.columns.toSet ===
      Set("lang", "id", "score"))
  }

  test("scd2History: re-observations absorb, reverts re-open, " +
    "nulls collapse null-safely") {
    val obs = Seq(
      // key A: v1 observed twice, then v2 twice, then BACK to v1 —
      // the revert is a new version, not a merge with version 1
      ("A", Some("v1"), 1L, 1L), ("A", Some("v1"), 2L, 2L),
      ("A", Some("v2"), 3L, 3L), ("A", Some("v2"), 4L, 4L),
      ("A", Some("v1"), 5L, 5L),
      // key B: leading nulls collapse to ONE null-valued version
      ("B", None, 1L, 6L), ("B", None, 2L, 7L),
      ("B", Some("x"), 3L, 8L))
      .toDF("k", "v", "ts", "id")
    val h = Relational.scd2History(obs, $"k", $"v", $"ts", $"id")
      .orderBy("key", "version")
      .as[(String, Long, Option[String], Long, Option[Long], Boolean)]
      .collect().toSeq
    assert(h === Seq(
      ("A", 1L, Some("v1"), 1L, Some(3L), false),
      ("A", 2L, Some("v2"), 3L, Some(5L), false),
      ("A", 3L, Some("v1"), 5L, None, true),
      ("B", 1L, None, 1L, Some(3L), false),
      ("B", 2L, Some("x"), 3L, None, true)))
    // intervals tile each key's timeline: valid_to(n) = valid_from(n+1),
    // exactly one current row per key
    assert(h.count(_._6) === 2)
  }
}
