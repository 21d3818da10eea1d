package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{AtomicTable, DerivedTable}

/** Change-feed-driven replica maintenance: appends sync as Except-free
  * deltas, updates retract the old image and add the new one —
  * including across the transform's filter boundary and across
  * partitions — deletes flow as retractions, a vacuumed sync point
  * falls back to a full recompute, and the replica equals
  * `transform(base)` after every one of those transitions.
  */
class DerivedTableSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def batch(lo: Long, hi: Long) = (lo to hi)
    .map(i => (i, if (i % 3 == 0) "en" else "de",
      if (i % 2 == 0) "a" else "b", i * 10))
    .toDF("id", "lang", "part", "x")

  private val tf: DataFrame => DataFrame =
    df => df.filter($"lang" === "en")
      .select($"id", $"part", ($"x" * 2).as("x2"))

  private def mk(root: String): (AtomicTable, DerivedTable) = {
    val base = AtomicTable(spark, s"$root/base", partCol = "part",
      defaultKeys = Seq("id"))
    (base, DerivedTable(base, s"$root/dt", tf,
      keys = Seq("id"), partCol = "part"))
  }

  private def same(a: DataFrame, b: DataFrame): Boolean = {
    val cols = a.columns.sorted.toIndexedSeq.map(col)
    a.select(cols: _*).exceptAll(b.select(cols: _*)).isEmpty &&
      b.select(cols: _*).exceptAll(a.select(cols: _*)).isEmpty
  }

  test("append-only syncs are feed-driven deltas; replica ≡ " +
    "transform(base) and replays are fenced") {
    val (base, dt) = mk(Files.createTempDirectory("graft_dt").toString)
    base.init(batch(1, 60))
    assert(dt.sync() === "full")
    assert(same(dt.table.read(), tf(base.read())))
    base.append(batch(61, 120))
    assert(dt.sync() === "delta")
    assert(same(dt.table.read(), tf(base.read())))
    val v = dt.table.version
    assert(dt.sync() === "noop")
    assert(dt.table.version === v)
  }

  test("updates cross the filter boundary and partitions correctly; " +
    "deletes retract; a vacuumed sync point goes full") {
    val (base, dt) = mk(Files.createTempDirectory("graft_dt2").toString)
    base.init(batch(1, 60))
    assert(dt.sync() === "full")
    // id 3: en → de (image must DISAPPEAR); id 4: de → en (image must
    // APPEAR); id 6: stays en, x changes (image updated in place);
    // id 9: stays en but moves partition b → a (cross-partition move)
    base.upsert(Seq(
      (3L, "de", "b", 30L), (4L, "en", "a", 999L),
      (6L, "en", "a", 777L), (9L, "en", "a", 90L))
      .toDF("id", "lang", "part", "x"))
    assert(dt.sync() === "delta")
    val got = dt.table.read()
    assert(got.filter($"id" === 3).count() === 0, "left the filter")
    assert(got.filter($"id" === 4).select("x2")
      .head.getLong(0) === 1998L, "entered the filter")
    assert(got.filter($"id" === 6).select("x2")
      .head.getLong(0) === 1554L, "updated in place")
    assert(got.filter($"id" === 9).select("part")
      .head.getString(0) === "a", "moved partitions")
    assert(same(got, tf(base.read())))
    // deletes flow as retractions of exactly the deleted images
    base.deleteWhere(Seq("a"), $"id" <= 12)
    assert(dt.sync() === "delta")
    assert(same(dt.table.read(), tf(base.read())))
    // a vacuumed sync point cannot prove a sound delta → full
    base.append(batch(61, 90))
    base.vacuum()
    base.append(batch(91, 120))
    assert(dt.sync() === "full")
    assert(same(dt.table.read(), tf(base.read())))
  }

  test("a delta whose changes all transform away still advances the " +
    "fence") {
    val (base, dt) = mk(Files.createTempDirectory("graft_dt3").toString)
    base.init(batch(1, 30))
    dt.sync()
    base.append(batch(31, 60).filter($"lang" =!= "en")) // nothing passes
    assert(dt.sync() === "delta")
    assert(dt.table.lastCommittedBatch(s"derive:${base.root}")
      === Some(base.version))
    assert(same(dt.table.read(), tf(base.read())))
    assert(dt.sync() === "noop")
  }
}
