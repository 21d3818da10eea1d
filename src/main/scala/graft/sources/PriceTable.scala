package graft.sources

import java.nio.file.{Files, FileSystemException, StandardCopyOption}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Atomic, versioned table-of-record for symbol-partitioned prices.
  *
  * The in-place layout ([[Warehouse.upsertPrices]] /
  * [[Warehouse.deleteWherePrices]]) mutates partition directories
  * directly: a crash between the directory delete and the re-append
  * loses committed rows. The reference gets mutation atomicity for free
  * from SQLite transactions (/root/reference/app/db.py:23-30); at
  * 100 TB the equivalent is a manifest commit protocol, which this
  * class implements:
  *
  *  - Data lives in immutable write directories
  *    `root/data/<id>/symbol=.../` — never rewritten, never appended
  *    to after their commit.
  *  - A manifest file `root/manifest-NNNNNNNNNNNN.txt` maps each data
  *    dir to the partition values readers may take from it (`*` = all).
  *    Readers resolve the HIGHEST-numbered manifest; each mutation
  *    stages its new data dir first, then publishes a new manifest via
  *    write-to-temp + atomic rename.
  *
  * A crash before the rename leaves only staged (unreferenced) files:
  * readers still see the previous manifest — fully-old. After the
  * rename they see fully-new. There is no in-between, which is the
  * property [[graft.WarehouseSpec]] proves by injecting a failure at
  * the `pre-commit` failpoint. Orphaned/retired dirs are reclaimed by
  * [[vacuum]].
  *
  * Contracts: single writer (like the reference's SQLite writer);
  * partition values must not contain tab, comma, or newline (escape at
  * ingest). Scan pruning is preserved: every read applies
  * `symbol IN (...)` per data dir, which Catalyst turns into
  * PartitionFilters.
  */
final case class PriceTable(spark: SparkSession, root: String,
                            failpoint: String => Unit = _ => ()) {

  import PriceTable.{ManifestRe, Star}

  private def rootFile = new java.io.File(root)

  private def currentManifest: Option[(Long, java.io.File)] =
    Option(rootFile.listFiles()).getOrElse(Array.empty[java.io.File])
      .flatMap { f =>
        f.getName match {
          case ManifestRe(n) => Some((n.toLong, f))
          case _             => None
        }
      }.sortBy(_._1).lastOption

  /** Committed version number (0 = uninitialized). */
  def version: Long = currentManifest.map(_._1).getOrElse(0L)

  /** All committed (non-vacuumed) versions, ascending. */
  def versions: Seq[Long] =
    Option(rootFile.listFiles()).getOrElse(Array.empty[java.io.File])
      .flatMap(_.getName match {
        case ManifestRe(n) => Some(n.toLong)
        case _             => None
      }).sorted.toSeq

  private def manifestFileAt(v: Long): Option[java.io.File] = {
    val f = new java.io.File(rootFile, f"manifest-$v%012d.txt")
    if (f.isFile) Some(f) else None
  }

  /** dir → assigned partition values (Star = every partition in dir). */
  private def readManifest(): Seq[(String, Seq[String])] =
    currentManifest.map(_._2).map(parseManifest).getOrElse(Nil)

  private def parseManifest(f: java.io.File): Seq[(String, Seq[String])] =
    Files.readAllLines(f.toPath).asScala.toSeq
      .filter(_.nonEmpty).map { line =>
        val Array(dir, syms) = line.split("\t", 2)
        dir -> (if (syms == Star) Seq(Star)
                else if (syms.isEmpty) Nil
                else syms.split(",").toSeq)
      }

  /** Publish `entries` as version `base + 1`. The manifest body is
    * fully written to a temp file first, then published with a hard
    * LINK (not a rename): `link(2)` is atomic like rename, but FAILS if
    * the target exists — which is exactly the optimistic-concurrency
    * check. Two writers that both read base N race to create
    * `manifest-(N+1)`; the loser gets a
    * [[java.util.ConcurrentModificationException]] instead of silently
    * overwriting the winner's commit (POSIX rename would replace it).
    */
  private def writeManifest(entries: Seq[(String, Seq[String])],
                            base: Long): Unit = {
    val body = entries
      .filter { case (_, syms) => syms.nonEmpty }
      .map { case (d, syms) => d + "\t" + syms.mkString(",") }
      .mkString("\n")
    val tmp = new java.io.File(rootFile, s".manifest-tmp-${UUID.randomUUID()}")
    Files.writeString(tmp.toPath, body)
    failpoint("pre-commit")
    val target =
      new java.io.File(rootFile, f"manifest-${base + 1}%012d.txt").toPath
    def concurrent(): Nothing =
      throw new java.util.ConcurrentModificationException(
        s"concurrent commit: version ${base + 1} already exists under " +
          s"$root (another writer committed after this mutation read " +
          s"version $base); re-read and retry")
    try Files.createLink(target, tmp.toPath)
    catch {
      case _: java.nio.file.FileAlreadyExistsException => concurrent()
      // filesystems without hard links (some object-store mounts /
      // network FS): fall back to a no-replace atomic move — the same
      // fails-if-target-exists OCC contract, minus link(2)'s guarantee
      // against a concurrent create BETWEEN the existence check and
      // the move (single-writer-per-version remains safe; true
      // multi-writer tables belong on a link-capable filesystem)
      case _: UnsupportedOperationException | _: FileSystemException =>
        if (Files.exists(target)) concurrent()
        try Files.move(tmp.toPath, target) // no REPLACE_EXISTING: fails
        catch {                            // if the target appeared
          case _: java.nio.file.FileAlreadyExistsException => concurrent()
        }
    } finally Files.deleteIfExists(tmp.toPath)
  }

  /** Partition values actually present in a committed data dir. Spark
    * Hive-escapes special characters in partition paths (`BRK/B` →
    * `symbol=BRK%2FB`), so directory names must be UNescaped back to the
    * raw column values the manifest and the `symbol IN (...)` filters
    * speak — otherwise escaped symbols silently vanish from reads.
    */
  private def dirSymbols(rel: String): Seq[String] =
    Option(new java.io.File(s"$root/$rel").listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("symbol="))
      .map(f => org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(f.getName.stripPrefix("symbol="))).toSeq

  /** Stage rows into a fresh immutable dir; returns (relDir, symbols). */
  private def stage(rows: DataFrame, coalesceTo: Int = 0,
                    maxRecordsPerFile: Long = 0L): (String, Seq[String]) = {
    val rel = s"data/${UUID.randomUUID().toString.take(12)}"
    val shaped = if (coalesceTo > 0) rows.coalesce(coalesceTo) else rows
    val w = shaped.write.mode(SaveMode.Overwrite).partitionBy("symbol")
    (if (maxRecordsPerFile > 0L)
       w.option("maxRecordsPerFile", maxRecordsPerFile)
     else w).parquet(s"$root/$rel")
    (rel, dirSymbols(rel))
  }

  /** Remove `touched` partitions from every entry's assignment (entries
    * that kept nothing fall away in writeManifest).
    */
  private def without(entries: Seq[(String, Seq[String])],
                      touched: Set[String]): Seq[(String, Seq[String])] =
    entries.map { case (d, syms) =>
      val explicit = if (syms == Seq(Star)) dirSymbols(d) else syms
      d -> explicit.filterNot(touched)
    }

  /** Initialize (or replace) the table with `prices` as version+1. */
  def init(prices: DataFrame): Unit = {
    val base = version
    val (rel, _) = stage(prices)
    writeManifest(Seq(rel -> Seq(Star)), base)
  }

  /** Current committed snapshot. Each data dir contributes only its
    * assigned partitions (`symbol IN (...)` → PartitionFilters).
    */
  def read(): DataFrame = {
    val entries = readManifest()
    require(entries.nonEmpty, s"no committed manifest under $root")
    resolve(entries)
  }

  /** Time travel: the snapshot as of committed version `v` — data dirs
    * are immutable and superseded manifests stay on disk until
    * [[vacuum]], so every un-vacuumed version remains exactly
    * reconstructable (reproducing "the corpus the model trained on" is
    * a provenance requirement, not a luxury). After a vacuum only the
    * current version resolves.
    */
  def readVersion(v: Long): DataFrame = {
    val f = manifestFileAt(v).getOrElse(sys.error(
      s"version $v not found under $root (vacuumed or never committed); " +
        s"available: ${versions.mkString(", ")}"))
    resolve(parseManifest(f))
  }

  private def resolve(entries: Seq[(String, Seq[String])]): DataFrame =
    entries.map { case (d, syms) =>
      val df = spark.read.parquet(s"$root/$d")
      if (syms == Seq(Star)) df else df.filter(col("symbol").isin(syms: _*))
    }.reduce(_.unionByName(_))

  private def batchSymbols(batch: DataFrame): Seq[String] =
    batch.select("symbol").distinct().collect().map(_.getString(0)).toSeq

  /** Existing rows pruned to the batch's partitions. */
  def prunedExisting(batch: DataFrame): DataFrame =
    read().filter(col("symbol").isin(batchSymbols(batch): _*))

  /** `INSERT OR IGNORE`: append-only commit — a new data dir with the
    * fresh rows joins the manifest; no existing assignment changes.
    * Returns the inserted rowcount.
    */
  def insertIgnore(batch: DataFrame,
                   keys: Seq[String] = Warehouse.PriceKeys): Long = {
    val base = version
    val existing = prunedExisting(batch)
    val fresh = batch.dropDuplicates(keys)
      .join(existing.select(keys.map(col): _*), keys, "left_anti")
      .select(existing.columns.map(col): _*)
      .persist()
    val inserted = fresh.count()
    if (inserted > 0) {
      val (rel, syms) = stage(fresh)
      writeManifest(readManifest() :+ (rel -> syms), base)
    }
    fresh.unpersist(blocking = false)
    inserted
  }

  /** Keyed upsert: merge batch into its partitions' current rows, stage
    * the merged partitions as one new dir, commit a manifest where the
    * touched partitions resolve ONLY to the new dir. Untouched
    * partitions' bytes are never read or rewritten.
    */
  def upsert(batch: DataFrame,
             keys: Seq[String] = Warehouse.PriceKeys): Unit = {
    val base = version
    val existing = prunedExisting(batch)
    val merged = Relational.upsert(existing,
      batch.select(existing.columns.map(col): _*), keys)
    val touched = batchSymbols(batch).toSet
    val (rel, syms) = stage(merged)
    writeManifest(without(readManifest(), touched) :+ (rel -> syms), base)
  }

  /** Delete matching rows within the named partitions, with the
    * reference's deleted-rowcount contract. Fully-emptied partitions
    * simply leave the manifest — no stale directory, no delete-then-
    * append window.
    */
  def deleteWhere(symbols: Seq[String], cond: Column): Long = {
    val base = version
    val touched = read().filter(col("symbol").isin(symbols: _*))
    val matched = coalesce(cond, lit(false))
    val deleted = touched.filter(matched).count()
    if (deleted > 0) {
      val (rel, syms) = stage(touched.filter(!matched))
      writeManifest(without(readManifest(), symbols.toSet) :+ (rel -> syms),
        base)
    }
    deleted
  }

  /** Compact the named partitions' fragments (all when empty) into one
    * fresh dir of few, bounded files — same commit protocol, so a crash
    * mid-compaction never loses rows.
    */
  def compact(symbols: Seq[String] = Nil,
              maxRecordsPerFile: Long = 1000000L): Unit = {
    val base = version
    val all = read()
    val touched =
      if (symbols.isEmpty) all
      else all.filter(col("symbol").isin(symbols: _*))
    val touchedSet =
      if (symbols.nonEmpty) symbols.toSet
      else readManifest().flatMap { case (d, syms) =>
        if (syms == Seq(Star)) dirSymbols(d) else syms
      }.toSet
    val (rel, syms) = stage(touched,
      coalesceTo = math.max(1, spark.sparkContext.defaultParallelism / 2),
      maxRecordsPerFile = maxRecordsPerFile)
    writeManifest(without(readManifest(), touchedSet) :+ (rel -> syms),
      base)
  }

  /** Reclaim data dirs no manifest-current entry references (retired by
    * upsert/delete/compact, or orphaned by a pre-commit crash). Run
    * after readers of old snapshots have drained.
    */
  def vacuum(): Unit = {
    val live = readManifest().map(_._1.stripPrefix("data/")).toSet
    Option(new java.io.File(s"$root/data").listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && !live.contains(f.getName))
      .foreach(PriceTable.deleteRecursively)
    // drop superseded manifests (the current one stays) and any temp
    // manifest a pre-commit crash left behind. Temp manifests are
    // AGE-GATED: a fresh one may belong to a writer currently between
    // its write and its link-publish — deleting it would turn that
    // commit into a NoSuchFileException instead of a clean OCC retry
    val tmpCutoff = System.currentTimeMillis() - 60 * 60 * 1000L
    currentManifest.foreach { case (cur, _) =>
      Option(rootFile.listFiles()).getOrElse(Array.empty[java.io.File])
        .foreach { f =>
          f.getName match {
            case ManifestRe(n) if n.toLong < cur => f.delete()
            case n if n.startsWith(".manifest-tmp-")
                && f.lastModified() < tmpCutoff  => f.delete()
            case _                               => ()
          }
        }
    }
  }
}

object PriceTable {
  private val ManifestRe = "manifest-(\\d{12})\\.txt".r
  private val Star = "*"

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .foreach(deleteRecursively)
    f.delete()
  }
}
