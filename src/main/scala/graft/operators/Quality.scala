package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality and snapshot-management operators — the operational
  * layer around a table-of-record that the reference delegates to SQLite
  * constraints (UNIQUE keys, NOT NULL columns,
  * /root/reference/app/db.py:33-163) and we express as set-level checks
  * that scale: every check is one aggregate or one join, never a row
  * loop.
  */
object Quality {

  /** Expectation checks as a single-row relation of violation counts:
    * each (name, predicate) pair counts rows FAILING the expectation, and
    * `dupKeys` counts rows beyond the first per key (the UNIQUE-violation
    * count). One pass for the predicates + one shuffle for the key check.
    */
  def checks(df: DataFrame, expectations: Seq[(String, Column)],
             dupKeys: Seq[String]): DataFrame = {
    val base = df.agg(
      count(lit(1)).as("n_rows"),
      expectations.map { case (name, ok) =>
        count(when(!coalesce(ok, lit(false)), 1)).as(s"bad_$name")
      }: _*)
    val dups = df.groupBy(dupKeys.map(col): _*)
      .agg(count(lit(1)).as("_c"))
      .agg(coalesce(sum(col("_c") - 1), lit(0L)).as("dup_keys"))
    base.crossJoin(dups) // two single-row frames
  }

  /** Per-row violation tags for a rule set: `violations` is the
    * comma-joined names of every FAILED expectation, in declared rule
    * order (deterministic), empty string for a clean row. A predicate
    * evaluating to null FAILS its rule — an unparseable field is
    * exactly what an expectation exists to catch, so null must not
    * slip through as "not false". This is the row-level half of
    * [[checks]]: where checks counts violations for the dashboard,
    * this tags them for routing.
    */
  def withViolations(df: DataFrame,
                     rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "expectation gate needs at least one rule")
    df.withColumn("violations", concat_ws(",",
      rules.map { case (name, ok) =>
        when(!coalesce(ok, lit(false)), lit(name))
      }: _*))
  }

  /** Split a batch at the expectation gate: (clean rows unchanged,
    * quarantined rows carrying their `violations` tags). The
    * production contract a drop-only gate misses: rejects are DATA —
    * they carry the evidence for fixing the rule or the upstream
    * parser, and they re-ingest after the fix. One pass, no shuffle;
    * both sides stay lazily derived from the same tagged frame.
    */
  def quarantineSplit(df: DataFrame, rules: Seq[(String, Column)])
      : (DataFrame, DataFrame) = {
    val tagged = withViolations(df, rules)
    (tagged.filter(col("violations") === "").drop("violations"),
      tagged.filter(col("violations") =!= ""))
  }

  /** Referential-integrity audit for one declared FK edge — the
    * relationship test a warehouse runs where the reference delegates
    * to SQLite `FOREIGN KEY` constraints (app/db.py:33-163): one row of
    * (relationship, n_child, n_orphan, orphan_ppm). The parent key set
    * is distinct-reduced first (dim-sized → broadcast join; the child
    * side never shuffles at dim-sized parents), orphans counted via a
    * left-join null probe in the same pass as the child count, and the
    * share reported in exact integer ppm (engine-independent — no
    * double division).
    */
  def fkAudit(relationship: String, child: DataFrame, childKey: Column,
              parent: DataFrame, parentKey: Column): DataFrame =
    child.select(childKey.as("k"))
      .join(parent.select(parentKey.as("k")).distinct()
        .withColumn("_hit", lit(1)), Seq("k"), "left")
      .agg(count(lit(1)).as("n_child"),
        coalesce(sum(when(col("_hit").isNull, 1L)), lit(0L))
          .as("n_orphan"))
      .select(lit(relationship).as("relationship"),
        col("n_child"), col("n_orphan"),
        expr("n_orphan * 1000000 div n_child").as("orphan_ppm"))

  /** Population Stability Index between two corpus snapshots, per
    * stratum: `psi_s = (p_new − p_old) · ln(p_new / p_old)` with the
    * total PSI being the sum over strata — the standard drift alarm
    * (PSI < 0.1 stable, > 0.25 investigate) run between crawl
    * increments or corpus versions before a mixture is retrained on.
    * Two strata-sized aggregates + one broadcastable join; a stratum
    * absent from either side contributes a null psi row (the caller
    * decides how to score novel/vanished strata — no epsilon smoothing
    * is silently applied).
    */
  def populationStability(oldDf: DataFrame, newDf: DataFrame,
                          stratum: Column): DataFrame = {
    def dist(df: DataFrame, p: String): DataFrame = {
      val c = df.groupBy(stratum.as("stratum"))
        .agg(count(lit(1)).as("_n"))
      c.crossJoin(broadcast(c.agg(sum(col("_n")).as("_t"))))
        .select(col("stratum"),
          (col("_n").cast("double") / col("_t")).as(p))
    }
    dist(oldDf, "p_old")
      .join(dist(newDf, "p_new"), Seq("stratum"), "full_outer")
      .withColumn("psi",
        round((col("p_new") - col("p_old")) *
          log(col("p_new") / col("p_old")), 6))
      .select(col("stratum"), round(col("p_old"), 6).as("p_old"),
        round(col("p_new"), 6).as("p_new"), col("psi"))
  }

  /** CDC-style diff of two keyed snapshots: every key classified as
    * added / removed / changed / unchanged via one full-outer join.
    * `compareCols` define "changed" (null-safe equality on each).
    */
  def diffSnapshots(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                    compareCols: Seq[String]): DataFrame = {
    val o = oldDf.select((keys ++ compareCols).map(col): _*)
      .withColumn("_old", lit(1))
    val n = newDf.select((keys ++ compareCols).map(col): _*)
      .toDF(keys ++ compareCols.map("_n_" + _): _*)
      .withColumn("_new", lit(1))
    val joined = o.join(n, keys, "full_outer")
    val changed = compareCols
      .map(c => !(col(c) <=> col(s"_n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    joined.withColumn("status",
      when(col("_old").isNull, lit("added"))
        .when(col("_new").isNull, lit("removed"))
        .when(changed, lit("changed"))
        .otherwise(lit("unchanged")))
      .select(keys.map(col) :+ col("status"): _*)
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic per key — the
    * continuous-distribution sibling of [[populationStability]] (PSI
    * bins categorically; KS compares whole empirical CDFs, catching a
    * variance blow-up PSI's coarse strata can miss). Each key's rows
    * split at the integer midpoint of its own time span (earlier half
    * vs later half — exact integer arithmetic, so the side assignment
    * is engine-identical), values quantize to integer cents, and
    * `KS = max_v |CDF_a(v) − CDF_b(v)|` walks the per-key DISTINCT
    * value cells — never the raw rows: the window input is the
    * (key, cent) aggregate, so a key with 10⁹ ticks but 10⁴ distinct
    * prices sorts 10⁴ cells. Each CDF ratio is one exact-long →
    * double division; sub/abs/max over identical doubles is
    * bit-identical in any engine, rounded once at the end. Per-key
    * windows — parallel across keys, no global sort anywhere.
    *
    * Output: `key, n_a, n_b, ks` — null ks when either side is empty
    * (single-row keys land entirely in the later half).
    */
  def ksDrift(events: DataFrame, key: String, ts: Column,
              value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = events.select(col(key).as("_k"), unix_micros(ts).as("_us"),
      round(value * 100).cast("long").as("_vc"))
    val bounds = base.groupBy(col("_k"))
      .agg(min(col("_us")).as("_lo"), max(col("_us")).as("_hi"))
    val cells = base.join(broadcast(bounds), "_k")
      .withColumn("_a", (col("_us") - col("_lo")) * 2 < col("_hi") - col("_lo"))
      .groupBy(col("_k"), col("_vc"))
      .agg(sum(when(col("_a"), 1L).otherwise(0L)).as("_na"),
        sum(when(col("_a"), 0L).otherwise(1L)).as("_nb"))
    val cum = Window.partitionBy("_k").orderBy(col("_vc").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = Window.partitionBy("_k")
    cells
      .withColumn("_ca", sum(col("_na")).over(cum))
      .withColumn("_cb", sum(col("_nb")).over(cum))
      .withColumn("_ta", sum(col("_na")).over(tot))
      .withColumn("_tb", sum(col("_nb")).over(tot))
      // ANSI mode errors on ANY zero divisor (doubles included):
      // compute the CDF gap only where both sides are populated — the
      // degenerate key's ks is null via the output guard anyway
      .withColumn("_d",
        when(col("_ta") > 0 && col("_tb") > 0,
          abs(col("_ca").cast("double") / col("_ta").cast("double") -
            col("_cb").cast("double") / col("_tb").cast("double"))))
      .groupBy(col("_k").as(key))
      .agg(max(col("_ta")).as("n_a"), max(col("_tb")).as("n_b"),
        max(col("_d")).as("_ks"))
      .withColumn("ks",
        when(col("n_a") > 0 && col("n_b") > 0, round(col("_ks"), 6)))
      .select(col(key), col("n_a"), col("n_b"), col("ks"))
  }

  /** Two-sample Mann–Whitney U drift per key — the RANK-based sibling
    * of [[ksDrift]] with the same early-half/late-half split: KS
    * reacts to the largest single CDF gap, U to a systematic
    * location shift across the whole distribution (a small persistent
    * drift every quantile moves U far off its null mean while the max
    * CDF gap stays modest). Standard tie handling: each tied pair
    * contributes ½.
    *
    * Exactness: `2U = Σ_cells na·2·(#late-below) + na·nb` is a pure
    * integer accumulated per DISTINCT value cell (never raw rows —
    * the [[ksDrift]] cell discipline), and the tie-corrected normal
    * approximation `z = (U − n_a·n_b/2) / σ` with
    * `σ² = n_a·n_b/12 · ((n+1) − Σ(t³−t)/(n(n−1)))` is one
    * fixed-order double expression over exact integer inputs. Per-key
    * windows over the cell relation — parallel across keys, no global
    * sort.
    *
    * Output: `key, n_a, n_b, u, z` — null u/z when either side is
    * empty or the tie-corrected variance degenerates (all values
    * identical).
    */
  def mannWhitneyDrift(events: DataFrame, key: String, ts: Column,
                       value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = events.select(col(key).as("_k"), unix_micros(ts).as("_us"),
      round(value * 100).cast("long").as("_vc"))
    val bounds = base.groupBy(col("_k"))
      .agg(min(col("_us")).as("_lo"), max(col("_us")).as("_hi"))
    val cells = base.join(broadcast(bounds), "_k")
      .withColumn("_a", (col("_us") - col("_lo")) * 2 < col("_hi") - col("_lo"))
      .groupBy(col("_k"), col("_vc"))
      .agg(sum(when(col("_a"), 1L).otherwise(0L)).as("_na"),
        sum(when(col("_a"), 0L).otherwise(1L)).as("_nb"))
    val cum = Window.partitionBy("_k").orderBy(col("_vc").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val naD = col("n_a").cast("double")
    val nbD = col("n_b").cast("double")
    val nD = (col("n_a") + col("n_b")).cast("double")
    cells
      .withColumn("_cb", sum(col("_nb")).over(cum))
      // 2U per cell: below-late pairs count 2, tied pairs count 1
      .withColumn("_u2c",
        col("_na") * (col("_cb") - col("_nb")) * 2 +
          col("_na") * col("_nb"))
      .withColumn("_t", col("_na") + col("_nb"))
      .groupBy(col("_k").as(key))
      .agg(sum(col("_na")).as("n_a"), sum(col("_nb")).as("n_b"),
        sum(col("_u2c")).as("_u2"),
        sum(col("_t") * col("_t") * col("_t") - col("_t")).as("_tc"))
      .withColumn("_u", col("_u2").cast("double") / 2.0)
      .withColumn("_m", naD * nbD / 2.0)
      .withColumn("_s2",
        when(col("n_a") > 0 && col("n_b") > 0 && nD > 1,
          naD * nbD / 12.0 *
            ((nD + 1.0) - col("_tc").cast("double") / (nD * (nD - 1.0)))))
      .withColumn("u",
        when(col("n_a") > 0 && col("n_b") > 0, round(col("_u"), 6)))
      .withColumn("z",
        when(col("_s2") > 0,
          round((col("_u") - col("_m")) / sqrt(col("_s2")), 6)))
      .select(col(key), col("n_a"), col("n_b"), col("u"), col("z"))
  }

  /** ANALYZE-style numeric column profile — the statistics row a
    * warehouse keeps per column (non-null count, null count, min/max,
    * distinct count) and a cost-based planner or a data-quality
    * monitor reads before touching the data. One row out per profiled
    * column.
    *
    * Plan: ONE wide aggregate pass over the table (Spark plans the
    * multi-column distinct counts through a single expand — k columns
    * cost a k-fold row expansion of one scan, not k scans), then a
    * driver-free explode of the 1-row result into per-column rows.
    * The distinct counts here are EXACT (what the DuckDB oracle can
    * mirror); at 100 TB the same shape runs with the mergeable
    * deterministic HLL ([[graft.operators.Aggregates]] a14) in place
    * of `countDistinct` — the sketch is the scale path, exactness is
    * the verification path.
    */
  def profileNumeric(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profileNumeric needs at least one column")
    val aggs = columns.flatMap { c =>
      Seq(count(col(c)).as(s"_n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_nn_$c"),
        min(col(c)).cast("double").as(s"_mn_$c"),
        max(col(c)).cast("double").as(s"_mx_$c"),
        countDistinct(col(c)).as(s"_nd_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = columns.map { c =>
      struct(lit(c).as("col_name"),
        col(s"_n_$c").as("n"),
        col(s"_nn_$c").as("n_null"),
        col(s"_mn_$c").as("min_v"),
        col(s"_mx_$c").as("max_v"),
        col(s"_nd_$c").as("ndv"))
    }
    row.select(explode(array(entries: _*)).as("_p")).select(col("_p.*"))
  }
}
