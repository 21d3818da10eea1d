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
}
