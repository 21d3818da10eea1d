package graft

import org.scalatest.funsuite.AnyFunSuite

/** Global plan regression guard: no registered query may silently plan a
  * cartesian product or an unbounded nested-loop join — the two shapes
  * that are survivable at sf0.01 and fatal at 100 TB. Queries that
  * deliberately cross-join a broadcast single row (an ANN query vector,
  * a global-stats row) are allowlisted explicitly.
  */
class PlanAuditSpec extends AnyFunSuite {
  import TestSpark.spark

  /** Plan with AQE OFF for the audit: `AdaptiveSparkPlanExec` is a
    * LEAF to `TreeNode.collect` (the inner plan lives in a field, not
    * in `children`), so pattern-matching `WindowExec` under an AQE
    * wrapper silently matches nothing and the guard passes vacuously.
    * The audit inspects static plan SHAPE — partitioning of windows,
    * duplicate frames, join strategy — which AQE only refines at
    * runtime, so auditing the non-adaptive plan is both correct and
    * strictly stricter.
    */
  private def audited[A](body: => A): A = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  // deliberate bounded cross joins: a broadcast single row (ANN query
  // vector, global-stats row, histogram bounds) or a generator's
  // watchlist × point-range product (s9: both sides literal-sized)
  private val singleRowCross = Set(
    "n1_ann_topk", "n3_ann_lsh", "n6_ivf_partitioned", "p4_coach_prompt",
    "a5_histogram", "s9_seed_prices", "u9_quality_checks",
    "n8_ann_recall", // exact-baseline cross: 8 broadcast query rows
    "n12_pq_topk",   // same harness: 8 broadcast query rows vs codes
    "n16_pq_residual_recall", // same harness: 8 broadcast query rows
    "n13_ivfpq_topk", // IVFADC: 1 broadcast query row vs pruned cells
    "t12_tfidf",     // corpus-size: broadcast 1-row aggregate
    "t17_unigram_logprob", // corpus-total: broadcast 1-row aggregate
    "n10_hybrid_rrf",      // query-vector: broadcast 1 row
    "t18_quality_deciles", // corpus-total: broadcast 1-row aggregate
    "a14_hll_distinct",    // exact-count: broadcast 1 row beside 1 row
    "st5_hll_stream",      // same shape: 1-row estimate beside 1 row
    "g1_pagerank",         // dangling mass: broadcast 1-row aggregate
    "g2_trustrank",        // same shape: broadcast 1-row dangling row
    "t21_bigram_logprob",  // vocab size: broadcast 1-row aggregate
    "t38_backoff_logprob", // train (N,|V|): broadcast 1-row aggregate
    "n22_index_drift",     // PSI sides + total: broadcast 1-row aggs
    "d17_lsh_tuning",      // argmin: broadcast 1-row aggregate
    "t28_drift_psi",       // per-side totals: broadcast 1-row aggregates
    "u1g_data_card",       // 1-row card × 1-row mix × 1-row total
    "t30_stratified_quality_keep", // corpus-total: broadcast 1-row agg (t17's scorer)
    "n18_bm25_rank",       // corpus stats (N, avgdl): broadcast 1-row agg
    "t33_pmi_collocations", // token/pair totals: broadcast 1-row aggs
    "n19_inverted_index",   // doc-count gate: broadcast 1-row agg
    "n21_knn_classify",     // kNN probe: 3 broadcast query rows
    "g5_hits",              // L1 renorm: broadcast 1-row totals
    "a26_welch_t",          // rest-of-corpus: broadcast 1-row totals
    "u13_benford",          // digit-share total: broadcast 1-row agg
    "n24_mmr_diversify",    // 1 broadcast query row + topN×topN pairs
    "t41_snm_recall",       // exact-pair total: broadcast 1-row agg
    "t42_family_recall",    // 1-row family agg × 1-row closure agg
    "t43_sampled_family_recall") // t42's aggs × 1-row sample-size agg

  test("no query plans a cartesian or unbounded nested-loop join") {
    val dir = "/root/testdata/sf0.001"
    val offenders = audited { SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      // plan-only: building the DataFrame never executes the query, but
      // a handful of queries run side-effecting setup (file writes,
      // streaming) inside the builder — they still only PLAN the
      // returned frame here
      val plan =
        try SparkEntry.queries(name)(spark, dir)
          .queryExecution.executedPlan.toString
        catch { case e: Throwable => s"PLANNING FAILED: ${e.getMessage}" }
      graft.Caches.releaseAll()
      val bad =
        plan.contains("CartesianProduct") ||
          (plan.contains("BroadcastNestedLoopJoin") &&
            !singleRowCross.contains(name)) ||
          plan.startsWith("PLANNING FAILED")
      if (bad) Some(name) else None
    } }
    assert(offenders.isEmpty, s"scale-unsafe plans: $offenders")
  }

  test("no Window operator repeats a frame aggregate pathologically") {
    // window expressions are extracted per TEXTUAL occurrence — Spark
    // does not dedupe them — so inlining a windowed column into k
    // downstream formulas runs k running aggregates where 1 suffices
    // (caught live: Bollinger planned 38 frames for 6 distinct ones,
    // 3× the runtime). A small surplus is inherent (e.g. the SMA's
    // count guard + divisor); a large one means an operator should
    // stage its window attributes with withColumn before referencing
    // them. The bound is per-query, canonicalized-distinct.
    val dir = "/root/testdata/sf0.001"
    val report = audited { SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val dups =
        try SparkEntry.queries(name)(spark, dir)
          .queryExecution.executedPlan.collect {
            case w: org.apache.spark.sql.execution.window.WindowExec =>
              val canon = w.windowExpression.map {
                case a: org.apache.spark.sql.catalyst.expressions.Alias =>
                  a.child.canonicalized
                case e => e.canonicalized
              }
              canon.size - canon.distinct.size
          }.sum
        catch { case _: Throwable => 0 } // planning failures: first guard's job
      graft.Caches.releaseAll()
      if (dups > 0) Some(name -> dups) else None
    } }
    val offenders = report.filter(_._2 > 3)
    assert(offenders.isEmpty,
      s"pathological duplicate window frames: $offenders — stage the " +
        "windowed columns once (withColumn) before the formulas that " +
        s"reference them. Full surplus report: $report")
  }

  test("no query plans an unpartitioned (single-task) Window") {
    val dir = "/root/testdata/sf0.001"
    val offenders = audited { SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      // a query that fails to PLAN is an offender too — swallowing the
      // failure would report the most-broken queries as window-clean
      val bad =
        try SparkEntry.queries(name)(spark, dir)
          .queryExecution.executedPlan.collect {
            case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty => w.toString
            case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
              if w.partitionSpec.isEmpty => w.toString
          }
        catch { case e: Throwable => Seq(s"PLANNING FAILED: ${e.getMessage}") }
      graft.Caches.releaseAll()
      if (bad.nonEmpty) Some(name) else None
    } }
    assert(offenders.isEmpty,
      s"single-task global Window in: $offenders — the whole ordered " +
        "stream funnels through one partition at scale")
  }

  test("every query output is driver-checkable: no array/map/struct columns") {
    // the driver's pandas checker hashes scalar cells only — an
    // array-typed output column dies in its sort_values (caught live:
    // n19's postings list shipped a red correctness row in r9 that no
    // local gate saw). Nested values must be flattened at the query
    // boundary (array_join / to_json); the operator APIs underneath
    // may keep their natural nested shapes.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val bad =
        try SparkEntry.queries(name)(spark, dir).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
              f.dataType.isInstanceOf[MapType] ||
              f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }.toSeq
        catch { case e: Throwable =>
          Seq(s"$name: schema unavailable (${e.getMessage})") }
      graft.Caches.releaseAll()
      bad
    }
    assert(offenders.isEmpty,
      s"non-scalar query outputs (driver cannot hash them): $offenders")
  }
}
