package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.GraftFunctions

/** Codegen/interpreted parity for the kernel expressions.
  *
  * Round 10 moved every sketch expression off `CodegenFallback` onto
  * the [[graft.expressions.KernelCodegen]] reference-call bridge, so
  * the generated path now exists and must produce bit-identical
  * results to `nullSafeEval` — including kernel-level nulls (the
  * short-vector degrade in the ANN cells) and non-scalar outputs
  * (arrays, the term-count map, the int8 quantize struct). The oracle
  * harness only ever runs one mode; this spec runs BOTH and diffs.
  */
class KernelCodegenSpec extends AnyFunSuite {
  import TestSpark.spark

  private val WS = "spark.sql.codegen.wholeStage"
  private val FM = "spark.sql.codegen.factoryMode"

  private def inMode[A](codegen: Boolean)(body: => A): A = {
    val ws0 = spark.conf.get(WS, "true")
    val fm0 = spark.conf.get(FM, "FALLBACK")
    spark.conf.set(WS, codegen.toString)
    spark.conf.set(FM, if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN")
    try body
    finally { spark.conf.set(WS, ws0); spark.conf.set(FM, fm0) }
  }

  private def rows(df: => DataFrame, codegen: Boolean): Seq[String] =
    inMode(codegen) { df.collect().toSeq.map(_.toString) }

  private lazy val docs = {
    GraftFunctions.register(spark)
    // no .cache(): DedupSpec's lifecycle guard asserts the shared
    // session ends with zero persistent RDDs
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(64)
  }
  private lazy val vecs =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(64)

  private def check(name: String)(df: => DataFrame): Unit = {
    val interp = rows(df, codegen = false)
    val gen = rows(df, codegen = true)
    assert(interp == gen, s"$name: codegen != interpreted")
    assert(interp.nonEmpty, s"$name: vacuous (no rows)")
  }

  test("text kernels: codegen == interpreted") {
    check("text sketches") {
      docs.select(col("doc_id"),
        call_function("graft_minhash_sig", col("text"), lit(16)),
        call_function("graft_simhash_bits", col("text"), lit(32)),
        call_function("graft_shingle_hashes60", col("text"), lit(3)),
        call_function("graft_dup_structure", col("text")),
        call_function("graft_top_shingle", col("text"), lit(2)),
        call_function("graft_text_stats", col("text")),
        call_function("graft_word_hits", col("text"),
          array(lit("the"), lit("a"), lit("of"))),
        call_function("graft_term_counts", col("text")),
        // merge spec: pairs "left\u001Eright" joined by \u001D
        call_function("graft_bpe_encode", col("text"),
          lit("theand")),
        call_function("graft_registered_domain",
          concat(lit("s"), col("doc_id"), lit(".example.co.uk"))))
        .orderBy("doc_id")
    }
  }

  test("vector kernels: codegen == interpreted, incl. null degrade") {
    check("vector sketches") {
      val short = vecs.withColumn("emb",
        // one short vector exercises the kernel-null path under codegen
        when(col("vec_id") === vecs.agg(min("vec_id")).head().getLong(0),
          slice(col("embedding"), 1, 2)).otherwise(col("embedding")))
      short.select(col("vec_id"),
        call_function("graft_dot", col("emb"), col("emb")),
        call_function("graft_l2_normalize", col("emb")),
        call_function("graft_lsh_bucket", col("emb"), lit(8), lit(8)),
        call_function("graft_ivf_cell", col("emb"), lit(4), lit(8)),
        call_function("graft_ivf_cell_at", col("emb"),
          typedLit(Array.tabulate(16)(i => i * 0.25 - 2.0)), lit(8)),
        call_function("graft_quantize_int8", col("emb")))
        .orderBy("vec_id")
    }
  }

  test("kernel expressions no longer split whole-stage codegen spans") {
    GraftFunctions.register(spark)
    // AQE off for the shape check: an unexecuted AdaptiveSparkPlan
    // prints without codegen stars (same rationale as PlanAuditSpec)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    // `*(N)` is the whole-stage-codegen span marker in the plan's
    // simpleString; under CodegenFallback the Project/Filter pair
    // printed un-starred
    val plan = docs.select(
        call_function("graft_text_stats", col("text")).as("s"))
      .filter(element_at(col("s"), 1) > 0)
      .queryExecution.executedPlan.toString
    val starred = "\\*\\(\\d+\\) (Project|Filter)".r
    assert(starred.findAllIn(plan).size >= 2,
      s"expected a fused span (starred Project+Filter), got:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("broken nullability contract fails fast IDENTICALLY in both modes") {
    // a kernel that returns null while declaring nullable = false has
    // broken its own invariant; the bridge must surface that the same
    // way under codegen and interpretation (not NPE vs silent null)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_test_bad_kernel",
      es => KernelCodegenSpec.BadKernel(es.head), "scala_udf")
    def msg(codegen: Boolean): String =
      inMode(codegen) {
        intercept[Exception] {
          spark.range(3)
            .select(call_function("graft_test_bad_kernel", col("id")))
            .collect()
        }
      }.getMessage
    val interp = msg(codegen = false)
    val gen = msg(codegen = true)
    for (m <- Seq(interp, gen))
      assert(m.contains("kernel returned null on non-nullable"), m)
  }
}

object KernelCodegenSpec {
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.types.{DataType, LongType}

  /** Test-only invariant breaker: declares non-nullable, emits null. */
  final case class BadKernel(child: Expression)
      extends graft.expressions.UnaryKernelCodegen {
    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    override protected def nullSafeEval(input: Any): Any = null
    override protected def withNewChildInternal(c: Expression): BadKernel =
      copy(child = c)
    override def prettyName: String = "graft_test_bad_kernel"
  }
}
