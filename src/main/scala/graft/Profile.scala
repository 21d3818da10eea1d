package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipelines.Dedup

/** Ad-hoc stage profiler for the dedup pipeline hot path. */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // plan-string rendering is billed on EVERY action (the SQL
      // listener event; AQE re-posts per stage): "simple" renders the
      // bare tree instead of formatted per-node detail — observed 18
      // driver-minutes of tree-regex rendering at sf10 without it
      .config("spark.sql.ui.explainMode", "simple")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read
      .parquet("/root/testdata/sf0.1/documents.parquet")

    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    if (args.headOption.contains("t39count")) {
      // pair-count / density check of the SNM answer at a given dir
      val dir = args.lift(1).getOrElse("/root/repo/.scaledata/sf10")
      val d = spark.read.parquet(s"$dir/documents.parquet")
      val keyed = d.select(col("doc_id"),
          substring(regexp_replace(col("text"), "[^ -~]", ""), 1, 24)
            .as("key"))
        .filter(length(col("key")) >= 8)
      val recs = keyed.groupBy("key").agg(min(col("doc_id")).as("id"))
        .select(col("id"), substring(col("key"), 1, 4).as("block"),
          col("key"))
      val nKeys = recs.count()
      val nPairs = graft.pipelines.TextAnalysis
        .sortedNeighborPairsMultiPass(recs, maxDist = 8, window = 32,
          SparkEntry.snmPassKeys) // the SHIPPED dial, not a re-spelling
        .count()
      println(s"KEYS=$nKeys PAIRS=$nPairs perKey=${nPairs.toDouble/nKeys}")
      spark.stop()
      return
    }
    if (args.headOption.contains("t39")) {
      // stage profile of the multi-pass SNM ER query at a given dir
      val dir = args.lift(1).getOrElse("/root/repo/.scaledata/sf1.0")
      val d = spark.read.parquet(s"$dir/documents.parquet")
      val keyed = d.select(col("doc_id"),
          substring(regexp_replace(col("text"), "[^ -~]", ""), 1, 24)
            .as("key"))
        .filter(length(col("key")) >= 8)
      val distinctKeys = keyed.groupBy("key").agg(
        min(col("doc_id")).as("id"), count(lit(1)).as("n_ids"))
      val recs = distinctKeys.select(col("id"),
        substring(col("key"), 1, 4).as("block"), col("key"))
      time("distinct_keys")(distinctKeys)
      def pairs = graft.pipelines.TextAnalysis
        .sortedNeighborPairsMultiPass(recs, maxDist = 8, window = 32,
          SparkEntry.snmPassKeys) // the SHIPPED dial, not a re-spelling
      time("snm_3pass")(pairs)
      graft.Caches.releaseAll()
      time("pass1_only")(graft.pipelines.TextAnalysis
        .sortedNeighborPairs(recs, maxDist = 8, window = 32))
      graft.Caches.releaseAll()
      val full = pairs
        .join(distinctKeys.select(col("id").as("id_a"),
          col("n_ids").as("n_a")), "id_a")
        .join(distinctKeys.select(col("id").as("id_b"),
          col("n_ids").as("n_b")), "id_b")
        .select(col("id_a"), col("id_b"), col("dist"),
          col("n_a"), col("n_b"))
      time("with_mult_join")(full)
      graft.Caches.releaseAll()
      time("full_repart1")(full.repartition(1)
        .sortWithinPartitions("id_a", "id_b"))
      graft.Caches.releaseAll()
      spark.stop()
      return
    }
    if (args.headOption.contains("gate")) {
      // quality-gate component profile: which expression pays for what
      graft.expressions.GraftFunctions.register(spark)
      val t = col("text")
      time("gate_full")(
        graft.pipelines.TextAnalysis.qualityRules(docs, t))
      time("gate_full_warm")(
        graft.pipelines.TextAnalysis.qualityRules(docs, t))
      time("text_counts")(docs.select(
        graft.pipelines.TextAnalysis.textCounts(t).as("st")))
      time("word_hits")(docs.select(graft.pipelines.TextAnalysis
        .wordHits(t, graft.pipelines.TextAnalysis.Stopwords).as("sh")))
      time("dup_structure")(docs.select(
        call_function("graft_dup_structure", t).as("ds")))
      time("top_shingle")(docs.select(
        call_function("graft_top_shingle", t, lit(2)).as("tb")))
      time("shingle_hashes")(docs.select(
        call_function("graft_shingle_hashes60", t, lit(3)).as("hs")))
      time("line_regexes")(docs.select(
        size(regexp_extract_all(
          regexp_replace(t, "[\\r\\u0085\\u2028\\u2029]", ""),
          lit("(?m)^[ \\t]*[-*•]"), lit(0))).as("b"),
        size(regexp_extract_all(
          regexp_replace(t, "[\\r\\u0085\\u2028\\u2029]", ""),
          lit("(?m)(\\.\\.\\.|…)$"), lit(0))).as("e"),
        size(regexp_extract_all(t,
          lit("[^ \\t\\n\\r\\f\\x0B]*[A-Za-z][^ \\t\\n\\r\\f\\x0B]*"),
          lit(0))).as("a"),
        size(regexp_extract_all(t, lit("#|\\.\\.\\.|…"), lit(0)))
          .as("s")))
      spark.stop()
      return
    }
    time("scan")(docs.select("doc_id", "text"))
    time("words")(docs.select(Dedup.words(col("text")).as("w")))
    time("shingles")(docs.select(Dedup.shingles(col("text")).as("s")))
    time("shingleHashes")(docs.select(Dedup.shingleHashes(col("text")).as("h")))
    time("sig_twostep")(docs
      .select(col("doc_id"), Dedup.shingleHashes(col("text")).as("_hs"))
      .select(col("doc_id"), Dedup.minhashFromHashes(col("_hs"), 8).as("sig")))
    val t0 = System.nanoTime()
    val plan = docs
      .select(col("doc_id"), Dedup.shingleHashes(col("text")).as("_hs"))
      .select(col("doc_id"), Dedup.minhashFromHashes(col("_hs"), 8).as("sig"))
      .queryExecution.executedPlan
    println(f"planning only          ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    println(plan.toString.take(2500))
    spark.stop()
  }
}
