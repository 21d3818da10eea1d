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
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read
      .parquet("/root/testdata/sf0.1/documents.parquet")

    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
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
