package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for every suite (sbt forks a single test JVM;
  * re-creating sessions per suite dominates test wall-clock otherwise).
  */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tests")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    .config("spark.ui.enabled", "false")
    // plan-string rendering is billed on EVERY action (the SQL
    // listener event; AQE re-posts per stage): "simple" renders the
    // bare tree instead of formatted per-node detail — observed 18
    // driver-minutes of tree-regex rendering at sf10 without it
    .config("spark.sql.ui.explainMode", "simple")
    .getOrCreate()

  spark.sparkContext.setLogLevel("ERROR")
}
