package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical table layout for the engine's tables-of-record — the piece
  * the reference delegates to a single SQLite file
  * (/root/reference/app/db.py:23-30) and we design for a cluster:
  *
  *  - `prices` partitioned by `symbol`: every per-symbol query (the
  *    dominant access path — quotes, series analytics, watchlist) prunes
  *    to one directory; ingest appends only to the touched partitions.
  *  - fact tables bucketed by join key: co-located, shuffle-free joins
  *    between tables bucketed on the same key/count (requires the
  *    catalog, i.e. `saveAsTable`).
  *
  * At 100 TB: symbol-partitioning bounds any single query's scan to its
  * key's share; bucketing removes the fact-to-fact shuffle entirely.
  */
object Warehouse {

  /** Write `prices` partitioned by symbol. */
  def writePrices(prices: DataFrame, root: String,
                  mode: SaveMode = SaveMode.Overwrite): Unit =
    prices.write.mode(mode).partitionBy("symbol")
      .parquet(s"$root/prices")

  def readPrices(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/prices")

  /** Register a bucketed table-of-record (catalog-backed; both sides of
    * a co-located join must share bucket column and count).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)
}
