package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join: when one join key carries a disproportionate
  * share of the fact rows, a plain shuffle join puts that key's entire
  * volume on one task. Salting splits each fact row across `buckets`
  * sub-keys and replicates the (small-ish) build side once per bucket,
  * so the hot key fans out over `buckets` tasks.
  *
  * AQE's skew-join handling (on by default) covers sort-merge joins at
  * runtime; explicit salting remains the tool for hash-partitioned
  * aggregations and for engines-of-record where the skew is known ahead
  * of time. The salt is derived from a caller-supplied row-level column
  * (deterministic, e.g. a row id) so results are reproducible.
  */
object Skew {

  /** Equi-join `fact ⋈ dim` on `keys`, salted into `buckets` sub-keys.
    * `saltSource` must be a fact-side column that varies per row (a row
    * id); dim rows are replicated `buckets` times.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 saltSource: Column, buckets: Int,
                 joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val salted = fact.withColumn("_salt", pmod(hash(saltSource),
      lit(buckets)))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Salted aggregation: two-phase groupBy for heavy keys — partial
    * aggregate on (key, salt), then final aggregate on key. `partial`
    * and `merge` must form an associative pair (e.g. sum/sum,
    * count/sum). The generic shape; Spark's own hash aggregate already
    * does map-side partials, so use this only when a single reducer key
    * still overflows (extreme skew).
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: Column,
                saltSource: Column, buckets: Int,
                resultName: String): DataFrame = {
    val salted = df.withColumn("_salt", pmod(hash(saltSource),
      lit(buckets)))
    salted.groupBy((keys :+ "_salt").map(col): _*)
      .agg(sum(valueCol).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as(resultName))
  }
}
