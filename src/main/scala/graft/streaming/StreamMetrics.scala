package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** Observability counters for the monotone (ts, id) gates.
  *
  * [[IndicatorStream]] and [[AnomalyStream]] DROP late rows by design
  * (deterministic monotone processing) — correct, but silent: an
  * upstream feed that starts delivering out of order would quietly
  * lose data with no signal anywhere. Each stream registers a named
  * `LongAccumulator` (`graft.late_rows.<name>`) and increments it at
  * the gate, so the drop volume is visible in the Spark UI / metrics
  * sink and assertable in tests via [[lateRows]].
  *
  * Accumulator semantics apply: task retries can re-add (an
  * AT-LEAST-ONCE observability count, never part of an answer), and
  * counters are per SparkContext — keys include the applicationId so
  * a restarted session gets a fresh counter rather than a handle into
  * a stopped context.
  */
object StreamMetrics {

  private val counters =
    new java.util.concurrent.ConcurrentHashMap[String, LongAccumulator]()

  /** The late-row drop counter for `name` (conventionally the stream's
    * checkpoint dir, which is unique per running query), created on
    * first use.
    */
  def lateRows(spark: SparkSession, name: String): LongAccumulator =
    counters.computeIfAbsent(
      spark.sparkContext.applicationId + ":" + name,
      _ => spark.sparkContext.longAccumulator(s"graft.late_rows.$name"))
}
