package graft

import org.apache.spark.sql.DataFrame

/** Lifecycle registry for persisted intermediates inside query pipelines.
  *
  * Self-join pipelines (MinHash/SimHash banding, shingle Jaccard, LSH
  * near-dup) persist their shared subplan because Spark re-executes a
  * diamond plan once per consumer. A bare `.persist()` leaks: the session
  * CacheManager holds the cached plan until an explicit `unpersist`, so a
  * long-lived session accumulates orphaned partitions — at 100 TB "persist
  * the signatures" must have an owner. Pipelines register through
  * [[persist]]; the harness (Verify / Bench / a serving layer) calls
  * [[releaseAll]] after each query's terminal action.
  *
  * CONTRACT: the registry is process-global, so the library entry points
  * that persist intermediates (Dedup banding/CC, Similarity near-dup,
  * pageStats) are single-query-at-a-time: `releaseAll()` after one
  * query's terminal action unpersists any OTHER in-flight query's
  * intermediates too (correctness survives — Spark recomputes — but the
  * self-join persists are silently lost). A concurrent serving layer
  * should serialize queries through this registry or hold its own
  * lifecycle around the pipeline calls.
  */
object Caches {

  private val active =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` and register it for later release. */
  def persist(df: DataFrame): DataFrame = {
    active.add(df)
    df.persist()
  }

  /** Unpersist every registered intermediate (non-blocking: block frees
    * proceed asynchronously while the next query starts).
    */
  def releaseAll(): Unit = {
    var d = active.poll()
    while (d != null) {
      try d.unpersist(blocking = false)
      catch { case _: Throwable => () }
      d = active.poll()
    }
  }

  /** Number of currently-registered (not yet released) intermediates. */
  def activeCount: Int = active.size()
}
