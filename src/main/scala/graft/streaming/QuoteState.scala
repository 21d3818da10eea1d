package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ST1/A6 as a *stateful* stream: the reference recomputes watchlist
  * quote deltas by re-querying the top-2 rows every 15 s poll
  * (/root/reference/static/main.js:554-570); with
  * `mapGroupsWithState` the previous quote lives in the state store, so
  * each micro-batch emits deltas incrementally — per-key state is O(1)
  * and partitioned by symbol, which scales to any watchlist size.
  */
object QuoteState {

  case class Quote(symbol: String, price: Double, asOf: Timestamp)
  case class LastQuote(price: Double, asOf: Timestamp)
  case class QuoteUpdate(symbol: String, price: Double,
                         delta: Option[Double], updates: Long)

  /** Fold a batch of quotes for one symbol into the running state and
    * emit the latest quote + delta vs the previous distinct observation.
    * Single streaming pass tracking only the two most-recent
    * observations by (asOf, price) — O(1) memory per group, where a
    * sort-the-batch fold would buffer a symbol's entire micro-batch
    * (fine at quote cadence, not for a general stateful operator).
    */
  def updateSymbol(symbol: String, quotes: Iterator[Quote],
                   state: GroupState[LastQuote]): QuoteUpdate = {
    def later(a: Quote, b: Quote): Boolean =
      a.asOf.getTime > b.asOf.getTime ||
        (a.asOf.getTime == b.asOf.getTime && a.price > b.price)
    var best: Quote = null
    var second: Quote = null
    var n = 0L
    quotes.foreach { q =>
      n += 1
      if (best == null || later(q, best)) { second = best; best = q }
      else if (second == null || later(q, second)) second = q
    }
    val statePrev = state.getOption
    val delta =
      if (best == null) None
      else if (second != null) Some(best.price - second.price)
      else statePrev.map(p => best.price - p.price)
    val latest =
      if (best == null) statePrev
      else Some(LastQuote(best.price, best.asOf))
    latest.foreach(state.update)
    QuoteUpdate(symbol, latest.map(_.price).getOrElse(Double.NaN), delta, n)
  }

  /** Streaming transform: quotes → per-symbol incremental delta updates.
    * Use with `outputMode(Update)`.
    */
  def deltaStream(quotes: Dataset[Quote]): Dataset[QuoteUpdate] = {
    import quotes.sparkSession.implicits._
    quotes.groupByKey(_.symbol)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateSymbol)
  }

  val outputMode: OutputMode = OutputMode.Update()
}
