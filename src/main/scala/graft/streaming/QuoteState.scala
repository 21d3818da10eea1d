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
    */
  def updateSymbol(symbol: String, quotes: Iterator[Quote],
                   state: GroupState[LastQuote]): QuoteUpdate = {
    val ordered = quotes.toSeq.sortBy(q => (q.asOf.getTime, q.price))
    var prev = state.getOption
    var delta: Option[Double] = None
    var n = 0L
    ordered.foreach { q =>
      delta = prev.map(p => q.price - p.price)
      prev = Some(LastQuote(q.price, q.asOf))
      n += 1
    }
    prev.foreach(state.update)
    QuoteUpdate(symbol, prev.map(_.price).getOrElse(Double.NaN), delta, n)
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
