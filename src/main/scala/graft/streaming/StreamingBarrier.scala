package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Labels.tripleBarrier]] with a
  * constant volatility target: every tick opens an event; the event
  * emits EXACTLY ONCE —
  *  - at the first path tick whose return crosses +ptMult·trgt
  *    (label 1) or −slMult·trgt (label −1; a tick crossing both sides
  *    resolves profit-take first, the batch tie rule), or
  *  - as a vertical touch (label 0) the moment a tick arrives past
  *    t1 = ts + horizon, scored at the LAST tick inside the window.
  *
  * Append mode, no watermark: a crossing is final at its tick
  * (earlier ticks can't appear later in an in-order stream), a
  * vertical is final when the first beyond-t1 tick proves the window
  * closed. State per symbol = the open events of the trailing
  * horizon (FIFO — t1 is monotone in arrival order) + one last-tick
  * carry, i.e. O(ticks-per-horizon).
  *
  * Batch parity (pinned in StreamingBarsSpec): the return trees are
  * the identical pu/p0 − 1 doubles, so rows agree BIT-exactly with
  * the batch operator wherever the two contracts coincide — batch
  * caps t1 at the dataset's per-symbol last tick and can emit
  * end-of-data verticals (batch-isms a stream has no analogue of),
  * so the pin compares events whose window closed in-stream.
  *
  * Events whose open price is exactly 0 never cross (returns against
  * a zero price are null in batch); their vertical emits with a null
  * touch_return, like the batch row.
  */
object StreamingBarrier {

  final case class Tick(symbol: String, ts: Timestamp, price: Double, trade_id: Long)

  final case class OpenEvent(tsUs: Long, price: Double, t1Us: Long)

  final case class BarrierState(
      open: List[OpenEvent],
      lastTsUs: Long,
      lastPrice: Double,
      hasLast: Boolean,
  )

  final case class BarrierLabel(
      symbol: String,
      ts: Timestamp,
      trgt: Double,
      t1: Timestamp,
      touch_ts: Timestamp,
      touch_return: Option[Double],
      label: Int,
  )

  def labels(
      trades: DataFrame,
      horizon: String = "4 hours",
      constTarget: Double = 0.02,
      ptMult: Double = 1.0,
      slMult: Double = 1.0,
  ): Dataset[BarrierLabel] = {
    require(constTarget > 0.0, "constTarget must be positive")
    val hUs = graft.operators.Labels.parseHorizonMicros(horizon)
    val spark = trades.sparkSession
    import spark.implicits._
    trades
      .select(
        col("symbol").cast("string"),
        col("ts").cast("timestamp"),
        col("price").cast("double"),
        col("trade_id").cast("long"),
      )
      .as[Tick]
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        processGroup(hUs, constTarget, ptMult, slMult)
      )
  }

  private def processGroup(hUs: Long, trgt: Double, pt: Double, sl: Double)(
      symbol: String,
      rows: Iterator[Tick],
      state: GroupState[BarrierState],
  ): Iterator[BarrierLabel] = {
    val sorted = rows.toSeq.sortBy(t => (StatefulBars.tsMicros(t.ts), t.trade_id))
    var st = state.getOption.getOrElse(BarrierState(Nil, 0L, 0.0, hasLast = false))
    val open = scala.collection.mutable.ArrayDeque.from(st.open)
    var lastTsUs = st.lastTsUs
    var lastPrice = st.lastPrice
    var hasLast = st.hasLast
    val thrP = trgt * pt
    val thrS = (-trgt) * sl
    val out = Seq.newBuilder[BarrierLabel]

    def emit(ev: OpenEvent, touchUs: Long, ret: Option[Double], label: Int): Unit =
      out += BarrierLabel(
        symbol,
        StatefulBars.microsTs(ev.tsUs),
        trgt,
        StatefulBars.microsTs(ev.t1Us),
        StatefulBars.microsTs(touchUs),
        ret,
        label,
      )

    sorted.foreach { t =>
      val uUs = StatefulBars.tsMicros(t.ts)
      // 1. verticals: events whose window closed strictly before this
      // tick. Any remaining event has t1 >= the previous tick's ts
      // (later-closing events were already popped), so the last tick
      // IS the in-window closer; an event with no path tick strictly
      // after its start drops silently (the batch inner join).
      while (open.nonEmpty && open.head.t1Us < uUs) {
        val ev = open.removeHead()
        if (hasLast && lastTsUs > ev.tsUs) {
          val ret = if (ev.price == 0.0) None else Some(lastPrice / ev.price - 1.0)
          emit(ev, ev.t1Us, ret, 0)
        }
      }
      // 2. crossings at this tick (strictly later-ts events only —
      // the batch join is exclusive at the event's own timestamp)
      var i = 0
      while (i < open.length) {
        val ev = open(i)
        if (ev.tsUs < uUs && ev.price != 0.0) {
          val ret = t.price / ev.price - 1.0
          if (ret >= thrP) {
            emit(ev, uUs, Some(ret), 1)
            open.remove(i)
          } else if (ret <= thrS) {
            emit(ev, uUs, Some(ret), -1)
            open.remove(i)
          } else i += 1
        } else i += 1
      }
      // 3. this tick opens its own event — unless an identical
      // (ts, price) event is already open (duplicate prints at the
      // same microsecond collapse to ONE batch row via the core's
      // groupBy key; mirror that so parity holds on dup-tick feeds)
      var j = open.length - 1
      var dup = false
      while (j >= 0 && open(j).tsUs == uUs && !dup) { // FIFO: same-ts events sit at the tail
        if (open(j).price == t.price) dup = true
        j -= 1
      }
      if (!dup) open.append(OpenEvent(uUs, t.price, uUs + hUs))
      lastTsUs = uUs
      lastPrice = t.price
      hasLast = true
    }
    state.update(BarrierState(open.toList, lastTsUs, lastPrice, hasLast))
    out.result().iterator
  }
}
