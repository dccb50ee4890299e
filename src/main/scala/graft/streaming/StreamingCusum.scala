package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Cusum]]: the symmetric CUSUM
  * event filter as a flatMapGroupsWithState per symbol.
  *
  * State is three longs (prev cents, sPos, sNeg) — O(1) per symbol,
  * no watermark machinery needed: an event is final the moment its
  * tick is processed (nothing later can retract it), so append-mode
  * emission is exactly-once by construction. Same integer-cents
  * arithmetic as the batch scan, so streaming == batch is EXACT on
  * in-order delivery (ticks sort by (ts, trade_id) within each
  * micro-batch; cross-batch reordering follows arrival order, like
  * every count/state-based streaming operator here).
  */
object StreamingCusum {

  final case class Tick(symbol: String, ts: Timestamp, price: Double, trade_id: Long)

  final case class CusumState(hasPrev: Boolean, prevCents: Long, sPos: Long, sNeg: Long)

  final case class Event(symbol: String, ts: Timestamp, side: Int, s_pos: Long, s_neg: Long)

  def events(trades: DataFrame, threshold: Double): Dataset[Event] = {
    require(threshold > 0, "threshold > 0")
    val h = math.round(threshold * 100)
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
        processGroup(h)
      )
  }

  private def processGroup(h: Long)(
      symbol: String,
      rows: Iterator[Tick],
      state: GroupState[CusumState],
  ): Iterator[Event] = {
    val sorted = rows.toSeq.sortBy(t => (StatefulBars.tsMicros(t.ts), t.trade_id))
    var st = state.getOption.getOrElse(CusumState(hasPrev = false, 0L, 0L, 0L))
    val out = Seq.newBuilder[Event]
    sorted.foreach { t =>
      val cents = math.round(t.price * 100)
      if (!st.hasPrev) st = CusumState(hasPrev = true, cents, 0L, 0L)
      else {
        val d = cents - st.prevCents
        val sp = math.max(0L, st.sPos + d)
        val sn = math.min(0L, st.sNeg + d)
        st =
          if (sn < -h) { out += Event(symbol, t.ts, -1, sp, sn); CusumState(hasPrev = true, cents, sp, 0L) }
          else if (sp > h) { out += Event(symbol, t.ts, 1, sp, sn); CusumState(hasPrev = true, cents, 0L, sn) }
          else CusumState(hasPrev = true, cents, sp, sn)
      }
    }
    state.update(st)
    out.result().iterator
  }
}
