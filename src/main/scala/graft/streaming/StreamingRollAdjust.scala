package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.RollAdjust]]: gap-adjusted
  * continuous prices emitted tick-by-tick.
  *
  * State per symbol is three longs (current contract month, last
  * cents, cumulative gap) — O(1); an adjusted tick is final the
  * moment it is processed (the cumulative gap at a tick depends only
  * on PAST ticks), so append mode is exactly-once by construction
  * and no watermark is needed. Same sign-mirrored cents rounding
  * ([[StatefulBars.cents]]) and the same single cents→price division
  * as the batch operator, so streaming == batch is EXACT on in-order
  * delivery (the ordered-arrival contract of every state-carrying
  * operator here: ticks sort by (ts, trade_id) within a micro-batch,
  * cross-batch order must follow event time).
  *
  * One twin asymmetry by design: the batch operator's month table
  * sees the WHOLE month, but gaps only ever use the new month's
  * first tick and the old month's last tick — both known the moment
  * the first tick of a new month arrives, which is why the streaming
  * form needs no end-of-month buffering at all.
  */
object StreamingRollAdjust {

  final case class Tick(symbol: String, ts: Timestamp, price: Double, trade_id: Long)

  final case class RollState(hasPrev: Boolean, monthKey: Int, lastPc: Long, cumGap: Long)

  final case class AdjTick(
      symbol: String,
      ts: Timestamp,
      trade_id: Long,
      price: Double,
      cum_gap_cents: Long,
      adj_price: Double,
  )

  def adjusted(trades: DataFrame): Dataset[AdjTick] = {
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
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(processGroup)
  }

  /** Calendar month of the tick in the engine's UTC clock (matches
    * batch `trunc(to_date(ts), "month")` under the UTC session
    * timezone every graft session pins).
    */
  private def monthKey(micros: Long): Int = {
    val days = Math.floorDiv(micros, 86400000000L)
    val ld = java.time.LocalDate.ofEpochDay(days)
    ld.getYear * 12 + (ld.getMonthValue - 1)
  }

  private def processGroup(
      symbol: String,
      rows: Iterator[Tick],
      state: GroupState[RollState],
  ): Iterator[AdjTick] = {
    val sorted = rows.toSeq.sortBy(t => (StatefulBars.tsMicros(t.ts), t.trade_id))
    var st = state.getOption.getOrElse(RollState(hasPrev = false, 0, 0L, 0L))
    val out = Seq.newBuilder[AdjTick]
    sorted.foreach { t =>
      val pc = StatefulBars.cents(t.price)
      val mk = monthKey(StatefulBars.tsMicros(t.ts))
      if (!st.hasPrev) st = RollState(hasPrev = true, mk, pc, 0L)
      else if (mk != st.monthKey)
        st = RollState(hasPrev = true, mk, pc, st.cumGap + (pc - st.lastPc))
      else st = st.copy(lastPc = pc)
      out += AdjTick(symbol, t.ts, t.trade_id, t.price, st.cumGap,
        (pc - st.cumGap).toDouble / 100.0)
    }
    state.update(st)
    out.result().iterator
  }
}
