package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.api.TradingCols

/** Stateful streaming bars (count/volume-triggered bars cannot be
  * expressed as windowed aggregations — the bar boundary depends on
  * accumulated state, so this is the flatMapGroupsWithState shape).
  *
  * State per symbol is one open bar (O(1)); completed bars emit in
  * append mode exactly once. Ticks are processed in (ts, trade_id)
  * order within each micro-batch; as with any count-based streaming
  * bar, cross-batch reordering follows arrival order.
  */
object StatefulBars {

  final case class Tick(
      symbol: String,
      ts: Timestamp,
      price: Double,
      size: Long,
      trade_id: Long,
  )

  final case class OpenBar(
      n: Long,
      tsStart: Long,
      tsEnd: Long,
      open: Double,
      high: Double,
      low: Double,
      close: Double,
      volume: Long,
      pv: Double,
  )

  final case class Bar(
      symbol: String,
      ts_start: Timestamp,
      ts_end: Timestamp,
      open: Double,
      high: Double,
      low: Double,
      close: Double,
      volume: Long,
      vwap: Double,
      n_trades: Long,
  )

  /** N-ticks-per-bar streaming bars over a (possibly streaming)
    * trades DataFrame with TradingCols.default columns.
    */
  def tickBars(trades: DataFrame, barSize: Int): Dataset[Bar] = {
    val spark = trades.sparkSession
    import spark.implicits._
    val ticks = trades
      .select(
        col("symbol").cast("string"),
        col("ts").cast("timestamp"),
        col("price").cast("double"),
        col("size").cast("long"),
        col("trade_id").cast("long"),
      )
      .as[Tick]

    ticks
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        processGroup(barSize)
      )
  }

  private def processGroup(barSize: Int)(
      symbol: String,
      rows: Iterator[Tick],
      state: GroupState[OpenBar],
  ): Iterator[Bar] = {
    val sorted = rows.toSeq.sortBy(t => (t.ts.getTime, t.trade_id))
    var bar = state.getOption.orNull
    val out = Seq.newBuilder[Bar]
    sorted.foreach { t =>
      val tsMs = t.ts.getTime
      bar =
        if (bar == null)
          OpenBar(1, tsMs, tsMs, t.price, t.price, t.price, t.price, t.size, t.price * t.size)
        else
          OpenBar(
            bar.n + 1,
            bar.tsStart,
            tsMs,
            bar.open,
            math.max(bar.high, t.price),
            math.min(bar.low, t.price),
            t.price,
            bar.volume + t.size,
            bar.pv + t.price * t.size,
          )
      if (bar.n >= barSize) {
        out += Bar(
          symbol,
          new Timestamp(bar.tsStart),
          new Timestamp(bar.tsEnd),
          bar.open,
          bar.high,
          bar.low,
          bar.close,
          bar.volume,
          bar.pv / bar.volume,
          bar.n,
        )
        bar = null
      }
    }
    if (bar == null) state.remove() else state.update(bar)
    out.result().iterator
  }
}
