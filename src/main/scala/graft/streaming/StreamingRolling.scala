package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming trailing-window rolling features (the streaming twin of
  * operators.Rolling.features, reference scope: rolling VWAP/mean/
  * min/max/count over the last `window` per symbol).
  *
  * State per symbol is the current window's ticks — bounded by the
  * window span (NOT the stream length), evicted as event time
  * advances. Sums accumulate in exact Long cents exactly like the
  * batch deque scan, so on identical input the emitted doubles are
  * bit-identical to batch (pinned in StreamingBarsSpec).
  *
  * Ordering: ticks sort by (ts, trade_id) within each micro-batch;
  * RANGE-frame tie semantics (equal-ts ticks see each other) hold
  * within a batch, as with the other stateful streaming operators.
  */
object StreamingRolling {

  import StatefulBars.{microsTs, tsMicros, Tick}

  final case class WinItem(uts: Long, price: Double, size: Long, cents: Long)

  final case class RollState(items: List[WinItem])

  final case class FeatRow(
      symbol: String,
      ts: Timestamp,
      price: Double,
      size: Long,
      trade_id: Long,
      rolling_vwap: Double,
      rolling_mean_price: Double,
      rolling_min: Double,
      rolling_max: Double,
      rolling_n: Long,
  )

  def features(trades: DataFrame, window: String = "1 hour"): Dataset[FeatRow] = {
    val m = graft.operators.Rolling.windowMicros(window)
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
        processGroup(m)
      )
  }

  private def processGroup(m: Long)(
      symbol: String,
      rows: Iterator[Tick],
      state: GroupState[RollState],
  ): Iterator[FeatRow] = {
    val sorted = rows.toSeq.sortBy(t => (tsMicros(t.ts), t.trade_id))
    // rebuild window + integer sums from carried state (O(window))
    val win = scala.collection.mutable.Queue.empty[WinItem]
    var sumPS, sumP, sumS, n = 0L
    state.getOption.foreach(_.items.foreach { it =>
      win.enqueue(it); sumPS += it.cents * it.size; sumP += it.cents; sumS += it.size; n += 1
    })
    val out = Seq.newBuilder[FeatRow]
    var i = 0
    while (i < sorted.length) {
      val uts = tsMicros(sorted(i).ts)
      // RANGE-tie semantics: admit the whole equal-uts group first
      var j = i
      while (j < sorted.length && tsMicros(sorted(j).ts) == uts) {
        val t = sorted(j)
        val cents = math.round(t.price * 100)
        win.enqueue(WinItem(uts, t.price, t.size, cents))
        sumPS += cents * t.size; sumP += cents; sumS += t.size; n += 1
        j += 1
      }
      while (win.nonEmpty && win.head.uts < uts - m) {
        val it = win.dequeue()
        sumPS -= it.cents * it.size; sumP -= it.cents; sumS -= it.size; n -= 1
      }
      // min/max over the window: O(w) per group — the batch operator's
      // monotonic deques amortize this; at streaming batch sizes the
      // window scan is the simpler correct form
      var mn = Double.MaxValue
      var mx = Double.MinValue
      win.foreach { it => mn = math.min(mn, it.price); mx = math.max(mx, it.price) }
      while (i < j) {
        val t = sorted(i)
        out += FeatRow(
          symbol, t.ts, t.price, t.size, t.trade_id,
          sumPS.toDouble / sumS / 100.0,
          sumP.toDouble / n / 100.0,
          mn, mx, n,
        )
        i += 1
      }
    }
    state.update(RollState(win.toList))
    out.result().iterator
  }
}
