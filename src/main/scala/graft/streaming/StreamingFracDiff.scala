package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming fixed-window fractional differentiation — the streaming
  * twin of functions.FracDiff (reference kernel
  * /root/reference/src/frac_diff.rs:7): the live-inference shape for
  * the reference's flagship feature, so a model scoring ticks in
  * real time sees the identical FFD values its training set was
  * built from.
  *
  * State per symbol is the last n_w−1 prices (n_w ≈ 30 at the
  * d=0.5/1e-3 defaults) plus a row counter — O(1), independent of
  * stream length, so a 1000-symbol book holds ~1000×30 doubles of
  * state total. The per-tick dot accumulates the SAME weight
  * literals in the SAME left-to-right IEEE order as the batch
  * window/chunked forms (`terms.reduceLeft(_ + _)` with ascending
  * lag k), so on identical input the emitted doubles are
  * bit-identical to batch — pinned in StreamingBarsSpec, including
  * across a mid-symbol state split (TestGroupState carry).
  *
  * Ordering: ticks sort by (ts, trade_id) within each micro-batch;
  * cross-batch order follows arrival, as with the other stateful
  * streaming operators.
  */
object StreamingFracDiff {

  import StatefulBars.{tsMicros, Tick}

  /** recent is most-recent-first: head = lag 1. */
  final case class FdState(nSeen: Long, recent: List[Double])

  final case class FdRow(
      symbol: String,
      ts: Timestamp,
      price: Double,
      size: Long,
      trade_id: Long,
      frac_diff: Option[Double],
  )

  def fracDiff(
      trades: DataFrame,
      d: Double = 0.5,
      threshold: Double = 1e-3,
  ): Dataset[FdRow] = {
    val ws = graft.functions.FracDiff.weights(d, threshold)
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
        processGroup(ws)
      )
  }

  private[graft] def processGroup(ws: Array[Double])(
      symbol: String,
      rows: Iterator[Tick],
      state: GroupState[FdState],
  ): Iterator[FdRow] = {
    val nW = ws.length
    val sorted = rows.toSeq.sortBy(t => (tsMicros(t.ts), t.trade_id))
    val st = state.getOption.getOrElse(FdState(0L, Nil))
    var n = st.nSeen
    var recent = st.recent
    val out = Seq.newBuilder[FdRow]
    sorted.foreach { t =>
      n += 1
      val fd =
        if (n >= nW) {
          // ascending k, single accumulator — the reduceLeft order of
          // the batch expression tree, term for term
          var acc = ws(0) * t.price
          var k = 1
          var rest = recent
          while (k < nW) {
            acc += ws(k) * rest.head
            rest = rest.tail
            k += 1
          }
          Some(acc)
        } else None
      out += FdRow(symbol, t.ts, t.price, t.size, t.trade_id, fd)
      recent = (t.price :: recent).take(nW - 1)
    }
    state.update(FdState(n, recent))
    out.result().iterator
  }
}
