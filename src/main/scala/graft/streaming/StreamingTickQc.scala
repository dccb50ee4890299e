package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the per-(symbol, day) tick-feed QC report
  * ([[graft.operators.TickQc.reportDaily]]) — the ingest gate run on
  * the live feed itself, so a defective day is flagged the moment it
  * completes instead of at the next batch audit.
  *
  * Day-rollover finality like [[StreamingDaily]]: a day's report is
  * emitted when the first tick of a LATER day arrives for that
  * symbol, so append-mode emission is exactly-once and the last open
  * day stays in state (the batch operator emits it — streaming ==
  * batch on all completed days, pinned in ScalaTest).
  *
  * State is O(1) counters per symbol PLUS the duplicate-id window:
  * exact per-day duplicate counting (`count - count(DISTINCT
  * trade_id)`) needs every id seen that day, which is unbounded, so
  * the twin keeps a bounded seen-set of ids in
  * `(maxId - idWindow, maxId]` (≤ `idWindow` longs, pruned
  * amortized). CONTRACT: a resend arriving more than `idWindow` ids
  * after the original is NOT counted (real resends arrive within
  * seconds; size `idWindow` to cover the feed's resend horizon).
  * Every other counter is exact.
  *
  * Ordered-arrival contract (same as [[StatefulBars]]): micro-batch
  * N+1's ticks must sort AFTER batch N's per symbol in the QC
  * adjacency order (trade_id, ts, cents) — within a batch the scan
  * sorts, across batches the lag carry assumes it. Days must be
  * non-decreasing along that order; a tick for an already-emitted
  * day reopens it as a fresh day and skews both reports.
  */
object StreamingTickQc {

  final case class QcTick(symbol: String, ts: Timestamp, price: Double, trade_id: Long)

  final case class QcState(
      day: String,
      nTicks: Long,
      nNonpos: Long,
      nDup: Long,
      nBack: Long,
      nJump: Long,
      minPc: Long,
      maxPc: Long,
      firstId: Long,
      lastId: Long,
      hasPrev: Boolean,
      prevTs: Long, // micros, QC-adjacency predecessor
      prevPc: Long,
      maxId: Long,
      seen: Array[Long], // ids in (maxId - idWindow, maxId], day-scoped
  )

  final case class QcRow(
      symbol: String,
      date: String,
      n_ticks: Long,
      n_nonpos: Long,
      n_dup_ids: Long,
      n_ts_backwards: Long,
      n_jumps: Long,
      min_price: Double,
      max_price: Double,
      first_id: Long,
      last_id: Long,
      clean: Int,
  )

  def report(
      trades: DataFrame,
      jumpPct: Int = 5,
      idWindow: Long = 1L << 16,
  ): Dataset[QcRow] = {
    require(jumpPct >= 1, "jumpPct >= 1")
    require(idWindow >= 1, "idWindow >= 1")
    val spark = trades.sparkSession
    import spark.implicits._
    trades
      .select(
        col("symbol").cast("string"),
        col("ts").cast("timestamp"),
        col("price").cast("double"),
        col("trade_id").cast("long"),
      )
      .as[QcTick]
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        process(jumpPct, idWindow) _
      )
  }

  private def dayOf(ts: Timestamp): String =
    ts.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate.toString

  private def emit(symbol: String, st: QcState): QcRow =
    QcRow(
      symbol,
      st.day,
      st.nTicks,
      st.nNonpos,
      st.nDup,
      st.nBack,
      st.nJump,
      // exact-cents range through the identical single division
      st.minPc.toDouble / 100.0,
      st.maxPc.toDouble / 100.0,
      st.firstId,
      st.lastId,
      if (st.nNonpos == 0L && st.nDup == 0L && st.nBack == 0L && st.nJump == 0L) 1 else 0,
    )

  private def process(jumpPct: Int, idWindow: Long)(
      symbol: String,
      rows: Iterator[QcTick],
      state: GroupState[QcState],
  ): Iterator[QcRow] = {
    // QC adjacency is trade_id order with the (ts, cents) tiebreak —
    // the batch window's exact ORDER BY, not the daily twins' ts order
    val sorted = rows.toSeq
      .sortBy(t => (t.trade_id, StatefulBars.tsMicros(t.ts), StatefulBars.cents(t.price)))
    var st = state.getOption.orNull
    val seen = scala.collection.mutable.HashSet.empty[Long]
    if (st != null && st.seen != null) seen ++= st.seen
    var sincePrune = 0
    val out = Seq.newBuilder[QcRow]
    sorted.foreach { t =>
      val d = dayOf(t.ts)
      val pc = StatefulBars.cents(t.price)
      val tsm = StatefulBars.tsMicros(t.ts)
      if (st != null && st.day != d) {
        out += emit(symbol, st)
        st = null
        seen.clear()
      }
      if (st == null) {
        seen += t.trade_id
        st = QcState(d, 1L, if (pc <= 0L) 1L else 0L, 0L, 0L, 0L,
          pc, pc, t.trade_id, t.trade_id,
          hasPrev = true, tsm, pc, t.trade_id, null)
      } else {
        val dup = seen.contains(t.trade_id)
        if (!dup && t.trade_id > st.maxId - idWindow) {
          seen += t.trade_id
          sincePrune += 1
          if (sincePrune >= 4096) {
            val cut = math.max(st.maxId, t.trade_id) - idWindow
            seen.filterInPlace(_ > cut)
            sincePrune = 0
          }
        }
        st = QcState(
          d,
          st.nTicks + 1L,
          st.nNonpos + (if (pc <= 0L) 1L else 0L),
          st.nDup + (if (dup) 1L else 0L),
          st.nBack + (if (st.hasPrev && tsm < st.prevTs) 1L else 0L),
          st.nJump + (if (st.hasPrev && st.prevPc > 0L &&
            math.abs(pc - st.prevPc) * 100L > jumpPct.toLong * st.prevPc) 1L
          else 0L),
          math.min(st.minPc, pc),
          math.max(st.maxPc, pc),
          math.min(st.firstId, t.trade_id),
          math.max(st.lastId, t.trade_id),
          hasPrev = true,
          tsm,
          pc,
          math.max(st.maxId, t.trade_id),
          null,
        )
      }
    }
    if (st != null) {
      val cut = st.maxId - idWindow
      state.update(st.copy(seen = seen.iterator.filter(_ > cut).toArray))
    }
    out.result().iterator
  }
}
