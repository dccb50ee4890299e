package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Microstructure.vpin`, driven by BUCKET FILL
  * (not watermarks): a volume bucket is final the instant cumulative
  * day volume crosses its upper boundary, so most rows emit
  * mid-stream with zero latency; day rollover finalizes the last
  * (possibly partial) bucket of the closed day, exactly as the batch
  * groupBy emits it. Only each symbol's open partial bucket of the
  * open day stays in state.
  *
  * State is O(window) per symbol: the open bucket's (v_buy, v_sell),
  * the trailing `window-1` completed buckets' (imbalance, volume)
  * with running sums, the tick-rule carry, and the day cursor. All
  * accumulation is integer (cents, shares) — the single terminal
  * division is the only FP step, so streaming rows are bit-equal to
  * batch (pinned in StreamingBarsSpec).
  */
object StreamingVpin {

  final case class SizedTick(
      symbol: String,
      ts: Timestamp,
      price: Double,
      size: Long,
      trade_id: Long,
  )

  final case class VpinRow(
      symbol: String,
      date: String,
      bucket: Long,
      v_buy: Long,
      v_sell: Long,
      volume: Long,
      imbalance: Long,
      vpin: Double,
  )

  final case class VpinState(
      day: String,
      cum: Long, // day cumulative volume
      bucket: Long, // open bucket index (cum div bucketVolume)
      vBuy: Long,
      vSell: Long,
      hasPrevPrice: Boolean,
      prevCents: Long,
      sign: Long, // tick-rule carry, +1 seed per day
      ring: Seq[(Long, Long)], // trailing completed (imbalance, volume)
      ringImb: Long,
      ringVol: Long,
  )

  def vpin(
      trades: DataFrame,
      bucketVolume: Long = 500L,
      window: Int = 10,
  ): Dataset[VpinRow] = {
    val spark = trades.sparkSession
    import spark.implicits._
    trades
      .where(col("price").isNotNull)
      .select(
        col("symbol").cast("string"),
        col("ts").cast("timestamp"),
        col("price").cast("double"),
        col("size").cast("long"),
        col("trade_id").cast("long"),
      )
      .as[SizedTick]
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        process(bucketVolume, window)
      )
  }

  private def dayOf(t: SizedTick): String =
    t.ts.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate.toString

  private def process(bucketVolume: Long, window: Int)(
      symbol: String,
      rows: Iterator[SizedTick],
      state: GroupState[VpinState],
  ): Iterator[VpinRow] = {
    val sorted = rows.toSeq.sortBy(t => (StatefulBars.tsMicros(t.ts), t.trade_id))
    var st = state.getOption.getOrElse(
      VpinState("", 0L, 0L, 0L, 0L, hasPrevPrice = false, 0L, 1L, Nil, 0L, 0L)
    )
    val out = Seq.newBuilder[VpinRow]

    // finalize the open bucket: emit with the trailing-window sums,
    // then rotate it into the ring
    def finalizeBucket(day: String): Unit = {
      val vol = st.vBuy + st.vSell
      val imb = math.abs(st.vBuy - st.vSell)
      val v = (st.ringImb + imb).toDouble / (st.ringVol + vol).toDouble
      out += VpinRow(symbol, day, st.bucket, st.vBuy, st.vSell, vol, imb, v)
      var ring = st.ring :+ ((imb, vol))
      var ri = st.ringImb + imb
      var rv = st.ringVol + vol
      if (ring.length > window - 1) {
        val (oi, ov) = ring.head
        ring = ring.tail
        ri -= oi
        rv -= ov
      }
      st = st.copy(bucket = st.bucket + 1, vBuy = 0L, vSell = 0L, ring = ring, ringImb = ri, ringVol = rv)
    }

    sorted.foreach { t =>
      val d = dayOf(t)
      val cents = math.round(t.price * 100)
      if (st.day != d) {
        // day rollover: the closed day's partial bucket is final
        if (st.day.nonEmpty && st.vBuy + st.vSell > 0) finalizeBucket(st.day)
        st = VpinState(d, 0L, 0L, 0L, 0L, hasPrevPrice = false, 0L, 1L, Nil, 0L, 0L)
      }
      // tick rule: sign flips on a price CHANGE, carries otherwise
      if (st.hasPrevPrice && cents != st.prevCents)
        st = st.copy(sign = if (cents > st.prevCents) 1L else -1L)
      st = st.copy(hasPrevPrice = true, prevCents = cents)
      // split the trade across bucket boundaries (integer pieces)
      var pos = st.cum
      val end = st.cum + math.max(t.size, 0L)
      while (pos < end) {
        val cap = (st.bucket + 1) * bucketVolume
        val pieceEnd = math.min(end, cap)
        val amount = pieceEnd - pos
        if (st.sign > 0) st = st.copy(vBuy = st.vBuy + amount)
        else st = st.copy(vSell = st.vSell + amount)
        pos = pieceEnd
        if (pieceEnd == cap) finalizeBucket(d) // bucket filled exactly: final now
      }
      st = st.copy(cum = end)
    }
    state.update(st)
    out.result().iterator
  }
}
