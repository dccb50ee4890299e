package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming daily volatility — the streaming twin of
  * operators.Labels.dailyVol (reference dynamic_labels.py:14): EWM
  * std (span, pandas adjust=true/bias=false/ignore_na=false
  * semantics) of the 24h-lookback returns, per symbol, emitted
  * per tick. The live form of the vol-target the triple-barrier
  * labelers consume, so an online labeler sees the identical
  * volatility series the training labels were built from.
  *
  * Bit-exactness is against the PRODUCTION batch form,
  * Ewm.stdOverKeyChunked: that scan seeds each (symbol, date) chunk
  * with a carry folded as carry·decayⁿ + localSums (math.pow), which
  * is mathematically equal but NOT bit-equal to one flat recurrence.
  * This operator replicates the chunked arithmetic exactly — per
  * chunk it runs the carry-seeded accumulators (for output) and the
  * zero-seeded locals (for the next carry) side by side, folding at
  * each date boundary in chunk-chronological order like the batch
  * pass-2 fold. Pinned bit-identical in StreamingBarsSpec, including
  * across mid-symbol state splits (TestGroupState).
  *
  * State per symbol: 12 accumulator doubles + the trailing
  * lookback-horizon price buffer for the as-of lookup (bounded by
  * ticks-per-24h, NOT stream length; entries older than the latest
  * at-or-before-boundary price evict as event time advances).
  *
  * As-of semantics match operators.AsofJoin Backward: lookback price
  * = the latest price with ts <= tick.ts − lookback (inclusive).
  * Warm-up ticks with no price 24h back emit null volatility but
  * still decay the EWM weights (ignore_na=false), exactly like the
  * batch scan.
  *
  * Ordering: ticks sort by (ts, trade_id) within each micro-batch;
  * cross-batch order follows arrival, as with the other stateful
  * streaming operators.
  */
object StreamingDailyVol {

  import StatefulBars.{tsMicros, Tick}

  private val DayUs = 86400000000L

  final case class VolState(
      // lookback buffer, oldest first; uts strictly increasing (equal
      // arrival uts keep only the last-processed price, matching the
      // batch window's last() at equal keys)
      buf: Vector[(Long, Double)],
      chunk: Long, // current UTC day index; Long.MinValue before any tick
      n: Long, // ticks seen in the current chunk (null returns included)
      // carry accumulators: end of all PRIOR chunks, pass-2 fold form
      cW: Double, cWX: Double, cWX2: Double, cW2: Double,
      // carry-seeded accumulators: drive the emitted values (pass 3)
      sW: Double, sWX: Double, sWX2: Double, sW2: Double,
      // zero-seeded locals: fold into the carry at the next boundary
      lW: Double, lWX: Double, lWX2: Double, lW2: Double,
  )

  private val emptyState =
    VolState(Vector.empty, Long.MinValue, 0L, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)

  final case class VolRow(
      symbol: String,
      ts: Timestamp,
      daily_return_volatility: Option[Double],
  )

  def dailyVol(
      trades: DataFrame,
      span: Int = 100,
      lookback: String = "24 hours",
  ): Dataset[VolRow] = {
    require(span >= 1, "span must be >= 1")
    val lookbackUs = graft.operators.Rolling.windowMicros(lookback)
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
        processGroup(span, lookbackUs)
      )
  }

  private[graft] def processGroup(span: Int, lookbackUs: Long)(
      symbol: String,
      rows: Iterator[Tick],
      state: GroupState[VolState],
  ): Iterator[VolRow] = {
    val alpha = 2.0 / (span + 1.0)
    val decay = 1.0 - alpha
    val sorted = rows.toSeq.sortBy(t => (tsMicros(t.ts), t.trade_id))
    var st = state.getOption.getOrElse(emptyState)
    var buf = st.buf
    var chunk = st.chunk; var n = st.n
    var cW = st.cW; var cWX = st.cWX; var cWX2 = st.cWX2; var cW2 = st.cW2
    var sW = st.sW; var sWX = st.sWX; var sWX2 = st.sWX2; var sW2 = st.sW2
    var lW = st.lW; var lWX = st.lWX; var lWX2 = st.lWX2; var lW2 = st.lW2
    val out = Seq.newBuilder[VolRow]
    sorted.foreach { t =>
      val uts = tsMicros(t.ts)
      val day = Math.floorDiv(uts, DayUs)
      if (day != chunk) {
        if (chunk != Long.MinValue) {
          // pass-2 fold: carry = carry·decayⁿ + chunk-local end state
          val dn = math.pow(decay, n.toDouble)
          val dn2 = math.pow(decay * decay, n.toDouble)
          cW = cW * dn + lW
          cWX = cWX * dn + lWX
          cWX2 = cWX2 * dn + lWX2
          cW2 = cW2 * dn2 + lW2
        }
        chunk = day; n = 0L
        sW = cW; sWX = cWX; sWX2 = cWX2; sW2 = cW2
        lW = 0.0; lWX = 0.0; lWX2 = 0.0; lW2 = 0.0
      }
      val boundary = uts - lookbackUs
      // evict everything before the latest at-or-before-boundary entry
      while (buf.length >= 2 && buf(1)._1 <= boundary) buf = buf.tail
      val lookbackPrice: Option[Double] =
        buf.headOption.collect { case (u, p) if u <= boundary => p }
      n += 1
      // same op order as the batch scans: decay every row, then update
      // on non-null
      sW *= decay; sWX *= decay; sWX2 *= decay; sW2 *= decay * decay
      lW *= decay; lWX *= decay; lWX2 *= decay; lW2 *= decay * decay
      val vol = lookbackPrice.map { lp =>
        val x = t.price / lp - 1
        sW += 1.0; sWX += x; sWX2 += x * x; sW2 += 1.0
        lW += 1.0; lWX += x; lWX2 += x * x; lW2 += 1.0
        val mean = sWX / sW
        val varBiased = math.max(sWX2 / sW - mean * mean, 0.0)
        val denom = sW * sW - sW2
        if (denom <= 0.0) 0.0
        else math.sqrt(varBiased * sW * sW / denom)
      }
      out += VolRow(symbol, t.ts, vol)
      buf =
        if (buf.nonEmpty && buf.last._1 == uts) buf.init :+ (uts, t.price)
        else buf :+ (uts, t.price)
    }
    state.update(
      VolState(buf, chunk, n, cW, cWX, cWX2, cW2, sW, sWX, sWX2, sW2, lW, lWX, lWX2, lW2)
    )
    out.result().iterator
  }
}
