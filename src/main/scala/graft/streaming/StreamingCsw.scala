package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.StructuralBreak.cswScan]]: the
  * bounded Chu-Stinchcombe-White levels CUSUM over a stream of ticks.
  * State per symbol is the batch scan's O(maxLag) ring of level
  * snapshots plus the exact Δ²-sum; a tick's statistic is final the
  * moment it arrives (backward lags only), so append-mode emission is
  * exactly-once with no watermark. Identical integers and double
  * trees → streaming == batch is BIT-exact (pinned).
  *
  * Ordered-arrival contract: as with [[StatefulBars]], state carries
  * across micro-batches unwatermarked — batch N+1's ticks must be
  * event-time ≥ batch N's per symbol, or the lag ring silently
  * diverges from the batch scan. See the StatefulBars header note.
  */
object StreamingCsw {

  final case class CswState(
      started: Boolean,
      prevCents: Long,
      rn: Long,
      cdd: Long,
      ring: List[Long], // ringLen slots of level cents
  )

  final case class CswEvent(
      symbol: String,
      ts: Timestamp,
      price: Double,
      best_lag: Int,
      cs_stat: Double,
      cs_crit: Double,
  )

  def csw(trades: DataFrame, minLag: Int = 10, maxLag: Int = 40): Dataset[CswEvent] = {
    require(minLag >= 1 && maxLag >= minLag)
    val spark = trades.sparkSession
    import spark.implicits._
    trades
      .select(
        col("symbol").cast("string"),
        col("ts").cast("timestamp"),
        col("price").cast("double"),
        col("trade_id").cast("long"),
      )
      .as[StreamingSadf.Tick]
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        processGroup(minLag, maxLag)
      )
  }

  private def processGroup(minL: Int, maxL: Int)(
      symbol: String,
      rows: Iterator[StreamingSadf.Tick],
      state: GroupState[CswState],
  ): Iterator[CswEvent] = {
    val ringLen = maxL + 1
    val sorted = rows.toSeq.sortBy(t => (StatefulBars.tsMicros(t.ts), t.trade_id))
    var st = state.getOption.getOrElse(
      CswState(started = false, 0L, 0L, 0L, List.fill(ringLen)(0L))
    )
    val ring = st.ring.toArray
    var (started, prevCents, rn, cdd) = (st.started, st.prevCents, st.rn, st.cdd)
    val out = Seq.newBuilder[CswEvent]
    sorted.foreach { t =>
      val cents = StatefulBars.cents(t.price) // HALF_UP, sign-mirrored
      if (!started) {
        started = true; rn = 0L; cdd = 0L
        ring(0) = cents; prevCents = cents
      } else {
        rn += 1
        val d = cents - prevCents
        prevCents = cents
        cdd += d * d
        ring((rn % ringLen).toInt) = cents
        if (rn >= maxL) {
          var bestS = Double.NegativeInfinity
          var bestN = minL
          if (cdd == 0L) { bestS = 0.0 }
          else {
            val sigma = math.sqrt(cdd.toDouble / rn.toDouble)
            var n = minL
            while (n <= maxL) {
              val dy = cents - ring(((rn - n) % ringLen).toInt)
              val s = dy.toDouble / (sigma * math.sqrt(n.toDouble))
              if (s > bestS) { bestS = s; bestN = n }
              n += 1
            }
          }
          out += CswEvent(
            symbol, t.ts, t.price, bestN, bestS,
            math.sqrt(4.6 + math.log(bestN.toDouble)),
          )
        }
      }
    }
    state.update(CswState(started, prevCents, rn, cdd, ring.toList))
    out.result().iterator
  }
}
