package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.api.TradingCols

/** Symmetric CUSUM event filter (AFML ch.2.5.2.1, snippet 2.4 — the
  * event-sampling step the reference's label operators expect their
  * `events` input to come from; beyond the reference's own surface,
  * like the imbalance bars).
  *
  * Per symbol, over price deltas d_t (exact integer cents):
  *   sPos = max(0, sPos + d_t);  sNeg = min(0, sNeg + d_t)
  *   if sNeg < -h: emit event, reset sNeg (only)
  *   elif sPos > h: emit event, reset sPos (only)
  * Only the TRIGGERING side resets (AFML's if/elif), and the negative
  * side wins a same-tick double crossing — both quirks are part of the
  * contract and replicated by the oracle.
  *
  * All state is integer cents, so event placement is engine-exact.
  * Inherently sequential per symbol (the clamp is a data-dependent
  * recurrence), so the scale pattern is the imbalance-bar one: one
  * hash repartition on symbol, sortWithinPartitions, O(1)-state
  * streaming pass; throughput is bounded by the largest single
  * symbol's history, documented in SURVEY §6.
  */
object Cusum {

  final case class EventRow(
      symbol: String,
      ts: java.sql.Timestamp,
      side: Int,
      s_pos: Long,
      s_neg: Long,
  )

  /** @param threshold h in PRICE units (e.g. 100.0 = $100); compared
    *                   against the cusum of cent deltas as round(h*100).
    */
  def events(
      df: DataFrame,
      threshold: Double,
      c: TradingCols = TradingCols.default,
  ): DataFrame = {
    require(threshold > 0, "threshold > 0")
    val h = math.round(threshold * 100)
    val spark = df.sparkSession
    import spark.implicits._
    df.na
      .drop(Seq(c.price))
      .select(
        col(c.symbol).cast("string").as("symbol"),
        col(c.ts).cast("timestamp").as("ts"),
        col(c.price).cast("double").as("price"),
        col(c.tradeId).cast("long").as("trade_id"),
      )
      .repartition(col("symbol"))
      .sortWithinPartitions(col("symbol"), col("ts"), col("trade_id"))
      .as[(String, java.sql.Timestamp, Double, Long)]
      .mapPartitions { it =>
        var curSym: String = null
        var havePrev = false
        var prevCents = 0L
        var sPos = 0L
        var sNeg = 0L
        new Iterator[EventRow] {
          private var pending: EventRow = null
          override def hasNext: Boolean = {
            while (pending == null && it.hasNext) {
              val (sym, ts, price, _) = it.next()
              if (sym != curSym) {
                curSym = sym; havePrev = false; sPos = 0L; sNeg = 0L
              }
              val cents = math.round(price * 100)
              if (!havePrev) { havePrev = true; prevCents = cents }
              else {
                val d = cents - prevCents
                prevCents = cents
                sPos = math.max(0L, sPos + d)
                sNeg = math.min(0L, sNeg + d)
                if (sNeg < -h) {
                  pending = EventRow(sym, ts, -1, sPos, sNeg)
                  sNeg = 0L
                } else if (sPos > h) {
                  pending = EventRow(sym, ts, 1, sPos, sNeg)
                  sPos = 0L
                }
              }
            }
            pending != null
          }
          override def next(): EventRow = { val r = pending; pending = null; r }
        }
      }
      .toDF()
  }
}
