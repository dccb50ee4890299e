package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.api.TradingCols

/** Tick-imbalance bars (AFML ch.2.3.2.1 — beyond the reference's
  * four bar types, on the same streaming-scan machinery as
  * Bars.dollarBars).
  *
  * Tick rule: b_t = sign(Δprice), carrying the previous sign on
  * Δ=0. The bar closes when the accumulated signed imbalance
  * |θ| = |Σ b_t| reaches E[T]·max(|E[b]|, minImbalance), where E[T]
  * (expected ticks per bar) and E[b] (expected per-tick imbalance)
  * are EWMAs over closed bars, seeded with initTicks / initImbalance.
  * Thresholds therefore adapt: runs of one-sided flow close bars
  * faster.
  *
  * Inherently sequential per symbol (threshold state feeds forward),
  * so: one hash repartition on symbol, sortWithinPartitions, and an
  * O(1)-state streaming pass — bars span days, so no date splitting.
  */
object ImbalanceBars {

  private final case class BarRow(
      symbol: String,
      ts_start: java.sql.Timestamp,
      ts_end: java.sql.Timestamp,
      open: Double,
      high: Double,
      low: Double,
      close: Double,
      volume: Long,
      vwap: Double,
      n_trades: Long,
      theta: Long,
  )

  /** @param alpha EWMA adaptivity of the expected-ticks/imbalance
    *              estimates; alpha = 0 freezes both at their seeds,
    *              i.e. a fixed threshold initTicks·max(|initImbalance|,
    *              minImbalance) — the SQL-oracle-able configuration.
    */
  def tickImbalanceBars(
      df: DataFrame,
      initTicks: Double = 100.0,
      initImbalance: Double = 0.2,
      minImbalance: Double = 0.05,
      alpha: Double = 0.1,
      c: TradingCols = TradingCols.default,
  ): DataFrame = {
    require(alpha >= 0 && alpha <= 1, "alpha in [0,1]")
    val spark = df.sparkSession
    import spark.implicits._

    val sorted = df.na
      .drop(Seq(c.price))
      .select(
        col(c.symbol).cast("string").as("symbol"),
        col(c.ts).cast("timestamp").as("ts"),
        col(c.price).cast("double").as("price"),
        col(c.size).cast("long").as("size"),
        col(c.tradeId).cast("long").as("trade_id"),
      )
      .repartition(col("symbol"))
      .sortWithinPartitions(col("symbol"), col("ts"), col("trade_id"))
      .as[(String, java.sql.Timestamp, Double, Long, Long)]

    sorted
      .mapPartitions { it =>
        var curSym: String = null
        // tick-rule and threshold state
        var prevPrice = Double.NaN
        var prevSign = 1
        var expT = initTicks
        var expB = initImbalance
        // open-bar accumulators
        var n = 0L; var theta = 0L
        var tsS: java.sql.Timestamp = null; var tsE: java.sql.Timestamp = null
        var o, h, l, cl = 0.0
        var vol = 0L; var pv = 0.0

        def resetBar(): Unit = { n = 0L; theta = 0L; tsS = null; vol = 0L; pv = 0.0 }

        new Iterator[BarRow] {
          private var pending: BarRow = null
          override def hasNext: Boolean = {
            while (pending == null && it.hasNext) {
              val (sym, ts, price, size, _) = it.next()
              if (sym != curSym) {
                curSym = sym; prevPrice = Double.NaN; prevSign = 1
                expT = initTicks; expB = initImbalance
                resetBar()
              }
              val sign =
                if (prevPrice.isNaN || price == prevPrice) prevSign
                else if (price > prevPrice) 1
                else -1
              prevPrice = price; prevSign = sign
              if (n == 0L) { tsS = ts; o = price; h = price; l = price }
              n += 1; theta += sign; tsE = ts
              h = math.max(h, price); l = math.min(l, price); cl = price
              vol += size; pv += price * size
              val threshold = expT * math.max(math.abs(expB), minImbalance)
              if (math.abs(theta.toDouble) >= threshold) {
                pending = BarRow(sym, tsS, tsE, o, h, l, cl, vol, pv / vol, n, theta)
                expT = (1 - alpha) * expT + alpha * n
                expB = (1 - alpha) * expB + alpha * (theta.toDouble / n)
                resetBar()
              }
            }
            pending != null
          }
          override def next(): BarRow = {
            val r = pending; pending = null; r
          }
        }
      }
      .toDF()
  }
}
