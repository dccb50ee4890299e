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

  // NOT private: the Dataset encoder's generated (Janino) code invokes
  // the accessors reflectively-by-name; a private nested class makes
  // them unresolvable and every imbalance query silently falls back to
  // interpreted serialization (observed in the r6 Verify log).
  final case class BarRow(
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
  final case class RunBarRow(
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
      up_ticks: Long,
      down_ticks: Long,
  )

  /** Dollar imbalance bars (AFML ch.2.3.2.2): θ accumulates
    * sign_t · dollarValue_t (exact integer cents); the bar closes when
    * |θ| reaches E[T]·|E[signed dollars/tick]| — EWMA-adaptive, or
    * frozen at initTicks·initDollarImbalance·100 cents when alpha=0
    * (the SQL-oracle-able configuration). Same O(1)-state streaming
    * scan per symbol as [[tickImbalanceBars]].
    */
  def dollarImbalanceBars(
      df: DataFrame,
      initTicks: Double = 100.0,
      /** expected |signed dollars per tick| seed, in dollars. */
      initDollarImbalance: Double = 25.0,
      minDollarImbalance: Double = 1.0,
      alpha: Double = 0.1,
      c: TradingCols = TradingCols.default,
  ): DataFrame = {
    require(alpha >= 0 && alpha <= 1, "alpha in [0,1]")
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = sortedTicks(df, c)
    sorted
      .mapPartitions { it =>
        var curSym: String = null
        var prevPrice = Double.NaN
        var prevSign = 1
        var expT = initTicks
        var expB = initDollarImbalance * 100.0 // cents
        val minB = minDollarImbalance * 100.0
        var n = 0L; var theta = 0L
        var tsS: java.sql.Timestamp = null; var tsE: java.sql.Timestamp = null
        var o, h, l, cl = 0.0
        var vol = 0L; var pv = 0L // pv: exact price·size cents (associative; oracle-bit-stable)
        def resetBar(): Unit = { n = 0L; theta = 0L; tsS = null; vol = 0L; pv = 0L }
        new Iterator[BarRow] {
          private var pending: BarRow = null
          override def hasNext: Boolean = {
            while (pending == null && it.hasNext) {
              val (sym, ts, price, size, _) = it.next()
              if (sym != curSym) {
                curSym = sym; prevPrice = Double.NaN; prevSign = 1
                expT = initTicks; expB = initDollarImbalance * 100.0
                resetBar()
              }
              val sign =
                if (prevPrice.isNaN || price == prevPrice) prevSign
                else if (price > prevPrice) 1
                else -1
              prevPrice = price; prevSign = sign
              if (n == 0L) { tsS = ts; o = price; h = price; l = price }
              val cents = math.round(price * 100) * size
              n += 1; theta += sign * cents; tsE = ts
              h = math.max(h, price); l = math.min(l, price); cl = price
              vol += size; pv += math.round(price * 100) * size
              val threshold = expT * math.max(math.abs(expB), minB)
              if (math.abs(theta.toDouble) >= threshold) {
                pending = BarRow(sym, tsS, tsE, o, h, l, cl, vol, pv.toDouble / 100.0 / vol.toDouble, n, theta)
                if (alpha > 0) {
                  expT = (1 - alpha) * expT + alpha * n
                  expB = (1 - alpha) * expB + alpha * (theta.toDouble / n)
                }
                resetBar()
              }
            }
            pending != null
          }
          override def next(): BarRow = { val r = pending; pending = null; r }
        }
      }
      .toDF()
  }

  /** Volume imbalance bars (AFML ch.2.3.2.2, volume form): θ
    * accumulates sign_t · size_t; close at |θ| >=
    * E[T]·max(|E[signed size/tick]|, minVolumeImbalance) — frozen
    * when alpha=0.
    */
  def volumeImbalanceBars(
      df: DataFrame,
      initTicks: Double = 100.0,
      initVolumeImbalance: Double = 10.0,
      minVolumeImbalance: Double = 1.0,
      alpha: Double = 0.1,
      c: TradingCols = TradingCols.default,
  ): DataFrame = {
    require(alpha >= 0 && alpha <= 1, "alpha in [0,1]")
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = sortedTicks(df, c)
    sorted
      .mapPartitions { it =>
        var curSym: String = null
        var prevPrice = Double.NaN
        var prevSign = 1
        var expT = initTicks
        var expB = initVolumeImbalance
        var n = 0L; var theta = 0L
        var tsS: java.sql.Timestamp = null; var tsE: java.sql.Timestamp = null
        var o, h, l, cl = 0.0
        var vol = 0L; var pv = 0L // pv: exact price·size cents (associative; oracle-bit-stable)
        def resetBar(): Unit = { n = 0L; theta = 0L; tsS = null; vol = 0L; pv = 0L }
        new Iterator[BarRow] {
          private var pending: BarRow = null
          override def hasNext: Boolean = {
            while (pending == null && it.hasNext) {
              val (sym, ts, price, size, _) = it.next()
              if (sym != curSym) {
                curSym = sym; prevPrice = Double.NaN; prevSign = 1
                expT = initTicks; expB = initVolumeImbalance
                resetBar()
              }
              val sign =
                if (prevPrice.isNaN || price == prevPrice) prevSign
                else if (price > prevPrice) 1
                else -1
              prevPrice = price; prevSign = sign
              if (n == 0L) { tsS = ts; o = price; h = price; l = price }
              n += 1; theta += sign * size; tsE = ts
              h = math.max(h, price); l = math.min(l, price); cl = price
              vol += size; pv += math.round(price * 100) * size
              val threshold = expT * math.max(math.abs(expB), minVolumeImbalance)
              if (math.abs(theta.toDouble) >= threshold) {
                pending = BarRow(sym, tsS, tsE, o, h, l, cl, vol, pv.toDouble / 100.0 / vol.toDouble, n, theta)
                if (alpha > 0) {
                  expT = (1 - alpha) * expT + alpha * n
                  expB = (1 - alpha) * expB + alpha * (theta.toDouble / n)
                }
                resetBar()
              }
            }
            pending != null
          }
          override def next(): BarRow = { val r = pending; pending = null; r }
        }
      }
      .toDF()
  }

  /** Tick run bars (AFML ch.2.3.2.3): θ = max(up-tick count,
    * down-tick count) in the open bar; closes at θ >= E[T]·max(P[up],
    * 1-P[up]) — EWMA-adaptive, frozen at initTicks·initPmax when
    * alpha=0. Output carries both run counts.
    */
  def tickRunBars(
      df: DataFrame,
      initTicks: Double = 100.0,
      initPmax: Double = 0.55,
      alpha: Double = 0.1,
      c: TradingCols = TradingCols.default,
  ): DataFrame = {
    require(alpha >= 0 && alpha <= 1, "alpha in [0,1]")
    require(initPmax >= 0.5 && initPmax <= 1.0, "initPmax in [0.5,1]")
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = sortedTicks(df, c)
    sorted
      .mapPartitions { it =>
        var curSym: String = null
        var prevPrice = Double.NaN
        var prevSign = 1
        var expT = initTicks
        var pMax = initPmax
        var n = 0L; var up = 0L; var down = 0L
        var tsS: java.sql.Timestamp = null; var tsE: java.sql.Timestamp = null
        var o, h, l, cl = 0.0
        var vol = 0L; var pv = 0L // pv: exact price·size cents (associative; oracle-bit-stable)
        def resetBar(): Unit = { n = 0L; up = 0L; down = 0L; tsS = null; vol = 0L; pv = 0L }
        new Iterator[RunBarRow] {
          private var pending: RunBarRow = null
          override def hasNext: Boolean = {
            while (pending == null && it.hasNext) {
              val (sym, ts, price, size, _) = it.next()
              if (sym != curSym) {
                curSym = sym; prevPrice = Double.NaN; prevSign = 1
                expT = initTicks; pMax = initPmax
                resetBar()
              }
              val sign =
                if (prevPrice.isNaN || price == prevPrice) prevSign
                else if (price > prevPrice) 1
                else -1
              prevPrice = price; prevSign = sign
              if (n == 0L) { tsS = ts; o = price; h = price; l = price }
              n += 1; if (sign > 0) up += 1 else down += 1
              tsE = ts
              h = math.max(h, price); l = math.min(l, price); cl = price
              vol += size; pv += math.round(price * 100) * size
              val threshold = expT * pMax
              if (math.max(up, down).toDouble >= threshold) {
                pending = RunBarRow(sym, tsS, tsE, o, h, l, cl, vol, pv.toDouble / 100.0 / vol.toDouble, n, up, down)
                if (alpha > 0) {
                  expT = (1 - alpha) * expT + alpha * n
                  pMax = (1 - alpha) * pMax + alpha * (math.max(up, down).toDouble / n)
                }
                resetBar()
              }
            }
            pending != null
          }
          override def next(): RunBarRow = { val r = pending; pending = null; r }
        }
      }
      .toDF()
  }

  /** Shared per-symbol sorted tick stream for the streaming scans. */
  private def sortedTicks(df: DataFrame, c: TradingCols) = {
    val spark = df.sparkSession
    import spark.implicits._
    df.na
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
  }

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
    val sorted = sortedTicks(df, c)
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
        var vol = 0L; var pv = 0L // pv: exact price·size cents (associative; oracle-bit-stable)

        def resetBar(): Unit = { n = 0L; theta = 0L; tsS = null; vol = 0L; pv = 0L }

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
              vol += size; pv += math.round(price * 100) * size
              val threshold = expT * math.max(math.abs(expB), minImbalance)
              if (math.abs(theta.toDouble) >= threshold) {
                pending = BarRow(sym, tsS, tsE, o, h, l, cl, vol, pv.toDouble / 100.0 / vol.toDouble, n, theta)
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
