package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.api.TradingCols

/** Chu-Stinchcombe-White levels CUSUM test (AFML ch.17.4.2, beyond
  * the reference — the structural-break detector next to [[Sadf]]):
  * for each observation t, the standardized departure from a past
  * reference level,
  *
  *   S_{n,t} = (y_t − y_{t−n}) / (σ̂_t · √n),
  *
  * taken as the SUPREMUM over backward lags n ∈ [minLag, maxLag]
  * (the bounded lag set is the scalable form, exactly like the
  * bounded SADF window set), where σ̂²_t = (Σ_{i≤t} Δy_i²) / (#Δ up
  * to t) is the expanding variance of one-step changes. The paired
  * one-sided critical value b(n) = √(b₀ + ln n) with b₀ = 4.6 (the
  * 0.05-level constant from the CSW paper) is emitted alongside so
  * `cs_stat > cs_crit` flags a break.
  *
  * Exactness: y is integer cents, so y_t − y_{t−n} and the Δ²-sum
  * are exact BIGINTs; the statistic is one fixed double tree over
  * them, replicated op-for-op by the DuckDB oracle (lag columns +
  * unnest + QUALIFY argmax). Sup tie-break: smallest lag. σ̂ = 0
  * (flat history) → 0.0, the no-evidence convention shared with
  * Sadf's zero-variance guard.
  *
  * Scale shape (the sadfScan pattern): one hash exchange on symbol,
  * sortWithinPartitions, then an O(maxLag)-state streaming pass over
  * a ring of the last maxLag+1 level snapshots — ~3 flops per
  * (row, lag), no windows, no per-row allocation.
  */
object StructuralBreak {

  final case class CswRow(
      symbol: String,
      ts: java.sql.Timestamp,
      price: Double,
      best_lag: Int,
      cs_stat: Double,
      cs_crit: Double,
  )

  def cswScan(
      df: DataFrame,
      minLag: Int = 10,
      maxLag: Int = 40,
      c: TradingCols = TradingCols.default,
  ): DataFrame = {
    require(minLag >= 1, "lag must be positive")
    require(maxLag >= minLag, "maxLag >= minLag")
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
        val ringLen = maxLag + 1
        val ring = new Array[Long](ringLen)
        var curSym: String = null
        var rn = 0L // 0-based row index within symbol; #deltas = rn
        var prevCents = 0L
        var cdd = 0L // Σ Δ² (exact)
        new Iterator[CswRow] {
          private var pending: CswRow = null
          override def hasNext: Boolean = {
            while (pending == null && it.hasNext) {
              val (sym, ts, price, _) = it.next()
              // HALF_UP like Catalyst/DuckDB round(): plain math.round
              // sends negative half-cents toward +inf
              val cents = graft.streaming.StatefulBars.cents(price)
              if (sym != curSym) {
                curSym = sym; rn = 0L; cdd = 0L
                ring(0) = cents; prevCents = cents
              } else {
                rn += 1
                val d = cents - prevCents
                prevCents = cents
                cdd += d * d
                ring((rn % ringLen).toInt) = cents
                if (rn >= maxLag) {
                  var bestS = Double.NegativeInfinity
                  var bestN = minLag
                  if (cdd == 0L) { bestS = 0.0 }
                  else {
                    val sigma = math.sqrt(cdd.toDouble / rn.toDouble)
                    var n = minLag
                    while (n <= maxLag) {
                      val dy = cents - ring(((rn - n) % ringLen).toInt)
                      val s = dy.toDouble / (sigma * math.sqrt(n.toDouble))
                      if (s > bestS) { bestS = s; bestN = n }
                      n += 1
                    }
                  }
                  pending = CswRow(
                    sym, ts, price, bestN, bestS,
                    math.sqrt(4.6 + math.log(bestN.toDouble)),
                  )
                }
              }
            }
            pending != null
          }
          override def next(): CswRow = {
            val r = pending; pending = null; r
          }
        }
      }
      .toDF()
  }
}
