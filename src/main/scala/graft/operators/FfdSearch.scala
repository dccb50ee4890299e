package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.api.TradingCols
import graft.functions.FracDiff

/** Minimum-d search for fractional differencing (AFML ch.5.5): for a
  * grid of d values, fractionally difference the price series and run
  * the ADF regression  Δx_t = α + β·x_{t-1} + ε  on the result — the
  * smallest d whose ADF t-stat clears the critical value is "the
  * least differencing that achieves stationarity while preserving
  * maximal memory", the chapter's headline deliverable.
  *
  * Output: one row per (symbol, d) with the ADF t-stat, observation
  * count, and a stationary flag at the 5% critical value (-2.86) —
  * the per-symbol min d is then a trivial filter.
  *
  * Determinism: FFD values are doubles, so the ADF moments are
  * accumulated by a per-(symbol, d) ORDERED fold over the
  * (ts, trade_id)-sorted series (a parallel double SUM would drift
  * with partitioning); the oracle replays the identical fold with a
  * DuckDB list_reduce over a scalar-struct accumulator. The t-stat
  * tree then matches op-for-op.
  *
  * Scale note: the ordered fold collects each (symbol, d) series into
  * one task — the price of bit-stable double moments over a
  * non-associative reduction. ~10^8 rows per symbol is a few GB of
  * doubles and fine; beyond that, the segmented-scan pattern
  * (Ewm.stdOverKeyChunked) applies at the cost of a documented
  * tolerance instead of bit-equality.
  */
object FfdSearch {

  val CriticalValue5pct: Double = -2.86

  def adfGrid(
      df: DataFrame,
      ds: Seq[Double] = Seq(0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
      threshold: Double = 1e-3,
      c: TradingCols = TradingCols.default,
  ): DataFrame = {
    require(ds.nonEmpty && ds == ds.distinct)
    val perD = ds.map { d =>
      val v = FracDiff.fracDiff(
        col(c.price),
        d,
        threshold,
        Seq(col(c.symbol)),
        Seq(col(c.ts), col(c.tradeId)),
      )
      val base = df
        .select(
          col(c.symbol).as("symbol"),
          unix_micros(col(c.ts).cast("timestamp")).as("__us"),
          col(c.tradeId).cast("long").as("__tid"),
          v.as("__v"),
        )
        .where(col("__v").isNotNull)
      val zero = struct(
        lit(0L).as("n"), lit(0.0).as("prev"),
        lit(0.0).as("sx"), lit(0.0).as("sxx"), lit(0.0).as("sd"),
        lit(0.0).as("sdd"), lit(0.0).as("sxd"),
      )
      val folded = base
        .groupBy(col("symbol"))
        .agg(
          aggregate(
            transform(
              array_sort(collect_list(struct(col("__us"), col("__tid"), col("__v")))),
              x => x.getField("__v"),
            ),
            zero,
            (st, y) => {
              val n = st.getField("n")
              val x = st.getField("prev")
              val dd = y - x
              struct(
                (n + 1).as("n"),
                y.as("prev"),
                when(n === 0L, lit(0.0)).otherwise(st.getField("sx") + x).as("sx"),
                when(n === 0L, lit(0.0)).otherwise(st.getField("sxx") + x * x).as("sxx"),
                when(n === 0L, lit(0.0)).otherwise(st.getField("sd") + dd).as("sd"),
                when(n === 0L, lit(0.0)).otherwise(st.getField("sdd") + dd * dd).as("sdd"),
                when(n === 0L, lit(0.0)).otherwise(st.getField("sxd") + x * dd).as("sxd"),
              )
            },
          ).as("__m")
        )
      // regression sample size = pairs, i.e. series length - 1
      val nd = (col("__m.n") - lit(1L)).cast("double")
      val (sx, sxx, sd, sdd, sxd) = (
        col("__m.sx"), col("__m.sxx"), col("__m.sd"), col("__m.sdd"), col("__m.sxd"),
      )
      val den = nd * sxx - sx * sx
      val num = nd * sxd - sx * sd
      val b = num / den
      val sxxc = den / nd
      val sddc = sdd - sd * sd / nd
      val ssr = sddc - b * b * sxxc
      val tstat = when(col("__m.n") < 3L || den === lit(0.0), lit(0.0))
        .when(ssr <= lit(0.0), signum(num) * lit(1e308))
        .otherwise(b * sqrt(sxxc) / sqrt(ssr / (nd - lit(2.0))))
      folded.select(
        col("symbol"),
        lit(d).as("d"),
        (col("__m.n") - 1L).as("n_obs"),
        tstat.as("adf_t"),
        (tstat < lit(CriticalValue5pct)).cast("int").as("stationary"),
      )
    }
    perD.reduceLeft(_.unionByName(_))
  }
}
