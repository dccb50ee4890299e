package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.api.TradingCols

/** Backtest statistics (AFML ch.14): per-symbol daily-return Sharpe
  * ratio with its higher-moment reality check — the probabilistic
  * Sharpe ratio
  *
  *   PSR(SR*) = Φ( (SR − SR*)·√(n−1) /
  *                 √(1 − γ₃·SR + ((γ₄−1)/4)·SR²) )
  *
  * (Bailey & López de Prado 2012): the probability the observed SR
  * exceeds the benchmark once non-normality (skew γ₃, kurtosis γ₄)
  * and track length are priced in.
  *
  * Determinism: daily closes are exact cents; the four return-moment
  * sums fold LEFT-TO-RIGHT in date order over the per-symbol sorted
  * day array (bounded — days per symbol, not ticks), the statistic is
  * one fixed double tree over them, and Φ evaluates through
  * [[BetSizing.erfApprox]] — every step replicated op-for-op by the
  * oracle. Consecutive PRESENT days define returns (calendar gaps are
  * adjacent observations, the standard daily-bar convention).
  */
object BacktestStats {

  /** Maximum drawdown per symbol over daily closes: the deepest
    * peak-to-trough loss (runmax − close)/runmax. Exact-cents daily
    * closes and a running-max window keep every per-day drawdown a
    * ratio of integers; the max over days is order-independent, so
    * no fold discipline is needed. Output: symbol, n_days,
    * max_drawdown (0.0 for a monotone series).
    */
  def maxDrawdown(df: DataFrame, c: TradingCols = TradingCols.default): DataFrame = {
    val daily = dailyCloses(df, c)
    val wD = Window
      .partitionBy(col("symbol"))
      .orderBy(col("date"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("__peak", max(col("close_pc")).over(wD))
      .withColumn(
        "__dd",
        (col("__peak") - col("close_pc")).cast("double") / col("__peak").cast("double"),
      )
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_days"), max(col("__dd")).as("max_drawdown"))
  }

  private def dailyCloses(df: DataFrame, c: TradingCols): DataFrame =
    df.na
      .drop(Seq(c.price))
      .select(
        col(c.symbol).cast("string").as("symbol"),
        to_date(col(c.ts)).as("date"),
        col(c.ts).as("ts"),
        round(col(c.price) * 100).cast("long").as("pc"),
        col(c.tradeId).cast("long").as("trade_id"),
      )
      .groupBy(col("symbol"), col("date"))
      .agg(max_by(col("pc"), struct(col("ts"), col("trade_id"))).as("close_pc"))

  /** Output: symbol, n_days, sharpe (per-day, unannualized), skew,
    * kurt (non-excess), psr. Null stats when fewer than 3 returns or
    * a degenerate (zero-variance) series.
    */
  def psr(
      df: DataFrame,
      srBenchmark: Double = 0.0,
      c: TradingCols = TradingCols.default,
  ): DataFrame = {
    val daily = dailyCloses(df, c)
    val wD = Window.partitionBy(col("symbol")).orderBy(col("date"))
    val rets = daily
      .withColumn("__prev", lag(col("close_pc"), 1).over(wD))
      .where(col("__prev").isNotNull)
      .withColumn("__r", col("close_pc").cast("double") / col("__prev").cast("double") - 1)
    val arr = rets
      .groupBy(col("symbol"))
      .agg(sort_array(collect_list(struct(col("date").as("d"), col("__r").as("r")))).as("__a"))
    def fold(power: Column => Column): Column =
      aggregate(col("__a"), lit(0.0), (acc, x) => acc + power(x("r")))
    val stats = arr.select(
      col("symbol"),
      size(col("__a")).cast("long").as("n_days"),
      fold(r => r).as("__s1"),
      fold(r => r * r).as("__s2"),
      fold(r => r * r * r).as("__s3"),
      fold(r => r * r * r * r).as("__s4"),
    )
    val n = col("n_days").cast("double")
    val m = col("__s1") / n
    val c2 = col("__s2") / n - m * m
    val c3 = col("__s3") / n - lit(3.0) * m * (col("__s2") / n) + lit(2.0) * m * m * m
    val c4 = col("__s4") / n - lit(4.0) * m * (col("__s3") / n) +
      lit(6.0) * m * m * (col("__s2") / n) - lit(3.0) * m * m * m * m
    // ANSI mode: the c2 divisions must be reached only when c2 > 0 —
    // guard them directly so null propagates through den/z and the
    // `ok` predicate instead of aborting the job on a flat series
    val sd = when(c2 > 0.0, sqrt(c2 * n / (n - lit(1.0))))
    val sr = m / sd
    val skew = when(c2 > 0.0, c3 / (c2 * sqrt(c2)))
    val kurt = when(c2 > 0.0, c4 / (c2 * c2))
    val den = lit(1.0) - skew * sr + (kurt - lit(1.0)) / lit(4.0) * sr * sr
    val z = (sr - lit(srBenchmark)) * sqrt(n - lit(1.0)) / sqrt(den)
    val ok = col("n_days") >= 3 && c2 > 0.0 && den > 0.0
    stats.select(
      col("symbol"),
      col("n_days"),
      when(ok, sr).as("sharpe"),
      when(ok, skew).as("skew"),
      when(ok, kurt).as("kurt"),
      when(ok, lit(0.5) * (lit(1.0) + BetSizing.erfApprox(z / lit(math.sqrt(2.0)))))
        .as("psr"),
    )
  }
}
