package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.api.TradingCols

/** Bounded SADF — supremum ADF explosiveness statistic (AFML ch.17 /
  * Phillips-Shi-Yu, beyond the reference): for each observation, run
  * the ADF regression  Δy_t = α + β·y_{t-1} + ε  over every BACKWARD
  * window length n in [minWindow, maxWindow] ending at t, and take
  * the supremum of the β t-statistics (the bubble/structural-break
  * detector; the unbounded PSY sup over all start points is O(T) per
  * row — the bounded window set is the scalable form and the common
  * deployment).
  *
  * Same machinery as TrendScan: five cumulative BIGINT moments
  * (Σx, Σx², Σd, Σd², Σxd for x = lagged cents, d = cent delta), one
  * struct lag per window length (lag, not lead — windows look BACK),
  * sup via lexicographic struct array_max on (t, -n). All moments are
  * exact integers, the t-stat is a fixed double tree — engine-exact,
  * replicated by the DuckDB oracle; brute-force bit-equality pinned
  * in ScalaTest.
  *
  * Degenerate guards (replicated by the oracle): zero x-variance in
  * a window → that candidate scores 0.0 t-stat (flat price carries
  * no explosiveness evidence); perfect fit (SSR ≤ 0) → ±1e308 by the
  * sign of the slope numerator.
  *
  * Scale: one exchange on symbol, every window function rides one
  * sort. Windows are bounded by maxWindow, so the (symbol, day) halo
  * chunking used by TrendScan.labelsChunked applies symmetrically
  * (previous-day tail instead of next-day head) if symbol-level
  * parallelism ever binds.
  */
object Sadf {

  def sadf(
      df: DataFrame,
      minWindow: Int = 10,
      maxWindow: Int = 40,
      c: TradingCols = TradingCols.default,
  ): DataFrame = {
    require(minWindow >= 4, "ADF t-stat needs n-2 > 1")
    require(maxWindow >= minWindow)
    val ord = Window.partitionBy(col("__sym")).orderBy(col("__ts"), col("__tid"))
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val base = df
      .select(
        col(c.symbol).cast("string").as("__sym"),
        col(c.ts).cast("timestamp").as("__ts"),
        col(c.price).cast("double").as("__price"),
        col(c.tradeId).cast("long").as("__tid"),
      )
      .withColumn("__cents", round(col("__price") * 100).cast("long"))
      .withColumn("__x", lag(col("__cents"), 1).over(ord)) // y_{t-1}
      .withColumn("__d", col("__cents") - col("__x")) // Δy_t
      .where(col("__x").isNotNull)
      .withColumn("__rn", row_number().over(ord).cast("long"))
      .withColumn("__cx", sum(col("__x")).over(cum))
      .withColumn("__cxx", sum(col("__x") * col("__x")).over(cum))
      .withColumn("__cd", sum(col("__d")).over(cum))
      .withColumn("__cdd", sum(col("__d") * col("__d")).over(cum))
      .withColumn("__cxd", sum(col("__x") * col("__d")).over(cum))

    val ns = minWindow to maxWindow
    // one struct lag per window length (cf. TrendScan: Spark plans
    // every textual window expression separately — pack the five
    // cumsums into a single lag)
    val cums = struct(
      col("__cx").as("cx"), col("__cxx").as("cxx"), col("__cd").as("cd"),
      col("__cdd").as("cdd"), col("__cxd").as("cxd"),
    )
    val lagCols = ns.map(n => lag(cums, n).over(ord).as(s"__s_$n"))
    val withLags = base.select(
      Seq(
        col("__sym"), col("__ts"), col("__tid"), col("__price"), col("__rn"),
        col("__cx"), col("__cxx"), col("__cd"), col("__cdd"), col("__cxd"),
      ) ++ lagCols: _*
    )

    // backward-window moments: S = cum(t) - cum(t-n); lag(cum, n) is
    // null for the first n rows -> those candidates drop with __full
    def windowCols(n: Int): Seq[Column] = {
      val sx = col("__cx") - col(s"__s_$n.cx")
      val sxx = col("__cxx") - col(s"__s_$n.cxx")
      val sd = col("__cd") - col(s"__s_$n.cd")
      val sdd = col("__cdd") - col(s"__s_$n.cdd")
      val sxd = col("__cxd") - col(s"__s_$n.cxd")
      val den = lit(n.toLong) * sxx - sx * sx // n * centered Sxx (BIGINT)
      val num = lit(n.toLong) * sxd - sx * sd
      val b = num.cast("double") / den.cast("double")
      val sxxc = den.cast("double") / lit(n.toDouble)
      val sddc = sdd.cast("double") - sd.cast("double") * sd.cast("double") / lit(n.toDouble)
      val ssr = sddc - b * b * sxxc
      val tstat = when(den === 0L, lit(0.0))
        .when(ssr <= lit(0.0), signum(num).cast("double") * lit(1e308))
        .otherwise(b * sqrt(sxxc) / sqrt(ssr / lit((n - 2).toDouble)))
      // beta guarded too: a zero-variance window has no slope (0.0,
      // not 0/0) — keeps the output finite and engine-exact
      Seq(tstat.as(s"__t_$n"), when(den === 0L, lit(0.0)).otherwise(b).as(s"__b_$n"))
    }

    val projected = withLags.select(
      Seq(col("__sym"), col("__ts"), col("__tid"), col("__price"), col("__rn")) ++
        ns.flatMap(windowCols): _*
    )
    val cands = array(ns.map { n =>
      struct(
        col(s"__t_$n").as("t"),
        lit(-n).as("nn"),
        col(s"__b_$n").as("b"),
        lit(n).as("n"),
      )
    }: _*)
    projected
      // the longest backward window must fit (rn > maxWindow); the
      // Window below is also the CollapseProject barrier (TrendScan)
      .withColumn("__have", lag(col("__rn"), maxWindow).over(ord).isNotNull)
      .where(col("__have"))
      .withColumn("__best", array_max(cands))
      .select(
        col("__sym").as(c.symbol),
        col("__ts").as(c.ts),
        col("__price").as(c.price),
        col("__best.n").as("best_window"),
        col("__best.b").as("beta"),
        col("__best.t").as("sadf"),
      )
  }
}
