package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.api.TradingCols

/** Feature evaluation by information coefficient (the Spearman rank
  * IC used to screen alpha features before model fitting — the
  * feature-importance step AFML ch.8 motivates, in its rank form):
  * per symbol, the rank correlation between a signal observed at t
  * and the forward return earned after t.
  *
  * Exactness: both series are reduced to INTEGER ranks (row_number
  * with the unique trade-id tie-break — a deterministic permutation,
  * so no average-rank rationals), making every correlation moment an
  * exact BIGINT; the IC is one final double tree, replicated
  * op-for-op by the oracle. Parallelism: the rank windows partition
  * by symbol (the same per-symbol window shape as the declarative
  * SADF/trend forms), then one map-side-combinable aggregation.
  */
object FeatureIc {

  /** Per-symbol Spearman IC between `featureCol` and `targetCol`
    * (rows where either is null are dropped first).
    *
    * Because the tie-broken ranks are PERMUTATIONS of 1..n, the
    * closed form ρ = 1 − 6·Σd² / (n(n²−1)) with d = rank_f − rank_t
    * is exact — and keeps the integer moments at O(n³) instead of the
    * O(n⁴) raw-moment form, BIGINT-safe to n ≈ 1.1e6 rows per symbol
    * (sample the evaluation set above that, as any IC screen does).
    * Output: symbol, n, ic (null when n < 2).
    *
    * Tie handling — a deliberate deviation from textbook Spearman:
    * tied feature/target values are broken by trade id (first by id
    * ranks lower), NOT averaged. On tie-free data this IS Spearman
    * rho; on tie-heavy data (discretized signals) the result depends
    * on trade-id assignment and differs from the average-rank rho.
    * The tie-break is what keeps the moments exact integers (average
    * ranks are rationals, so FP fold order would leak in). For
    * tie-heavy features use [[spearmanIcAvgRank]], which implements
    * the standard average-rank rho (FP-deterministic via per-symbol
    * ordered folds, at the cost of one extra window pass).
    */
  def spearmanIc(
      df: DataFrame,
      featureCol: String,
      targetCol: String,
      c: TradingCols = TradingCols.default,
  ): DataFrame = {
    val base = df
      .where(col(featureCol).isNotNull && col(targetCol).isNotNull)
      .select(
        col(c.symbol).cast("string").as("symbol"),
        col(featureCol).as("__f"),
        col(targetCol).as("__t"),
        col(c.tradeId).cast("long").as("__tid"),
      )
    val wF = Window.partitionBy(col("symbol")).orderBy(col("__f"), col("__tid"))
    val wT = Window.partitionBy(col("symbol")).orderBy(col("__t"), col("__tid"))
    base
      .withColumn("__rf", row_number().over(wF).cast("long"))
      .withColumn("__rt", row_number().over(wT).cast("long"))
      .withColumn("__d", col("__rf") - col("__rt"))
      .groupBy(col("symbol"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("__d") * col("__d")).as("__sd2"),
      )
      .select(
        col("symbol"),
        col("n"),
        when(
          col("n") > 1,
          lit(1.0) - (lit(6L) * col("__sd2")).cast("double") /
            (col("n") * (col("n") * col("n") - 1)).cast("double"),
        ).as("ic"),
      )
  }

  /** Textbook Spearman rho with AVERAGE ranks for ties — the variant
    * to use on tie-heavy (discretized) features, where the tie-broken
    * [[spearmanIc]] depends on trade-id assignment.
    *
    * Exactness without FP folds: the average rank of a tie group is a
    * half-integer, so we carry DOUBLED ranks r2 = 2·minrank + ties − 1
    * as exact BIGINTs (the factor 2 cancels in Pearson). Under ties
    * the 6Σd² shortcut is biased, so this computes the Pearson rho of
    * the rank vectors; since Σr2 is always n(n+1) (rank sums are
    * tie-invariant), only three BIGINT moments are needed —
    * Σx², Σy², Σxy — all map-side combinable, BIGINT-safe to
    * n ≈ 1.3e6 rows per symbol (4n³ < 2⁶³). The final rho is one
    * double tree over exact integers, replicated op-for-op by the
    * oracle. Output: symbol, n, ic (null when a column is constant or
    * n < 2).
    */
  def spearmanIcAvgRank(
      df: DataFrame,
      featureCol: String,
      targetCol: String,
      c: TradingCols = TradingCols.default,
  ): DataFrame = {
    val base = df
      .where(col(featureCol).isNotNull && col(targetCol).isNotNull)
      .select(
        col(c.symbol).cast("string").as("symbol"),
        col(featureCol).as("__f"),
        col(targetCol).as("__t"),
      )
    val wF = Window.partitionBy(col("symbol")).orderBy(col("__f"))
    val wT = Window.partitionBy(col("symbol")).orderBy(col("__t"))
    val tF = Window.partitionBy(col("symbol"), col("__f"))
    val tT = Window.partitionBy(col("symbol"), col("__t"))
    val n = col("n")
    val s = n * (n + 1) // Σr2 for either column, exact
    val num = col("__sxy").cast("double") * n.cast("double") -
      s.cast("double") * s.cast("double")
    val vx = col("__sxx").cast("double") * n.cast("double") -
      s.cast("double") * s.cast("double")
    val vy = col("__syy").cast("double") * n.cast("double") -
      s.cast("double") * s.cast("double")
    base
      // doubled average rank: 2·minrank + tiecount − 1 (exact BIGINT)
      .withColumn("__rf", lit(2L) * rank().over(wF) + count(lit(1)).over(tF) - 1)
      .withColumn("__rt", lit(2L) * rank().over(wT) + count(lit(1)).over(tT) - 1)
      .groupBy(col("symbol"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("__rf") * col("__rf")).as("__sxx"),
        sum(col("__rt") * col("__rt")).as("__syy"),
        sum(col("__rf") * col("__rt")).as("__sxy"),
      )
      .select(
        col("symbol"),
        n,
        when(n > 1 && vx > 0.0 && vy > 0.0, num / sqrt(vx * vy)).as("ic"),
      )
  }
}
