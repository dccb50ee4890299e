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
}
