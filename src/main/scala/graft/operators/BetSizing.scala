package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bet sizing from predicted probabilities (AFML ch.10): a model's
  * P[label=1] becomes a position size via the test statistic
  * z = (p − 1/2) / √(p(1−p)) and m = side · (2Φ(z) − 1)
  * = side · erf(z/√2), discretized to a step grid so strategies
  * don't churn on noise.
  *
  * Φ needs erf, which neither Spark nor the JVM standard library
  * provides; both engines here evaluate the SAME Abramowitz-Stegun
  * 7.1.26 polynomial (|ε| ≤ 1.5e−7, far below the 0.1 size grid) —
  * a fixed double tree over builtins (abs/signum/exp/Horner chain),
  * fully codegen'd, replicated op-for-op by the DuckDB oracle. Pure
  * map-side projection: zero shuffles, trivially 100 TB-safe.
  */
object BetSizing {

  /** Abramowitz-Stegun 7.1.26 erf approximation as a Column tree. */
  def erfApprox(x: Column): Column = {
    val s = signum(x)
    val a = abs(x)
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * a)
    val poly = t * (lit(0.254829592) + t * (lit(-0.284496736) +
      t * (lit(1.421413741) + t * (lit(-1.453152027) + t * lit(1.061405429)))))
    s * (lit(1.0) - poly * exp(-(a * a)))
  }

  /** Average active bet (AFML ch.10.3): at each bet's start, the
    * average size of EVERY bet whose [t0, t1] interval covers that
    * instant (its own included) — concurrent signals reinforce or
    * dampen each other instead of churning positions one label at a
    * time.
    *
    * Scale shape: the active-set lookup is [[RangeJoin.intervalJoin]]
    * (bucketed interval decomposition — no per-key cross join), and
    * the double average folds in contributor-id order over the
    * per-point sorted array (bounded by bet concurrency), so the
    * result is partition-invariant and oracle-replayable exactly.
    *
    * @param bets one row per bet: `event_id` (unique long), `t0`,
    *   `t1` (timestamps), `bet_size`
    * @param bucketMicros interval-join bucket width — pick ~ the
    *   typical bet duration
    */
  def avgActiveBets(bets: DataFrame, bucketMicros: Long): DataFrame = {
    val intervals = bets.select(
      col("event_id").as("__iid"),
      col("t0"),
      col("t1"),
      col("bet_size").as("__m"),
    )
    val points = bets.select(col("event_id"), col("t0").as("__pt"))
    RangeJoin
      .intervalJoin(
        intervals, points,
        by = Seq.empty, startCol = "t0", endCol = "t1", pointCol = "__pt",
        bucketMicros = bucketMicros, inclusiveStart = true,
      )
      .groupBy(col("event_id"), col("__pt").as("ts"))
      .agg(
        sort_array(collect_list(struct(col("__iid").as("i"), col("__m").as("m")))).as("__arr")
      )
      .select(
        col("event_id"),
        col("ts"),
        size(col("__arr")).cast("long").as("n_active"),
        (aggregate(col("__arr"), lit(0.0), (acc, x) => acc + x("m")) /
          size(col("__arr")).cast("double")).as("avg_bet"),
      )
  }

  /** Adds `bet_z` (the probability test statistic) and `bet_size`
    * (side-signed, step-discretized) to a frame of predictions.
    *
    * @param probCol P[label = 1], in (0, 1)
    * @param sideCol forecast side, +1 / −1
    * @param step discretization grid (AFML's stepSize)
    */
  def betSize(
      df: DataFrame,
      probCol: String = "prob",
      sideCol: String = "side",
      step: Double = 0.1,
  ): DataFrame = {
    require(step > 0 && step <= 1, "step in (0, 1]")
    val p = col(probCol)
    val z = (p - lit(0.5)) / sqrt(p * (lit(1.0) - p))
    val m = col(sideCol) * erfApprox(z / lit(math.sqrt(2.0)))
    // + 0.0 canonicalizes IEEE signed zero: Spark's Round (via
    // BigDecimal) emits +0.0 where DuckDB's round keeps -0.0 for
    // sizes in (-step/2, 0); x + 0.0 == x for every other double.
    df.withColumn("bet_z", z)
      .withColumn("bet_size", round(m / lit(step)) * lit(step) + lit(0.0))
  }
}
