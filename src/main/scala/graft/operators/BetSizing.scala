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

  /** Dynamic bet sizing from price divergence (AFML ch.10.4, the
    * `getTPos` family; ref: tests exercise the static grid — this is
    * the target-position completion the chapter treats as one unit):
    * a forecast-vs-market divergence x = f − p maps to a bounded
    * size m = x / √(w + x²) ∈ (−1, 1), a whole-share target position
    * ⌊m·maxPos⌋ (truncated toward zero, so positions only open once
    * conviction clears a full share), and the break-even limit price
    * for the order that moves |pos| → |tPos| — the average of the
    * inverse-size prices at each share step j, since share j breaks
    * even exactly where the size function would hold j/maxPos.
    *
    * Calibration: w = x₀²·(m₀⁻² − 1) makes divergence x₀ produce
    * size m₀ (AFML's getW).
    *
    * Exactness: pure map-side projection (zero shuffles, 100 TB-safe
    * trivially); the per-row limit-price fold runs over
    * `sequence(|pos|+1, |tPos|)` in ascending share order, so it is
    * partition-invariant and replayed op-for-op by the oracle's
    * list_reduce. The fold is O(maxPos) per row — maxPos is a
    * per-strategy constant (10²–10⁴), not a data dimension.
    *
    * Adds: `bet_m` (continuous size), `t_pos` (target position),
    * `limit_price` (null when the order would not increase the
    * position in its own direction — no break-even price exists for
    * a reducing or crossing order under the one-sided size curve).
    *
    * @param forecastCol forecast price f
    * @param priceCol    market price p
    * @param maxPos      position cap in shares (> 0)
    * @param x0          calibration divergence
    * @param m0          size reached at divergence x0, in (0, 1)
    * @param posCol      current position in shares; defaults to flat
    */
  def dynamicBetSize(
      df: DataFrame,
      forecastCol: String = "forecast",
      priceCol: String = "price",
      maxPos: Int = 100,
      x0: Double = 0.5,
      m0: Double = 0.95,
      posCol: Option[String] = None,
  ): DataFrame = {
    require(maxPos > 0, "maxPos > 0")
    require(m0 > 0 && m0 < 1, "m0 in (0, 1)")
    require(x0 > 0, "x0 > 0")
    // identical literal tree on the oracle side → identical double
    val w = lit(x0) * lit(x0) * (lit(1.0) / (lit(m0) * lit(m0)) - lit(1.0))
    val f = col(forecastCol)
    val x = f - col(priceCol)
    val m = x / sqrt(w + x * x)
    val tpos = (m * lit(maxPos.toDouble)).cast("long")
    val pos = posCol.map(col(_).cast("long")).getOrElse(lit(0L))
    val absT = abs(tpos)
    val absP = abs(pos)
    // order direction must extend the position: same sign, larger size
    // |t_pos| == maxPos only when m rounds to exactly ±1.0 in FP
    // (enormous divergence): the final fold step would evaluate
    // sqrt(w/(1-1)) = +Inf — emit null, an unquotable limit, instead
    val extends_ =
      if (posCol.isEmpty) absT > lit(0L) && absT < lit(maxPos.toLong)
      else absT > absP && absT < lit(maxPos.toLong) &&
        (pos === 0L || signum(tpos) === signum(pos))
    val steps = sequence(absP + 1, absT)
    val inv = (acc: Column, j: Column) => {
      val mj = j.cast("double") / lit(maxPos.toDouble)
      acc + (f - signum(tpos).cast("double") * mj * sqrt(w / (lit(1.0) - mj * mj)))
    }
    df.withColumn("bet_m", m)
      .withColumn("t_pos", tpos)
      .withColumn(
        "limit_price",
        when(extends_, aggregate(steps, lit(0.0), inv) / (absT - absP).cast("double")),
      )
  }
}
