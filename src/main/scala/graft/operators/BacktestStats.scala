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
      .agg(
        // codegen-resident ordered last (see OrderedAgg: a struct
        // ordering key would demote the aggregation to the row path)
        graft.functions.OrderedAgg
          .lastByOrd(col("pc"), col("ts"), col("trade_id"))
          .as("close_pc"))

  /** Per-symbol date-ordered moment sums of daily returns:
    * symbol, n_days, __s1..__s4 (shared by [[psr]] and [[dsr]]).
    */
  private def momentStats(df: DataFrame, c: TradingCols): DataFrame = {
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
    arr.select(
      col("symbol"),
      size(col("__a")).cast("long").as("n_days"),
      fold(r => r).as("__s1"),
      fold(r => r * r).as("__s2"),
      fold(r => r * r * r).as("__s3"),
      fold(r => r * r * r * r).as("__s4"),
    )
  }

  /** Output: symbol, n_days, sharpe (per-day, unannualized), skew,
    * kurt (non-excess), psr. Null stats when fewer than 3 returns or
    * a degenerate (zero-variance) series.
    */
  def psr(
      df: DataFrame,
      srBenchmark: Double = 0.0,
      c: TradingCols = TradingCols.default,
  ): DataFrame = {
    val stats = momentStats(df, c)
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

  /** Acklam's inverse normal CDF approximation (|ε_rel| < 1.15e−9;
    * the standard published rational-polynomial probit) as a Column
    * tree — three branches on p, each a fixed Horner chain, so both
    * engines take identical branch decisions and identical FP paths.
    */
  def probitApprox(p: Column): Column = {
    val (a1, a2, a3, a4, a5, a6) = (-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02, -3.066479806614716e+01,
      2.506628277459239e+00)
    val (b1, b2, b3, b4, b5) = (-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01, -1.328068155288572e+01)
    val (c1, c2, c3, c4, c5, c6) = (-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00, 4.374664141464968e+00,
      2.938163982698783e+00)
    val (d1, d2, d3, d4) = (7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val pLow = 0.02425
    def tailNum(q: Column): Column =
      (((((lit(c1) * q + lit(c2)) * q + lit(c3)) * q + lit(c4)) * q + lit(c5)) * q + lit(c6))
    def tailDen(q: Column): Column =
      ((((lit(d1) * q + lit(d2)) * q + lit(d3)) * q + lit(d4)) * q + lit(1.0))
    val qLo = sqrt(lit(-2.0) * log(p))
    val qHi = sqrt(lit(-2.0) * log(lit(1.0) - p))
    val qC = p - lit(0.5)
    val rC = qC * qC
    val centerNum =
      (((((lit(a1) * rC + lit(a2)) * rC + lit(a3)) * rC + lit(a4)) * rC + lit(a5)) * rC + lit(a6)) * qC
    val centerDen =
      ((((lit(b1) * rC + lit(b2)) * rC + lit(b3)) * rC + lit(b4)) * rC + lit(b5)) * rC + lit(1.0)
    when(p < lit(pLow), tailNum(qLo) / tailDen(qLo))
      .when(p <= lit(1.0 - pLow), centerNum / centerDen)
      .otherwise(-tailNum(qHi) / tailDen(qHi))
  }

  /** Deflated Sharpe ratio (Bailey & López de Prado 2014; AFML
    * ch.14): [[psr]] evaluated against the expected maximum SR of N
    * unskilled trials,
    *
    *   SR* = √V[SR] · ((1−γ)·Φ⁻¹(1−1/N) + γ·Φ⁻¹(1−1/(N·e))),
    *
    * with γ Euler-Mascheroni and V[SR] the cross-trial variance of
    * the candidate Sharpe ratios — here the symbols are the trial
    * set. Cross-trial moments fold in symbol order (bounded by the
    * number of symbols); Φ⁻¹ via [[probitApprox]], Φ via the shared
    * erf tree. Output per symbol: symbol, n_days, sharpe, sr_star
    * (same for every row), dsr. Null when the per-symbol stats are
    * degenerate or fewer than 2 trials survive.
    */
  def dsr(df: DataFrame, c: TradingCols = TradingCols.default): DataFrame = {
    val gamma = 0.5772156649015329
    val e = 2.718281828459045
    val stats = momentStats(df, c)
    val n = col("n_days").cast("double")
    val m = col("__s1") / n
    val c2 = col("__s2") / n - m * m
    val c3 = col("__s3") / n - lit(3.0) * m * (col("__s2") / n) + lit(2.0) * m * m * m
    val c4 = col("__s4") / n - lit(4.0) * m * (col("__s3") / n) +
      lit(6.0) * m * m * (col("__s2") / n) - lit(3.0) * m * m * m * m
    val sd = when(c2 > 0.0, sqrt(c2 * n / (n - lit(1.0))))
    val sr = m / sd
    val skew = when(c2 > 0.0, c3 / (c2 * sqrt(c2)))
    val kurt = when(c2 > 0.0, c4 / (c2 * c2))
    val perSym = stats.select(
      col("symbol"), col("n_days"),
      sr.as("__sr"), skew.as("__g3"), kurt.as("__g4"), c2.as("__c2"),
    )
    // cross-trial variance of SR, folded in symbol order
    val trials = perSym.where(col("__sr").isNotNull)
    val g = trials
      .agg(sort_array(collect_list(struct(col("symbol").as("s"), col("__sr").as("x")))).as("__t"))
      .select(
        size(col("__t")).cast("double").as("__M"),
        aggregate(col("__t"), lit(0.0), (a, x) => a + x("x")).as("__ts1"),
        aggregate(col("__t"), lit(0.0), (a, x) => a + x("x") * x("x")).as("__ts2"),
      )
      .select(
        col("__M"),
        ((col("__ts2") - col("__ts1") * (col("__ts1") / col("__M"))) / (col("__M") - lit(1.0)))
          .as("__vsr"),
      )
      .select(
        col("__M"), {
          val z1 = probitApprox(lit(1.0) - lit(1.0) / col("__M"))
          val z2 = probitApprox(lit(1.0) - lit(1.0) / (col("__M") * lit(e)))
          when(
            col("__M") >= 2 && col("__vsr") > 0.0,
            sqrt(col("__vsr")) * ((lit(1.0) - lit(gamma)) * z1 + lit(gamma) * z2),
          ).as("sr_star")
        },
      )
    val withStar = perSym.crossJoin(broadcast(g))
    val nd = col("n_days").cast("double")
    val den = lit(1.0) - col("__g3") * col("__sr") +
      (col("__g4") - lit(1.0)) / lit(4.0) * col("__sr") * col("__sr")
    val z = (col("__sr") - col("sr_star")) * sqrt(nd - lit(1.0)) / sqrt(den)
    val ok = col("n_days") >= 3 && col("__c2") > 0.0 && den > 0.0 && col("sr_star").isNotNull
    withStar.select(
      col("symbol"),
      col("n_days"),
      when(ok, col("__sr")).as("sharpe"),
      when(ok, col("sr_star")).as("sr_star"),
      when(ok, lit(0.5) * (lit(1.0) + BetSizing.erfApprox(z / lit(math.sqrt(2.0)))))
        .as("dsr"),
    )
  }

  /** Probability of backtest overfitting via combinatorially
    * symmetric cross-validation (Bailey, Borwein, López de Prado &
    * Zhu 2015; AFML ch.11): partition the trading days into
    * `nBlocks` contiguous blocks; for every C(nBlocks, nBlocks/2)
    * in-sample block subset, pick the strategy (symbol) with the
    * best IS Sharpe and find its RELATIVE RANK ω among
    * out-of-sample Sharpes — PBO = P(ω ≤ ½), the frequency with
    * which the IS winner underperforms the OOS median. λ = logit(ω)
    * summarizes the overfit distribution.
    *
    * Scale split (the [[Hrp]] pattern): the data-sized work — daily
    * closes, micro-unit quantized returns, per-(strategy, block)
    * moment sums (exact BIGINT/DECIMAL) — is fully distributed and
    * collects only strategies × nBlocks bounded rows; the C(16,8) =
    * 12,870 combination sweep runs driver-side over that tiny moment
    * matrix (combos × strategies integer-sum arithmetic). Driver
    * iteration sorts the collected rows, so the output is
    * deterministic under any partitioning. Degenerate (zero-variance
    * or short) strategy-sides rank as −∞, never best.
    *
    * Output (one row): n_strategies, n_blocks, n_combos, pbo,
    * mean_logit.
    */
  /** The exact per-(strategy, block) moment table PBO's CSCV sweep
    * consumes: micro-quantized daily returns (Hrp.dailyReturns) cut
    * into `nBlocks` contiguous equal-ish date blocks shared across
    * strategies, with BIGINT/DECIMAL(38,0) count/sum/sum-of-squares.
    * This is the distributed part of PBO — the C(16,8) combination
    * sweep over it is driver-side by design — and the part the
    * DuckDB oracle can check exactly (pbo_blocks).
    */
  def pboBlockMoments(
      df: DataFrame,
      c: TradingCols = TradingCols.default,
      nBlocks: Int = 16,
  ): DataFrame = {
    val r = Hrp.dailyReturns(df, c)
    // contiguous equal-ish date blocks, shared across strategies
    val dates = r
      .select(col("date")).distinct()
      .withColumn("__rn", row_number().over(Window.orderBy(col("date"))))
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy()))
      .select(col("date"), (((col("__rn") - 1) * nBlocks) / col("__cnt")).cast("int").as("block"))
    val dec = "decimal(38,0)"
    r.join(broadcast(dates), Seq("date"))
      .groupBy(col("symbol"), col("block"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("rq")).as("s"),
        sum(col("rq").cast(dec) * col("rq").cast(dec)).cast(dec).as("ss"),
      )
  }

  def pbo(
      df: DataFrame,
      c: TradingCols = TradingCols.default,
      nBlocks: Int = 16,
      maxStrategies: Int = 1024,
  ): DataFrame = {
    require(nBlocks >= 2 && nBlocks % 2 == 0 && nBlocks <= 20, "nBlocks: even, in [2, 20]")
    val spark = df.sparkSession
    import spark.implicits._
    val rows = pboBlockMoments(df, c, nBlocks)
      .collect()
      .map(x =>
        (x.getString(0), x.getInt(1), x.getLong(2), x.getLong(3),
          BigInt(x.getDecimal(4).toBigInteger)))
      .sortBy(x => (x._1, x._2))
    val syms = rows.map(_._1).distinct.sorted
    require(
      syms.length <= maxStrategies,
      s"PBO driver-side sweep gated at $maxStrategies strategies (got ${syms.length})",
    )
    val idx = syms.zipWithIndex.toMap
    // moment matrix [strategy][block]
    val n = Array.fill(syms.length, nBlocks)(0L)
    val s = Array.fill(syms.length, nBlocks)(0L)
    val ss = Array.fill(syms.length, nBlocks)(BigInt(0))
    rows.foreach { case (sym, b, nn, sv, ssv) =>
      val i = idx(sym); n(i)(b) = nn; s(i)(b) = sv; ss(i)(b) = ssv
    }
    def srOf(blocks: Seq[Int], i: Int): Double = {
      var nn = 0L; var sv = 0L; var ssv = BigInt(0)
      blocks.foreach { b => nn += n(i)(b); sv += s(i)(b); ssv += ss(i)(b) }
      if (nn < 2) return Double.NegativeInfinity
      val nd = nn.toDouble
      // exact integer numerator n·Σx² − (Σx)², one double conversion
      val varNum = (BigInt(nn) * ssv - BigInt(sv) * BigInt(sv)).toDouble
      if (varNum <= 0.0) Double.NegativeInfinity
      else (sv.toDouble / nd) / math.sqrt(varNum / (nd * nd))
    }
    val combos = (0 until nBlocks).combinations(nBlocks / 2).toSeq
    var overfit = 0L
    var logitSum = 0.0
    var nCombos = 0L
    combos.foreach { isBlocks =>
      val oos = (0 until nBlocks).filterNot(isBlocks.contains)
      val srIs = syms.indices.map(srOf(isBlocks, _))
      val best = srIs.indices.maxBy(i => (srIs(i), -i)) // tiebreak: first symbol
      val srOos = syms.indices.map(srOf(oos, _))
      val rank = 1 + srOos.indices.count(j =>
        srOos(j) < srOos(best) || (srOos(j) == srOos(best) && j < best))
      val omega = rank.toDouble / (syms.length + 1).toDouble
      if (omega <= 0.5) overfit += 1L
      logitSum += math.log(omega / (1.0 - omega))
      nCombos += 1L
    }
    Seq(
      (syms.length.toLong, nBlocks.toLong, nCombos,
        overfit.toDouble / nCombos.toDouble, logitSum / nCombos.toDouble)
    ).toDF("n_strategies", "n_blocks", "n_combos", "pbo", "mean_logit")
  }

  /** Strategy risk (AFML ch.15, snippets 15.3/15.4): treats each
    * symbol's daily close-to-close moves as a binary betting record
    * with empirical payouts — π₊ = mean up-move, π₋ = mean down-move
    * (exact cents), p = hit rate — and prices the strategy's risk in
    * two implied quantities against a target annualized Sharpe θ*:
    *
    *   implied precision p*:  the p solving
    *     θ* = ((π₊−π₋)p + π₋)·√freq / ((π₊−π₋)·√(p(1−p))),
    *     i.e. the positive root of a·p² + b·p + c = 0 with
    *     a = (freq+θ*²)(π₊−π₋)², b = (2·freq·π₋ − θ*²(π₊−π₋))(π₊−π₋),
    *     c = freq·π₋²  — how little the hit rate may degrade before
    *     the strategy misses its target;
    *   implied frequency n*: bets/year needed at the REALIZED p,
    *     n* = (θ*(π₊−π₋))²·p(1−p) / ((π₊−π₋)p + π₋)².
    *
    * Zero-move days are excluded from the betting record (a flat day
    * is no bet under the binary model). Both formulas are homogeneous
    * of degree 2 in the payout unit, so cents-denominated π are exact
    * AND scale-correct. Determinism: π₊/π₋/p are ratios of BIGINT
    * sums/counts; everything after is one fixed double tree mirrored
    * op-for-op by the oracle (θ*², 2·freq, √freq interpolated as the
    * same IEEE doubles). One shuffle (the dailyCloses aggregation);
    * the per-symbol stats row is O(symbols).
    *
    * Output per symbol: symbol, n_bets, p (hit rate), pt_cents,
    * sl_cents (negative), sharpe_ann (realized, annualized at
    * `freq`), implied_p, implied_freq. Nulls when a side has no
    * moves or a formula's guard fails (degenerate discriminant /
    * zero expected payout).
    */
  def strategyRisk(
      df: DataFrame,
      freq: Double = 252.0,
      targetSr: Double = 1.0,
      c: TradingCols = TradingCols.default,
  ): DataFrame = {
    require(freq > 0 && targetSr > 0, "freq and targetSr must be positive")
    val daily = dailyCloses(df, c)
    val wD = Window.partitionBy(col("symbol")).orderBy(col("date"))
    val moves = daily
      .withColumn("__prev", lag(col("close_pc"), 1).over(wD))
      .where(col("__prev").isNotNull)
      .withColumn("__d", col("close_pc") - col("__prev"))
    val agg = moves
      .groupBy(col("symbol"))
      .agg(
        sum(when(col("__d") > 0, col("__d")).otherwise(0L)).as("__sp"),
        sum(when(col("__d") < 0, col("__d")).otherwise(0L)).as("__sn"),
        count(when(col("__d") > 0, lit(1))).as("__np"),
        count(when(col("__d") < 0, lit(1))).as("__nn"),
      )
    val tsr2 = targetSr * targetSr
    val pt = when(col("__np") > 0, col("__sp").cast("double") / col("__np").cast("double"))
    val sl = when(col("__nn") > 0, col("__sn").cast("double") / col("__nn").cast("double"))
    val p = col("__np").cast("double") / (col("__np") + col("__nn")).cast("double")
    val spread = pt - sl
    val a = lit(freq + tsr2) * spread * spread
    val b = (lit(2.0 * freq) * sl - lit(tsr2) * spread) * spread
    val c0 = lit(freq) * sl * sl
    val disc = b * b - lit(4.0) * a * c0
    val impliedP = when(disc >= 0.0 && a > 0.0, (-b + sqrt(disc)) / (lit(2.0) * a))
    val srAnn = (spread * p + sl) * lit(StrictMath.sqrt(freq)) /
      (spread * sqrt(p * (lit(1.0) - p)))
    val denB = spread * p + sl
    val impliedFreq = when(
      denB =!= 0.0,
      (lit(targetSr) * spread) * (lit(targetSr) * spread) * p * (lit(1.0) - p) /
        (denB * denB),
    )
    agg.select(
      col("symbol"),
      (col("__np") + col("__nn")).as("n_bets"),
      when(col("__np") > 0 && col("__nn") > 0, p).as("p"),
      pt.as("pt_cents"),
      sl.as("sl_cents"),
      when(col("__np") > 0 && col("__nn") > 0, srAnn).as("sharpe_ann"),
      when(col("__np") > 0 && col("__nn") > 0, impliedP).as("implied_p"),
      when(col("__np") > 0 && col("__nn") > 0, impliedFreq).as("implied_freq"),
    )
  }
}
