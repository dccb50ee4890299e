package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.api.TradingCols

/** NCO — Nested Clustered Optimization (López de Prado 2019, "A
  * Robust Estimator of the Efficient Frontier"; "ML for Asset
  * Managers" §7): minimum-variance allocation that sidesteps
  * Markowitz's instability by optimizing WITHIN clusters first, then
  * ACROSS the cluster portfolios:
  *
  *   1. cluster the correlation matrix ([[Onc]]);
  *   2. intra: w_c = Σ_c⁻¹·1 / (1ᵀ·Σ_c⁻¹·1) per cluster;
  *   3. reduced covariance Σ̃_ab = w_aᵀ·Σ_ab·w_b across clusters;
  *   4. inter: same min-var formula on Σ̃;
  *   5. final weight = intra × inter of the symbol's cluster.
  *
  * The covariance blocks an optimizer inverts are then cluster-sized
  * and near-diagonal across — the error-maximization of inverting
  * one big ill-conditioned Σ never happens.
  *
  * Scale split: identical to [[Hrp.weights]]/[[Onc.clusters]] — the
  * moments (variance + corr) come from the distributed exact-integer
  * machinery in one shuffle; the clustering and the two small
  * inversions run driver-side behind the `maxSymbols` gate.
  * Determinism: ONC is md5-seeded; the Gauss-Jordan inverse pivots
  * by maximum magnitude with lowest-index ties and a deterministic
  * ridge fallback on singular blocks — a pure function of the ticks.
  */
object Nco {

  /** Output per symbol: symbol, cluster_id, nco_weight (long-only
    * normalized: weights can be negative for strongly negative corr;
    * they sum to 1 exactly as in the book's formulation).
    */
  def weights(
      df: DataFrame,
      c: TradingCols = TradingCols.default,
      maxSymbols: Int = 2048,
      maxK: Int = 10,
      nInit: Int = 8,
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val r = graft.sources.Checkpoint.tableGated(Hrp.dailyReturns(df, c), "nco-returns")
    val dec = "decimal(38,0)"
    val perSym = r
      .groupBy(col("symbol"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("rq")).as("s"),
        sum(col("rq").cast(dec) * col("rq").cast(dec)).as("ss"),
        min(col("rq")).as("mn"),
        max(col("rq")).as("mx"),
      )
      .select(
        col("symbol"),
        col("n"), {
          val nD = col("n").cast("double")
          val sD = col("s").cast("double")
          when(col("n") > 1, (nD * col("ss").cast("double") - sD * sD) / (nD * nD))
            .otherwise(lit(0.0)).as("variance")
        },
        // exact activeness via min<max — equivalent to n*ss - s*s > 0
        // with no overflow-prone products (see Hrp.weights, r13 advice)
        (col("n") > 1 && col("mn") < col("mx")).as("act"),
      )
      .collect()
      .sortBy(_.getString(0))
    require(
      perSym.length <= maxSymbols,
      s"NCO driver-side matrix gated at $maxSymbols symbols (got ${perSym.length}); " +
        "raise maxSymbols explicitly or pre-partition the universe",
    )
    val active = perSym.filter(_.getBoolean(3))
    val syms = active.map(_.getString(0))
    val n = syms.length
    val out: Seq[(String, Int, Double)] =
      if (n == 0) Seq.empty
      else if (n == 1) Seq((syms(0), 0, 1.0))
      else {
        val idx = syms.zipWithIndex.toMap
        // activeness is decided by the exact moments; a symbol can be
        // active with a double-rounded variance of 0.0 — clamp so the
        // inverse-variance allocation stays finite (weight -> 1 limit)
        val variance = active.map(r => math.max(r.getDouble(2), 1e-300))
        val corr = Array.fill(n, n)(0.0)
        for (i <- 0 until n) corr(i)(i) = 1.0
        Hrp
          .pairwiseCorrOfReturns(r)
          .where(col("corr").isNotNull)
          .collect()
          .foreach { row =>
            (idx.get(row.getString(0)), idx.get(row.getString(1))) match {
              case (Some(i), Some(j)) =>
                corr(i)(j) = row.getDouble(3); corr(j)(i) = row.getDouble(3)
              case _ => ()
            }
          }
        val cov = Array.tabulate(n, n)((i, j) =>
          corr(i)(j) * math.sqrt(variance(i) * variance(j)))
        val (labels, w) = allocate(corr, cov, maxK, nInit)
        syms.indices.map(i => (syms(i), labels(i), w(i)))
      }
    val zero = perSym
      .map(_.getString(0))
      .filterNot(out.map(_._1).toSet)
      .map(s => (s, -1, 0.0))
    (out ++ zero)
      .toDF("symbol", "cluster_id", "nco_weight")
      .orderBy(col("symbol"))
  }

  /** The nested optimization on explicit matrices (spec surface).
    * Returns (canonical ONC labels, final weights).
    */
  private[graft] def allocate(
      corr: Array[Array[Double]],
      cov: Array[Array[Double]],
      maxK: Int,
      nInit: Int,
  ): (Array[Int], Array[Double]) = {
    val n = corr.length
    val (labels, _) = Onc.cluster(corr, maxK, nInit)
    val k = labels.max + 1
    val members = Array.tabulate(k)(cl => labels.indices.filter(labels(_) == cl).toArray)
    // intra: min-var within each cluster
    val intra = members.map { m =>
      val sub = Array.tabulate(m.length, m.length)((a, b) => cov(m(a))(m(b)))
      minVar(sub)
    }
    // reduced covariance across cluster portfolios
    val reduced = Array.tabulate(k, k) { (a, b) =>
      var s = 0.0
      var i = 0
      while (i < members(a).length) {
        var j = 0
        while (j < members(b).length) {
          s += intra(a)(i) * cov(members(a)(i))(members(b)(j)) * intra(b)(j)
          j += 1
        }
        i += 1
      }
      s
    }
    val inter = minVar(reduced)
    val w = new Array[Double](n)
    for (cl <- 0 until k; a <- members(cl).indices)
      w(members(cl)(a)) = intra(cl)(a) * inter(cl)
    (labels, w)
  }

  /** Global minimum-variance weights w = Σ⁻¹1 / (1ᵀΣ⁻¹1). Singular /
    * ill-conditioned Σ gets a deterministic ridge (1e-10·tr/n on the
    * diagonal, doubled until the inverse succeeds — bounded retries).
    */
  private[graft] def minVar(cov: Array[Array[Double]]): Array[Double] = {
    val n = cov.length
    if (n == 1) return Array(1.0)
    var ridge = 0.0
    val base = {
      var t = 0.0; var i = 0
      while (i < n) { t += cov(i)(i); i += 1 }
      1e-10 * t / n.toDouble
    }
    var attempt = 0
    while (attempt < 30) {
      val a = Array.tabulate(n, n)((i, j) => cov(i)(j) + (if (i == j) ridge else 0.0))
      invert(a) match {
        case Some(inv) =>
          val rowSums = inv.map(_.sum)
          val total = rowSums.sum
          if (total != 0.0 && !total.isNaN && rowSums.forall(v => !v.isNaN && !v.isInfinite))
            return rowSums.map(_ / total)
        case None => ()
      }
      ridge = if (ridge == 0.0) base else ridge * 2.0
      attempt += 1
    }
    Array.fill(n)(1.0 / n.toDouble) // unreachable fallback, kept total
  }

  /** Gauss-Jordan inverse with partial pivoting (max |pivot|, lowest
    * index on exact ties); None when a pivot underflows.
    */
  private[graft] def invert(a: Array[Array[Double]]): Option[Array[Array[Double]]] = {
    val n = a.length
    val m = Array.tabulate(n)(i => a(i).clone() ++ Array.tabulate(n)(j => if (i == j) 1.0 else 0.0))
    var colIdx = 0
    while (colIdx < n) {
      var piv = colIdx
      var best = math.abs(m(colIdx)(colIdx))
      var rIdx = colIdx + 1
      while (rIdx < n) {
        val v = math.abs(m(rIdx)(colIdx))
        if (v > best) { best = v; piv = rIdx }
        rIdx += 1
      }
      if (best < 1e-300) return None
      if (piv != colIdx) { val t = m(piv); m(piv) = m(colIdx); m(colIdx) = t }
      val p = m(colIdx)(colIdx)
      var jIdx = 0
      while (jIdx < 2 * n) { m(colIdx)(jIdx) /= p; jIdx += 1 }
      var r2 = 0
      while (r2 < n) {
        if (r2 != colIdx) {
          val f = m(r2)(colIdx)
          if (f != 0.0) {
            var j2 = 0
            while (j2 < 2 * n) { m(r2)(j2) -= f * m(colIdx)(j2); j2 += 1 }
          }
        }
        r2 += 1
      }
      colIdx += 1
    }
    Some(Array.tabulate(n)(i => m(i).slice(n, 2 * n)))
  }
}
