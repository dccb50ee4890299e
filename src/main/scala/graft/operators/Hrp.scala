package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.api.TradingCols

/** Hierarchical Risk Parity (López de Prado 2016; AFML ch.16):
  * allocate across symbols by single-linkage clustering of the
  * return-correlation distance, quasi-diagonal ordering, and
  * recursive bisection with inverse-cluster-variance splits — the
  * book's full getQuasiDiag/getRecBipart pipeline.
  *
  * Scale split (the connected-components pattern): the DATA-sized
  * work — daily closes, returns, and the S×(S−1)/2 correlation
  * moments — is fully distributed; only the S-sized matrix problem
  * (clustering + bisection, information that genuinely must be
  * global) runs driver-side, behind an explicit `maxSymbols` gate
  * (default 2048 → ≤2M pair rows collected), like the ≤4M-edge
  * union-find gate in [[Dedup]].
  *
  * Exactness: daily close-to-close returns are quantized ONCE to
  * integer micro-units (round(1e6·Δc/c_prev) — one deterministic
  * IEEE division+round from exact cent closes). First moments are
  * associative BIGINT sums; second moments accumulate as exact
  * DECIMAL(38,0) (degenerate series can move 1000× a day, putting
  * Σrq² past 2⁶³ — the oracle twins them with HUGEINT), and the
  * moment combination runs in double with one round-to-nearest
  * integer→double conversion per moment on BOTH engines. The
  * corr/variance trees are the only FP steps and are replicated
  * op-for-op by the `pairwise_corr` oracle. HRP weights themselves
  * are not SQL-expressible (recursive bisection) — they are pinned
  * by construction-replay ScalaTests instead.
  */
object Hrp {

  /** Per-(symbol, date) close-to-close returns in integer
    * micro-units: symbol, date, rq (BIGINT). First day per symbol
    * has no previous close and emits nothing.
    */
  def dailyReturns(df: DataFrame, c: TradingCols = TradingCols.default): DataFrame = {
    val daily = df.na
      .drop(Seq(c.price))
      .select(
        col(c.symbol).cast("string").as("symbol"),
        to_date(col(c.ts)).as("date"),
        col(c.ts).as("ts"),
        round(col(c.price) * 100).cast("long").as("pc"),
        col(c.tradeId).cast("long").as("trade_id"),
      )
      .groupBy(col("symbol"), col("date"))
      .agg(graft.functions.OrderedAgg.lastByOrd(col("pc"), col("ts"), col("trade_id")).as("close_pc"))
    val w = Window.partitionBy(col("symbol")).orderBy(col("date"))
    daily
      .withColumn("prev_pc", lag(col("close_pc"), 1).over(w))
      .where(col("prev_pc").isNotNull && col("prev_pc") > 0L)
      .select(
        col("symbol"),
        col("date"),
        round(
          (col("close_pc") - col("prev_pc")).cast("double") / col("prev_pc").cast("double") * lit(1e6)
        ).cast("long").as("rq"),
      )
  }

  /** Pairwise return correlations over shared days (s1 < s2):
    * s1, s2, n_days, corr. One date-keyed self-join, then one
    * map-side-combinable (s1, s2) aggregation of exact moments;
    * pairs with fewer than 2 shared days or a flat side emit null.
    *
    * Synthetic/degenerate series can move 1000× day-over-day
    * (|rq| ~ 1e9), so the second moments accumulate as exact
    * DECIMAL(38,0) (the oracle's HUGEINT) — headroom to ~1e38 —
    * and the moment COMBINATION n·Σxy − Σx·Σy runs in double:
    * both engines convert the exact integer to double with one
    * round-to-nearest (BigDecimal.doubleValue / hugeint cast), so
    * the corr tree stays engine-exact op-for-op.
    */
  def pairwiseCorr(df: DataFrame, c: TradingCols = TradingCols.default): DataFrame =
    pairwiseCorrOfReturns(dailyReturns(df, c))

  private[operators] def pairwiseCorrOfReturns(r: DataFrame): DataFrame = {
    val a = r.select(col("symbol").as("s1"), col("date"), col("rq").as("x"))
    val b = r.select(col("symbol").as("s2"), col("date"), col("rq").as("y"))
    val dec = "decimal(38,0)"
    a.join(b, Seq("date"))
      .where(col("s1") < col("s2"))
      .groupBy(col("s1"), col("s2"))
      .agg(
        count(lit(1)).as("n_days"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"),
        sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"),
        sum(col("y").cast(dec) * col("y").cast(dec)).as("syy"),
      )
      .select(
        col("s1"),
        col("s2"),
        col("n_days"), {
          val nD = col("n_days").cast("double")
          val sxD = col("sx").cast("double")
          val syD = col("sy").cast("double")
          val vx = nD * col("sxx").cast("double") - sxD * sxD
          val vy = nD * col("syy").cast("double") - syD * syD
          when(
            col("n_days") > 1 && vx > 0.0 && vy > 0.0,
            (nD * col("sxy").cast("double") - sxD * syD) / (sqrt(vx) * sqrt(vy)),
          ).as("corr")
        },
      )
  }

  /** HRP weights: symbol, hrp_weight (sums to 1 over allocatable
    * symbols). Symbols with fewer than 2 return days or zero return
    * variance cannot carry an inverse-variance allocation and emit
    * weight 0 (documented policy); missing pair overlaps read as
    * ρ = 0. Ties in merge height break by symbol index
    * (deterministic dendrogram).
    */
  /** @param denoise Marchenko-Pastur-shrink the correlation matrix
    *                 before clustering ([[denoiseCorr]], q = T/N
    *                 from the longest return series)
    */
  def weights(
      df: DataFrame,
      c: TradingCols = TradingCols.default,
      maxSymbols: Int = 2048,
      denoise: Boolean = false,
      detone: Boolean = false,
  ): DataFrame = {
    val spark = df.sparkSession
    // both the variance agg and the corr self-join consume the daily
    // returns — materialize the (symbols × days)-sized table once
    // behind the standard size-gated barrier instead of scanning the
    // tick stream twice
    val r = graft.sources.Checkpoint.tableGated(dailyReturns(df, c), "hrp-returns")
    // per-symbol variance from the same BIGINT moments
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
          // same double-combination discipline as pairwiseCorr
          val nD = col("n").cast("double")
          val sD = col("s").cast("double")
          when(col("n") > 1, (nD * col("ss").cast("double") - sD * sD) / (nD * nD))
            .otherwise(lit(0.0)).as("variance")
        },
        // exact activeness: the integer second-moment predicate
        // n*ss - s*s > 0 holds iff not all rq are equal, i.e.
        // min(rq) < max(rq) — same truth value with NO intermediate
        // products, so no decimal(38,0) overflow-to-null (r13 advice:
        // the decimal form could NPE the driver filter and its ~1e38
        // bound sat slightly inside the oracle's HUGEINT ~1.7e38).
        // The oracle computes the identical BIGINT min/max predicate.
        (col("n") > 1 && col("mn") < col("mx")).as("act"),
      )
      .collect()
      .sortBy(_.getString(0))
    require(
      perSym.length <= maxSymbols,
      s"HRP driver-side matrix gated at $maxSymbols symbols (got ${perSym.length}); " +
        "raise maxSymbols explicitly or pre-cluster the universe",
    )
    val active = perSym.filter(_.getBoolean(3))
    val syms = active.map(_.getString(0))
    val n = syms.length
    val out: Seq[(String, Double)] =
      if (n == 0) Seq.empty
      else if (n == 1) Seq(syms(0) -> 1.0)
      else {
        val idx = syms.zipWithIndex.toMap
        // activeness is decided by the exact moments; a symbol can be
        // active with a double-rounded variance of 0.0 — clamp so the
        // inverse-variance allocation stays finite (weight -> 1 limit)
        val variance = active.map(r => math.max(r.getDouble(2), 1e-300))
        val corr = Array.fill(n, n)(0.0)
        for (i <- 0 until n) corr(i)(i) = 1.0
        pairwiseCorrOfReturns(r)
          .where(col("corr").isNotNull)
          .collect()
          .foreach { row =>
            (idx.get(row.getString(0)), idx.get(row.getString(1))) match {
              case (Some(i), Some(j)) =>
                corr(i)(j) = row.getDouble(3); corr(j)(i) = row.getDouble(3)
              case _ => ()
            }
          }
        val denoised =
          if (!denoise) corr
          else {
            val t = active.map(_.getLong(1)).max.toDouble
            denoiseCorr(corr, t / n.toDouble)
          }
        val corrUsed = if (detone) detoneCorr(denoised) else denoised
        val order = quasiDiagOrder(corrUsed)
        val w = recursiveBisection(order, variance, corrUsed)
        syms.zip(w).toSeq
      }
    val zero = perSym.map(_.getString(0)).filterNot(out.map(_._1).toSet).map(_ -> 0.0)
    import spark.implicits._
    (out ++ zero).toDF("symbol", "hrp_weight").orderBy(col("symbol"))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix
    * (Golub & Van Loan §8.5 — the classical rotation sweep):
    * returns (eigenvalues, eigenvectors as COLUMNS of v), both in
    * the sweep's deterministic order. O(n³) per sweep, converges
    * quadratically; fine for the gated `maxSymbols` matrix sizes.
    */
  private[graft] def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = Array.tabulate(n, n)((i, j) => a0(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    def off(): Double = {
      var s = 0.0
      for (i <- 0 until n; j <- i + 1 until n) s += a(i)(j) * a(i)(j)
      s
    }
    while (off() > 1e-22 && sweep < 100) {
      for (p <- 0 until n; q <- p + 1 until n) {
        if (math.abs(a(p)(q)) > 1e-300) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          val t =
            if (theta == 0.0) 1.0
            else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (k <- 0 until n) {
            val akp = a(k)(p); val akq = a(k)(q)
            a(k)(p) = c * akp - s * akq
            a(k)(q) = s * akp + c * akq
          }
          for (k <- 0 until n) {
            val apk = a(p)(k); val aqk = a(q)(k)
            a(p)(k) = c * apk - s * aqk
            a(q)(k) = s * apk + c * aqk
          }
          for (k <- 0 until n) {
            val vkp = v(k)(p); val vkq = v(k)(q)
            v(k)(p) = c * vkp - s * vkq
            v(k)(q) = s * vkp + c * vkq
          }
        }
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /** Marchenko-Pastur denoising of a correlation matrix (López de
    * Prado, "Machine Learning for Asset Managers" §2, constant-
    * residual form): eigenvalues below the pure-noise upper edge
    * λ₊ = (1 + √(1/q))² (q = T/N observations per variable, unit
    * noise variance assumed — the simplified published variant; the
    * book's KDE-fitted σ² is a refinement) are replaced by their
    * average, the matrix is rebuilt V·diag(λ)·Vᵀ and rescaled to
    * unit diagonal. Keeps the signal factors, kills the noise floor
    * that makes downstream inverse-variance allocations unstable.
    */
  private[graft] def denoiseCorr(corr: Array[Array[Double]], q: Double): Array[Array[Double]] = {
    require(q > 0.0, "q = T/N must be positive")
    val n = corr.length
    val (w, v) = jacobiEigen(corr)
    val lambdaPlus = { val r = 1.0 + math.sqrt(1.0 / q); r * r }
    val noise = w.indices.filter(i => w(i) < lambdaPlus)
    if (noise.isEmpty || noise.length == n) return corr // nothing to shrink / pure noise
    val avg = noise.map(w).sum / noise.length.toDouble
    val w2 = w.clone()
    noise.foreach(i => w2(i) = avg)
    val rebuilt = Array.tabulate(n, n) { (i, j) =>
      var s = 0.0
      var k = 0
      while (k < n) { s += v(i)(k) * w2(k) * v(j)(k); k += 1 }
      s
    }
    Array.tabulate(n, n) { (i, j) =>
      if (i == j) 1.0
      else rebuilt(i)(j) / math.sqrt(rebuilt(i)(i) * rebuilt(j)(j))
    }
  }

  /** Detoning ("ML for Asset Managers" §2.6): remove the top
    * (market) eigencomponent from a correlation matrix and rescale
    * to unit diagonal — clustering on the detoned matrix sees the
    * sector/idiosyncratic structure the market mode drowns out.
    */
  private[graft] def detoneCorr(corr: Array[Array[Double]]): Array[Array[Double]] = {
    val n = corr.length
    if (n < 2) return corr
    val (w, v) = jacobiEigen(corr)
    val top = w.indices.maxBy(i => (w(i), -i))
    val stripped = Array.tabulate(n, n) { (i, j) =>
      corr(i)(j) - w(top) * v(i)(top) * v(j)(top)
    }
    Array.tabulate(n, n) { (i, j) =>
      if (i == j) 1.0
      else {
        val d = math.sqrt(stripped(i)(i) * stripped(j)(j))
        if (d > 0.0) stripped(i)(j) / d else 0.0
      }
    }
  }

  /** Single-linkage dendrogram leaf order on the AFML correlation
    * distance d = √((1−ρ)/2): SLINK (Sibson 1973) pointer
    * representation, merges replayed in (height, index) order
    * through a union-find building the cluster tree, in-order leaf
    * traversal. O(n²) time, deterministic under ties.
    */
  private[graft] def quasiDiagOrder(corr: Array[Array[Double]]): Array[Int] = {
    val n = corr.length
    def dist(i: Int, j: Int): Double = math.sqrt(math.max(0.5 * (1.0 - corr(i)(j)), 0.0))
    // SLINK: pi(i) = first higher-indexed point i joins, lambda(i) = height
    val pi = new Array[Int](n)
    val lambda = new Array[Double](n)
    val m = new Array[Double](n)
    pi(0) = 0; lambda(0) = Double.PositiveInfinity
    for (t <- 1 until n) {
      pi(t) = t; lambda(t) = Double.PositiveInfinity
      for (i <- 0 until t) m(i) = dist(i, t)
      for (i <- 0 until t) {
        if (lambda(i) >= m(i)) {
          m(pi(i)) = math.min(m(pi(i)), lambda(i))
          lambda(i) = m(i); pi(i) = t
        } else m(pi(i)) = math.min(m(pi(i)), m(i))
      }
      for (i <- 0 until t) if (lambda(i) >= lambda(pi(i))) pi(i) = t
    }
    // replay merges by ascending (height, index); union-find tracks
    // each cluster's current tree for the in-order leaf walk
    sealed trait Tree
    final case class Leaf(i: Int) extends Tree
    final case class Node(l: Tree, r: Tree) extends Tree
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    val tree = scala.collection.mutable.Map[Int, Tree]()
    for (i <- 0 until n) tree(i) = Leaf(i)
    val merges = (0 until n - 1).sortBy(i => (lambda(i), i))
    merges.foreach { i =>
      val a = find(i); val b = find(pi(i))
      if (a != b) {
        val merged = Node(tree(a), tree(b))
        parent(a) = b
        tree.remove(a)
        tree(b) = merged
      }
    }
    val order = Array.newBuilder[Int]
    def walk(t: Tree): Unit = t match {
      case Leaf(i)    => order += i
      case Node(l, r) => walk(l); walk(r)
    }
    walk(tree(find(0)))
    order.result()
  }

  /** AFML getRecBipart: split the quasi-diagonal order in half,
    * weight each half by 1 − v₁/(v₁+v₂) with v = inverse-variance-
    * portfolio cluster variance wᵀVw, recurse.
    */
  private[graft] def recursiveBisection(
      order: Array[Int],
      variance: Array[Double],
      corr: Array[Array[Double]],
  ): Array[Double] = {
    val n = variance.length
    def cov(i: Int, j: Int): Double =
      if (i == j) variance(i) else corr(i)(j) * math.sqrt(variance(i)) * math.sqrt(variance(j))
    def clusterVar(items: Array[Int]): Double = {
      val inv = items.map(i => 1.0 / variance(i))
      val tot = inv.sum
      val w = inv.map(_ / tot)
      var v = 0.0
      for (a <- items.indices; b <- items.indices) v += w(a) * cov(items(a), items(b)) * w(b)
      v
    }
    val weight = Array.fill(n)(1.0)
    def split(items: Array[Int]): Unit =
      if (items.length > 1) {
        val (l, r) = items.splitAt(items.length / 2)
        val vl = clusterVar(l); val vr = clusterVar(r)
        val alpha = 1.0 - vl / (vl + vr)
        l.foreach(i => weight(i) *= alpha)
        r.foreach(i => weight(i) *= (1.0 - alpha))
        split(l); split(r)
      }
    split(order)
    weight
  }
}
