package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.api.TradingCols

/** ONC — Optimal Number of Clusters (López de Prado & Lewis 2019;
  * "Machine Learning for Asset Managers" §4): cluster the symbol
  * universe from its correlation matrix without choosing k a priori.
  *
  * Base step: k-means over the rows of the correlation-distance
  * matrix D_ij = √(½(1−ρ_ij)) (each symbol's feature vector is its
  * distance profile to every other symbol), sweeping k = 2..maxK ×
  * `nInit` deterministic k-means++ seedings, scored by the
  * silhouette quality q = mean(s)/std(s). Top step: clusters whose
  * own quality falls below the average are pooled and re-clustered
  * recursively; the redo is accepted only if the pooled quality
  * improves (the book's clusterKMeansTop).
  *
  * Scale split: the corr matrix comes from the distributed
  * integer-moment machinery ([[Hrp.pairwiseCorr]] — one shuffle over
  * ticks, exact DECIMAL second moments); everything after runs
  * driver-side on the n×n matrix behind the same explicit
  * `maxSymbols` gate as HRP (an n ≤ 2048 matrix is KB-to-MB scale —
  * clustering 10⁶ symbols is not a thing this operator claims).
  *
  * Determinism (no RNG state): k-means++ draws come from md5
  * uniforms keyed by (init, k, step) — the [[OptimalRules]] common-
  * random-number idiom — ties in assignment/seeding break to the
  * lowest index, and the (q, −k, −init) argmax is total. Output is a
  * pure function of the input ticks.
  */
object Onc {

  /** Per-symbol cluster assignment + silhouette. Output: symbol,
    * cluster_id (0-based, ordered by each cluster's lowest member
    * index), silhouette, n_clusters.
    */
  def clusters(
      df: DataFrame,
      c: TradingCols = TradingCols.default,
      maxSymbols: Int = 2048,
      maxK: Int = 10,
      nInit: Int = 8,
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val r = graft.sources.Checkpoint.tableGated(Hrp.dailyReturns(df, c), "onc-returns")
    val perSym = r
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(row => (row.getString(0), row.getLong(1)))
      .sortBy(_._1)
    require(
      perSym.length <= maxSymbols,
      s"ONC driver-side matrix gated at $maxSymbols symbols (got ${perSym.length}); " +
        "raise maxSymbols explicitly or pre-partition the universe",
    )
    val syms = perSym.filter(_._2 > 1).map(_._1)
    // total-output contract, like Hrp.weights / Nco.weights: symbols
    // with too little history to correlate still appear, as explicit
    // cluster_id = -1 / null-silhouette rows — the partition-of-
    // universe invariant the onc_coverage oracle checks
    val inactive = perSym.filter(_._2 <= 1).map(_._1)
    val n = syms.length
    if (n < 2) {
      val k0 = if (n > 0) 1 else 0
      return (syms.toSeq.map(s => (s, 0, Option(0.0), k0)) ++
        inactive.toSeq.map(s => (s, -1, Option.empty[Double], k0)))
        .toDF("symbol", "cluster_id", "silhouette", "n_clusters")
        .orderBy(col("symbol"))
    }
    val idx = syms.zipWithIndex.toMap
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
    val (labels, sil) = cluster(corr, maxK, nInit)
    val k = if (labels.isEmpty) 0 else labels.max + 1
    (syms.indices.map(i => (syms(i), labels(i), Option(sil(i)), k)) ++
      inactive.map(s => (s, -1, Option.empty[Double], k)))
      .toDF("symbol", "cluster_id", "silhouette", "n_clusters")
      .orderBy(col("symbol"))
  }

  /** Full ONC on a correlation matrix: base sweep + the top-level
    * recursive redo of below-average-quality clusters. Returns
    * (labels relabeled 0..k−1 by lowest member index, silhouettes
    * under the final labeling).
    */
  private[graft] def cluster(
      corr: Array[Array[Double]],
      maxK: Int,
      nInit: Int,
      salt: String = "onc",
  ): (Array[Int], Array[Double]) = {
    val n = corr.length
    val x = distMatrix(corr)
    val labels = clusterTop(x, maxK, nInit, salt, 0)
    val relabeled = canonical(labels)
    (relabeled, silhouettes(x, relabeled))
  }

  /** Silhouette quality q = mean/std. A zero std means every member
    * scores identically — for positive mean that is the PERFECT
    * outcome (the book's q → ∞), not a mediocre one, so it must beat
    * every finite q.
    */
  private def qOf(m: Double, sd: Double): Double =
    if (sd > 0.0) m / sd else if (m > 0.0) Double.MaxValue else m

  /** ½-correlation distance rows (the observation matrix). */
  private def distMatrix(corr: Array[Array[Double]]): Array[Array[Double]] =
    Array.tabulate(corr.length, corr.length) { (i, j) =>
      math.sqrt(math.max(0.5 * (1.0 - corr(i)(j)), 0.0))
    }

  /** clusterKMeansTop: base sweep, then recursively redo the pooled
    * below-average-quality clusters; accept if their pooled quality
    * improves. `depth` bounds pathological recursion (the pool
    * strictly shrinks, but belt-and-braces).
    */
  private def clusterTop(
      x: Array[Array[Double]],
      maxK: Int,
      nInit: Int,
      salt: String,
      depth: Int,
  ): Array[Int] = {
    val n = x.length
    if (n < 2) return Array.fill(n)(0)
    val base = clusterBase(x, maxK, nInit, salt)
    if (depth >= 6) return base
    val k = base.max + 1
    if (k < 2) return base
    val sil = silhouettes(x, base)
    val qc = (0 until k).map(cl => quality(sil, base, cl))
    val avgQ = qc.sum / k.toDouble
    val redo = (0 until k).filter(cl => qc(cl) < avgQ)
    if (redo.size < 2) return base // nothing to pool (book: need >=2 weak clusters)
    val pool = base.indices.filter(i => redo.contains(base(i))).toArray
    if (pool.length < 4) return base
    val subX = Array.tabulate(pool.length, pool.length)((a, b) => x(pool(a))(pool(b)))
    val subMaxK = math.min(maxK, pool.length - 1)
    val sub = clusterTop(subX, subMaxK, nInit, salt + ":r", depth + 1)
    // stitched labeling: kept clusters keep their ids, redone pool
    // gets fresh ids after them
    val keepIds = (0 until k).filterNot(redo.contains).zipWithIndex.toMap
    val stitched = new Array[Int](n)
    base.indices.foreach { i =>
      if (!redo.contains(base(i))) stitched(i) = keepIds(base(i))
    }
    pool.indices.foreach { a => stitched(pool(a)) = keepIds.size + sub(a) }
    // acceptance: pooled members' quality must improve
    val silOld = silhouettes(x, base)
    val silNew = silhouettes(x, stitched)
    def poolQ(s: Array[Double]): Double = {
      val v = pool.map(s)
      val m = v.sum / v.length
      val sd = math.sqrt(v.map(z => (z - m) * (z - m)).sum / v.length)
      qOf(m, sd)
    }
    if (poolQ(silNew) > poolQ(silOld)) stitched else base
  }

  /** clusterKMeansBase: sweep k × inits, maximize q = mean/std of
    * silhouettes; ties prefer smaller k then smaller init.
    */
  private def clusterBase(
      x: Array[Array[Double]],
      maxK: Int,
      nInit: Int,
      salt: String,
  ): Array[Int] = {
    val n = x.length
    var best: Array[Int] = Array.fill(n)(0)
    var bestQ = Double.NegativeInfinity
    val kHi = math.min(maxK, n - 1)
    for (k <- 2 to kHi; init <- 0 until nInit) {
      val labels = kmeans(x, k, s"$salt:$k:$init")
      if (labels.max + 1 >= 2) {
        val sil = silhouettes(x, labels)
        val m = sil.sum / n.toDouble
        val sd = math.sqrt(sil.map(z => (z - m) * (z - m)).sum / n.toDouble)
        val q = qOf(m, sd)
        if (q > bestQ + 1e-12) { bestQ = q; best = labels }
      }
    }
    best
  }

  /** Deterministic uniform in (0,1) from an md5 tag. */
  private def uniform(tag: String): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    val hex = digest
      .digest(tag.getBytes("UTF-8"))
      .take(4)
      .map(b => f"${b & 0xff}%02x")
      .mkString
    (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 4294967296.0
  }

  /** Lloyd k-means with deterministic k-means++ seeding over the
    * distance-profile rows. Ties break to the lowest index
    * everywhere; empty clusters reseed to the farthest point.
    */
  private[graft] def kmeans(x: Array[Array[Double]], k: Int, salt: String): Array[Int] = {
    val n = x.length
    val d = x(0).length
    def dist2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < d) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    // k-means++ with md5 uniforms
    val centers = new Array[Array[Double]](k)
    centers(0) = x((uniform(s"$salt:c0") * n).toInt.min(n - 1))
    val minD2 = Array.fill(n)(Double.PositiveInfinity)
    for (cIdx <- 1 until k) {
      var i = 0
      while (i < n) {
        val dd = dist2(x(i), centers(cIdx - 1))
        if (dd < minD2(i)) minD2(i) = dd
        i += 1
      }
      val total = minD2.sum
      val pick =
        if (total <= 0.0) (uniform(s"$salt:c$cIdx") * n).toInt.min(n - 1)
        else {
          val target = uniform(s"$salt:c$cIdx") * total
          var acc = 0.0; var j = 0; var chosen = n - 1
          var done = false
          while (j < n && !done) {
            acc += minD2(j)
            if (acc >= target) { chosen = j; done = true }
            j += 1
          }
          chosen
        }
      centers(cIdx) = x(pick)
    }
    // Lloyd iterations
    val labels = Array.fill(n)(-1)
    var changed = true
    var iter = 0
    while (changed && iter < 100) {
      changed = false
      var i = 0
      while (i < n) {
        var bestC = 0; var bestD = dist2(x(i), centers(0))
        var cIdx = 1
        while (cIdx < k) {
          val dd = dist2(x(i), centers(cIdx))
          if (dd < bestD) { bestD = dd; bestC = cIdx }
          cIdx += 1
        }
        if (labels(i) != bestC) { labels(i) = bestC; changed = true }
        i += 1
      }
      // recompute centers; empty cluster -> farthest point from its
      // previous center (deterministic, lowest index on ties)
      for (cIdx <- 0 until k) {
        val members = labels.indices.filter(labels(_) == cIdx)
        if (members.nonEmpty) {
          val m = new Array[Double](d)
          members.foreach { i => var j = 0; while (j < d) { m(j) += x(i)(j); j += 1 } }
          var j = 0
          while (j < d) { m(j) /= members.length.toDouble; j += 1 }
          centers(cIdx) = m
        } else {
          var far = 0; var farD = -1.0
          var i = 0
          while (i < n) {
            val dd = dist2(x(i), centers(cIdx))
            if (dd > farD) { farD = dd; far = i }
            i += 1
          }
          centers(cIdx) = x(far)
          changed = true
        }
      }
      iter += 1
    }
    labels
  }

  /** Euclidean silhouettes over the profile rows. Singleton or
    * single-cluster labelings score 0 (the sklearn convention).
    */
  private[graft] def silhouettes(x: Array[Array[Double]], labels: Array[Int]): Array[Double] = {
    val n = x.length
    val k = if (n == 0) 0 else labels.max + 1
    if (k < 2) return Array.fill(n)(0.0)
    def dist(i: Int, j: Int): Double = {
      var s = 0.0; var t = 0
      while (t < x(i).length) { val v = x(i)(t) - x(j)(t); s += v * v; t += 1 }
      math.sqrt(s)
    }
    val counts = Array.fill(k)(0)
    labels.foreach(l => counts(l) += 1)
    Array.tabulate(n) { i =>
      val sums = Array.fill(k)(0.0)
      var j = 0
      while (j < n) { if (j != i) sums(labels(j)) += dist(i, j); j += 1 }
      val own = labels(i)
      if (counts(own) <= 1) 0.0
      else {
        val a = sums(own) / (counts(own) - 1).toDouble
        var b = Double.PositiveInfinity
        var cIdx = 0
        while (cIdx < k) {
          if (cIdx != own && counts(cIdx) > 0) {
            val m = sums(cIdx) / counts(cIdx).toDouble
            if (m < b) b = m
          }
          cIdx += 1
        }
        if (math.max(a, b) > 0.0) (b - a) / math.max(a, b) else 0.0
      }
    }
  }

  /** Per-cluster quality mean/std of member silhouettes. */
  private def quality(sil: Array[Double], labels: Array[Int], cl: Int): Double = {
    val v = sil.indices.filter(labels(_) == cl).map(sil)
    if (v.isEmpty) 0.0
    else {
      val m = v.sum / v.length
      val sd = math.sqrt(v.map(z => (z - m) * (z - m)).sum / v.length)
      qOf(m, sd)
    }
  }

  /** Relabel clusters 0..k−1 in order of each cluster's lowest
    * member index (stable canonical ids).
    */
  private def canonical(labels: Array[Int]): Array[Int] = {
    val seen = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
    labels.foreach(l => if (!seen.contains(l)) seen(l) = seen.size)
    labels.map(seen)
  }
}
