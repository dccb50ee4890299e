package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Optimal trading rules on synthetic OU paths (AFML ch.13): when
  * prices mean-revert as an Ornstein-Uhlenbeck process
  *
  *   p_t = (1 − φ)·E0 + φ·p_{t−1} + σ·ε_t,   φ = 2^(−1/halfLife),
  *
  * the book's experiment sweeps a (profit-taking, stop-loss) grid:
  * each cell simulates trades that exit at +π·σ, −λ·σ, or after
  * `maxHold` steps, and reports the Sharpe ratio of the exit P&L —
  * locating the optimal rule for a given forecast/half-life regime.
  *
  * Determinism (no RNG state anywhere): path draws are Box-Muller
  * normals from md5 uniforms keyed by (path, step) — COMMON RANDOM
  * NUMBERS across grid cells, the standard variance-reduction
  * pairing, so cell comparisons are noise-free and every run is a
  * pure function of the parameters. Per-cell mean/std fold the path
  * returns in path order (sorted-array fold, the momentStats
  * pattern), so results are partition-invariant.
  *
  * Scale shape: one narrow `spark.range(nPaths)` source, each path
  * simulated once in a typed map (O(maxHold) per path), the grid
  * evaluated INSIDE the map against the finished path (array scan
  * per cell — no join, no shuffle until the final ≤`grid²`-cell
  * aggregation). pairs × paths rows into one exchange.
  */
object OptimalRules {

  private[graft] case class CellRet(pt: Double, sl: Double, path: Long, ret: Double)

  /** @param e0        OU long-run level the process reverts to
    * @param p0        entry price (returns are exit-price − p0)
    * @param halfLife  mean-reversion half-life in steps
    * @param sigma     per-step innovation scale
    * @param ptMults   profit-taking thresholds, in σ units
    * @param slMults   stop-loss thresholds, in σ units
    * @return one row per grid cell: pt_mult, sl_mult, n_paths,
    *         mean_ret, std_ret, sharpe (null when std is 0)
    */
  def otrGrid(
      spark: org.apache.spark.sql.SparkSession,
      e0: Double,
      p0: Double = 100.0,
      halfLife: Double = 10.0,
      sigma: Double = 0.5,
      maxHold: Int = 100,
      nPaths: Int = 2000,
      ptMults: Seq[Double] = Seq(0.5, 1.0, 1.5, 2.0),
      slMults: Seq[Double] = Seq(0.5, 1.0, 1.5, 2.0),
      salt: String = "otr",
  ): DataFrame = {
    require(halfLife > 0 && maxHold > 0 && nPaths > 0 && ptMults.nonEmpty && slMults.nonEmpty)
    import spark.implicits._
    val phi = StrictMath.pow(2.0, -1.0 / halfLife)
    val grid = for (pt <- ptMults; sl <- slMults) yield (pt, sl)
    val rows = spark
      .range(nPaths)
      .as[Long]
      .flatMap { pid =>
        // one OU path, then every grid cell scans it for its exit
        val digest = java.security.MessageDigest.getInstance("MD5")
        def uniform(tag: String): Double = {
          val hex = digest.digest(s"$salt:$tag".getBytes("UTF-8"))
            .take(4).map(x => f"${x & 0xff}%02x").mkString
          (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 4294967296.0
        }
        val cp = new Array[Double](maxHold) // cumulative P&L path
        var p = p0
        var t = 0
        while (t < maxHold) {
          val u1 = uniform(s"$pid:$t:a")
          val u2 = uniform(s"$pid:$t:b")
          val z = StrictMath.sqrt(-2.0 * StrictMath.log(u1)) *
            StrictMath.cos(2.0 * math.Pi * u2)
          p = (1.0 - phi) * e0 + phi * p + sigma * z
          cp(t) = p - p0
          t += 1
        }
        grid.map { case (pt, sl) =>
          val up = pt * sigma
          val dn = -sl * sigma
          var i = 0
          var ret = cp(maxHold - 1) // maxHold exit unless a barrier hits
          var open = true
          while (open && i < maxHold) {
            if (cp(i) >= up || cp(i) <= dn) { ret = cp(i); open = false }
            i += 1
          }
          CellRet(pt, sl, pid, ret)
        }
      }
    rows
      .groupBy(col("pt").as("pt_mult"), col("sl").as("sl_mult"))
      .agg(
        count(lit(1)).as("n_paths"),
        sort_array(collect_list(struct(col("path"), col("ret")))).as("__a"),
      )
      .select(
        col("pt_mult"),
        col("sl_mult"),
        col("n_paths"), {
          // path-ordered folds: deterministic under any partitioning
          val s1 = aggregate(col("__a"), lit(0.0), (acc, x) => acc + x.getField("ret"))
          val s2 = aggregate(col("__a"), lit(0.0),
            (acc, x) => acc + x.getField("ret") * x.getField("ret"))
          val nd = col("n_paths").cast("double")
          val mean = s1 / nd
          val variance = s2 / nd - (s1 / nd) * (s1 / nd)
          struct(
            mean.as("mean_ret"),
            sqrt(greatest(variance, lit(0.0))).as("std_ret"),
            when(variance > 0.0, mean / sqrt(variance)).as("sharpe"),
          ).as("__m")
        },
      )
      .select(
        col("pt_mult"),
        col("sl_mult"),
        col("n_paths"),
        col("__m.mean_ret").as("mean_ret"),
        col("__m.std_ret").as("std_ret"),
        col("__m.sharpe").as("sharpe"),
      )
  }
}
