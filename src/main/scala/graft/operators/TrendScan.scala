package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.api.TradingCols

/** Trend-scanning labels (AFML ch.5.2 — beyond the reference's
  * fixed-horizon labels): for each observation, fit OLS of price on
  * the time index over every forward horizon L in [minHorizon,
  * maxHorizon], pick the horizon with the largest |t-value| of the
  * slope (smallest L wins ties), and label by the slope's sign.
  *
  * Fully declarative — no sequential state. One exchange on symbol,
  * one sort; forward-window sums come from cumulative sums + lead()
  * over the same sorted window (two WindowExec, zero extra
  * exchanges), so the plan survives any scale the sort does.
  *
  * Exactness: prices become integer cents and the time index is the
  * per-symbol row number, so every OLS moment (Sy, Syy, Sxy) is an
  * exact BIGINT; the t-value is a fixed double expression tree over
  * those integers, replicated op-for-op by the DuckDB oracle. The
  * horizon argmax compares (|t|, -L) structs — a double computed
  * identically on both engines — so the chosen horizon is
  * engine-exact.
  *
  * Only rows where the LONGEST horizon fits are labeled (every
  * candidate window complete), matching the oracle's lead() null
  * check.
  */
object TrendScan {

  def labels(
      df: DataFrame,
      minHorizon: Int = 5,
      maxHorizon: Int = 20,
      c: TradingCols = TradingCols.default,
  ): DataFrame = {
    require(minHorizon >= 3, "t-value needs at least 3 points")
    require(maxHorizon >= minHorizon, "maxHorizon >= minHorizon")
    val ord = Window
      .partitionBy(col("__sym"))
      .orderBy(col("__ts"), col("__tid"))
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val base = df
      .select(
        col(c.symbol).cast("string").as("__sym"),
        col(c.ts).cast("timestamp").as("__ts"),
        col(c.price).cast("double").as("__price"),
        col(c.tradeId).cast("long").as("__tid"),
      )
      .withColumn("__cents", round(col("__price") * 100).cast("long"))
      .withColumn("__rn", row_number().over(ord).cast("long"))
      .withColumn("__cy", sum(col("__cents")).over(cum))
      .withColumn("__cyy", sum(col("__cents") * col("__cents")).over(cum))
      .withColumn("__cjy", sum(col("__rn") * col("__cents")).over(cum))

    // Three perf-critical structural choices, all measured at sf0.1:
    //  1. Every lead() is materialized ONCE as a named column — Spark
    //     does NOT deduplicate textually repeated window expressions,
    //     so referencing lead(cy, L-1) six times inside a t-value
    //     tree would plan six separate window functions.
    //  2. Each horizon's t-value tree is computed ONCE into a column.
    //  3. The argmax projection lives ABOVE the __full Window node,
    //     which CollapseProject cannot cross — without that barrier
    //     the struct array would inline ~4 copies of every tree
    //     (abs, t, b, sign), quadrupling codegen size and runtime.
    val ls = minHorizon to maxHorizon
    val leadCols = ls.flatMap { l =>
      Seq(
        lead(col("__cy"), l - 1).over(ord).as(s"__cye_$l"),
        lead(col("__cyy"), l - 1).over(ord).as(s"__cyye_$l"),
        lead(col("__cjy"), l - 1).over(ord).as(s"__cjye_$l"),
      )
    }
    val withLeads = base.select(
      Seq(
        col("__sym"), col("__ts"), col("__tid"), col("__price"),
        col("__rn"), col("__cents"), col("__cy"), col("__cyy"), col("__cjy"),
      ) ++ leadCols: _*
    )

    // forward-window moments for horizon L: S = cum(end) - cum(before start)
    def horizonCols(l: Int): Seq[Column] = {
      val sy = col(s"__cye_$l") - (col("__cy") - col("__cents"))
      val syy = col(s"__cyye_$l") - (col("__cyy") - col("__cents") * col("__cents"))
      val sjy = col(s"__cjye_$l") - (col("__cjy") - col("__rn") * col("__cents"))
      val sxy = sjy - col("__rn") * sy // x rebased to 0..L-1
      val sx = l.toLong * (l - 1) / 2
      val sxx = (l - 1).toLong * l * (2 * l - 1) / 6
      val den = l * sxx - sx * sx // = L * centered Sxx
      val num = lit(l.toLong) * sxy - lit(sx) * sy
      val b = num.cast("double") / lit(den.toDouble)
      val sxxc = den.toDouble / l
      val syyc = syy.cast("double") - sy.cast("double") * sy.cast("double") / lit(l.toDouble)
      val ssr = syyc - b * b * lit(sxxc)
      val tval = when(ssr <= lit(0.0), signum(num).cast("double") * lit(1e308))
        .otherwise(b * lit(math.sqrt(sxxc)) / sqrt(ssr / lit((l - 2).toDouble)))
      Seq(tval.as(s"__t_$l"), b.as(s"__b_$l"), signum(num).cast("int").as(s"__lab_$l"))
    }

    val projected = withLeads.select(
      Seq(col("__sym"), col("__ts"), col("__tid"), col("__price"), col("__rn")) ++
        ls.flatMap(horizonCols): _*
    )
    val cands = array(ls.map { l =>
      struct(
        abs(col(s"__t_$l")).as("a"),
        lit(-l).as("nl"),
        col(s"__t_$l").as("t"),
        col(s"__b_$l").as("b"),
        col(s"__lab_$l").as("lab"),
        lit(l).as("l"),
      )
    }: _*)
    projected
      // every horizon complete: the longest lead must exist. This
      // Window is also the CollapseProject barrier described above.
      .withColumn("__full", lead(col("__rn"), maxHorizon - 1).over(ord).isNotNull)
      .where(col("__full"))
      .withColumn("__best", array_max(cands))
      .select(
        col("__sym").as(c.symbol),
        col("__ts").as(c.ts),
        col("__price").as(c.price),
        col("__best.l").as("best_l"),
        col("__best.lab").as("label"),
        col("__best.b").as("beta"),
        col("__best.t").as("tval"),
      )
  }
}
