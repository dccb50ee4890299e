package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.api.TradingCols

/** Tick-feed quality control: the per-symbol ingest report a
  * production pipeline checks before any operator downstream trusts
  * the feed. Counted defect classes:
  *
  *  - `n_nonpos`       non-positive prices (bad prints);
  *  - `n_dup_ids`      duplicate trade ids (resends / double writes);
  *  - `n_ts_backwards` event-time regressions in arrival (trade_id)
  *                     order — a mis-ordered feed breaks every
  *                     state-carrying consumer (the streaming
  *                     operators' ordered-arrival contract);
  *  - `n_jumps`        single-tick moves > `jumpPct` of the previous
  *                     price (fat fingers / venue glitches), tested
  *                     in pure integer arithmetic:
  *                     |Δcents|·100 > jumpPct·prevCents;
  *  - plus volume (`n_ticks`), the exact-cents price range, and the
  *    id span for gap estimation.
  *
  * Determinism: every output is an integer count or an exact-cents
  * ratio — no FP accumulation; adjacency is the TOTAL order
  * (trade_id, ts, cents), so even a feed with duplicate ids (a
  * defect this report exists to count) yields engine-independent
  * counts.
  *
  * Scale shape — the hot-symbol problem: a plain per-symbol window
  * serializes each symbol's sort on one core (the SPY feed dominates
  * a real tape; measured 11× wall at 100× data on the 5-symbol
  * corpus). The lag features only need the PREVIOUS row, so the scan
  * chunks by trade_id range ([[chunkSize]] ids per chunk — `div` is
  * monotone, so chunk order extends id order): windows run per
  * (symbol, chunk) with chunk-count parallelism, and the one
  * adjacent pair that crosses each boundary is counted on the tiny
  * per-chunk head/tail table (symbols × chunks rows). Exactly equal
  * to the global-window form ([[reportGlobal]], spec-pinned) —
  * which is also the shape the DuckDB oracle replays.
  */
object TickQc {

  def report(
      df: DataFrame,
      jumpPct: Int = 5,
      c: TradingCols = TradingCols.default,
      chunkSize: Long = 1L << 20,
  ): DataFrame = {
    require(jumpPct >= 1, "jumpPct >= 1")
    require(chunkSize >= 2, "chunkSize >= 2")
    val t = base(df, c).withColumn("__chunk", expr(s"trade_id div $chunkSize"))
    val wC = Window
      .partitionBy(col("symbol"), col("__chunk"))
      .orderBy(col("trade_id"), col("ts"), col("pc"))
    val wCd = Window
      .partitionBy(col("symbol"), col("__chunk"))
      .orderBy(col("trade_id").desc, col("ts").desc, col("pc").desc)
    val lagged = t
      .withColumn("__prev_ts", lag(col("ts"), 1).over(wC))
      .withColumn("__prev_pc", lag(col("pc"), 1).over(wC))
      .withColumn("__rn1", row_number().over(wC))
      .withColumn("__rn9", row_number().over(wCd))
    val inChunk = countsOf(lagged, jumpPct)
    // head/tail per (symbol, chunk) — bounded rows; the single
    // cross-boundary adjacent pair per chunk is counted here
    val bounds = lagged
      .where(col("__rn1") === 1 || col("__rn9") === 1)
      .groupBy(col("symbol"), col("__chunk"))
      .agg(
        max(when(col("__rn1") === 1, col("ts"))).as("__hts"),
        max(when(col("__rn1") === 1, col("pc"))).as("__hpc"),
        max(when(col("__rn9") === 1, col("ts"))).as("__tts"),
        max(when(col("__rn9") === 1, col("pc"))).as("__tpc"),
      )
    val wB = Window.partitionBy(col("symbol")).orderBy(col("__chunk"))
    val cross = bounds
      .withColumn("__pts", lag(col("__tts"), 1).over(wB))
      .withColumn("__ppc", lag(col("__tpc"), 1).over(wB))
      .groupBy(col("symbol"))
      .agg(
        sum(when(col("__pts").isNotNull && col("__hts") < col("__pts"), 1L).otherwise(0L))
          .as("__xb"),
        sum(
          when(
            col("__ppc").isNotNull && col("__ppc") > 0L &&
              abs(col("__hpc") - col("__ppc")) * lit(100L) > lit(jumpPct.toLong) * col("__ppc"),
            1L,
          ).otherwise(0L)
        ).as("__xj"),
      )
    verdict(
      inChunk
        .join(cross, Seq("symbol"), "left")
        .withColumn("n_ts_backwards", col("n_ts_backwards") + coalesce(col("__xb"), lit(0L)))
        .withColumn("n_jumps", col("n_jumps") + coalesce(col("__xj"), lit(0L)))
        .drop("__xb", "__xj")
    )
  }

  /** Per-(symbol, day) variant of [[report]] — the daily ingest gate
    * and the batch twin of [[graft.streaming.StreamingTickQc]]. Lag
    * features restart at each day boundary (the window partitions by
    * (symbol, date)), so a day's counts depend only on that day's
    * ticks — the property that makes the streaming twin's
    * day-rollover finality exact. `n_dup_ids` is likewise per
    * (symbol, day): a resend landing on a different calendar day is
    * a backwards-ts defect on that day, not a duplicate here.
    * Parallelism is (symbols × days) — the hot-symbol tape
    * parallelizes by day without [[report]]'s chunk machinery; if a
    * single symbol-day ever outgrows a task, chunk inside the day
    * the same way.
    */
  def reportDaily(
      df: DataFrame,
      jumpPct: Int = 5,
      c: TradingCols = TradingCols.default,
  ): DataFrame = {
    require(jumpPct >= 1, "jumpPct >= 1")
    val t = base(df, c).withColumn("date", to_date(col("ts")))
    val w = Window
      .partitionBy(col("symbol"), col("date"))
      .orderBy(col("trade_id"), col("ts"), col("pc"))
    val lagged = t
      .withColumn("__prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("__prev_pc", lag(col("pc"), 1).over(w))
    verdict(countsOf(lagged, jumpPct, Seq("symbol", "date")), Seq("symbol", "date"))
  }

  /** Single global-window formulation — the semantic reference the
    * chunked form is pinned equal to (and the oracle's shape).
    * Serializes per symbol; use [[report]] in production.
    */
  private[graft] def reportGlobal(
      df: DataFrame,
      jumpPct: Int = 5,
      c: TradingCols = TradingCols.default,
  ): DataFrame = {
    val wId = Window
      .partitionBy(col("symbol"))
      .orderBy(col("trade_id"), col("ts"), col("pc"))
    val lagged = base(df, c)
      .withColumn("__prev_ts", lag(col("ts"), 1).over(wId))
      .withColumn("__prev_pc", lag(col("pc"), 1).over(wId))
    verdict(countsOf(lagged, jumpPct))
  }

  private def base(df: DataFrame, c: TradingCols): DataFrame =
    df.select(
      col(c.symbol).cast("string").as("symbol"),
      col(c.ts).as("ts"),
      round(col(c.price) * 100).cast("long").as("pc"),
      col(c.tradeId).cast("long").as("trade_id"),
    )

  private def countsOf(
      lagged: DataFrame,
      jumpPct: Int,
      keys: Seq[String] = Seq("symbol"),
  ): DataFrame =
    lagged
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_ticks"),
        sum(when(col("pc") <= 0L, 1L).otherwise(0L)).as("n_nonpos"),
        (count(lit(1)) - countDistinct(col("trade_id"))).as("n_dup_ids"),
        sum(when(col("__prev_ts").isNotNull && col("ts") < col("__prev_ts"), 1L).otherwise(0L))
          .as("n_ts_backwards"),
        sum(
          when(
            col("__prev_pc").isNotNull && col("__prev_pc") > 0L &&
              abs(col("pc") - col("__prev_pc")) * lit(100L) > lit(jumpPct.toLong) * col("__prev_pc"),
            1L,
          ).otherwise(0L)
        ).as("n_jumps"),
        (min(col("pc")).cast("double") / lit(100.0)).as("min_price"),
        (max(col("pc")).cast("double") / lit(100.0)).as("max_price"),
        min(col("trade_id")).as("first_id"),
        max(col("trade_id")).as("last_id"),
      )

  private def verdict(counts: DataFrame, keys: Seq[String] = Seq("symbol")): DataFrame =
    counts
      .withColumn(
        "clean",
        (col("n_nonpos") === 0L && col("n_dup_ids") === 0L &&
          col("n_ts_backwards") === 0L && col("n_jumps") === 0L).cast("int"),
      )
      .select(
        keys.map(col) ++ Seq(
          col("n_ticks"), col("n_nonpos"), col("n_dup_ids"),
          col("n_ts_backwards"), col("n_jumps"), col("min_price"), col("max_price"),
          col("first_id"), col("last_id"), col("clean"),
        ): _*
      )
}
