package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.api.TradingCols

/** Tick-feed quality control: the per-symbol ingest report a
  * production pipeline checks before any operator downstream trusts
  * the feed. Counted defect classes:
  *
  *  - `n_nonpos`      non-positive prices (bad prints);
  *  - `n_dup_ids`     duplicate trade ids (resends / double writes);
  *  - `n_ts_backwards` event-time regressions in arrival
  *                    (trade_id) order — a mis-ordered feed breaks
  *                    every state-carrying consumer (the streaming
  *                    operators' ordered-arrival contract);
  *  - `n_jumps`       single-tick moves > `jumpPct` of the previous
  *                    price (fat fingers / venue glitches), tested in
  *                    pure integer arithmetic:
  *                    |Δcents|·100 > jumpPct·prevCents;
  *  - plus volume (`n_ticks`), the exact-cents price range, and the
  *    id span for gap estimation.
  *
  * Determinism: every output is an integer count or an exact-cents
  * ratio — no FP accumulation anywhere. Scale shape: one shuffle
  * (the per-symbol sort shared by both lag features), map-side
  * combinable aggregation on top; no driver materialization, no
  * joins.
  */
object TickQc {

  def report(
      df: DataFrame,
      jumpPct: Int = 5,
      c: TradingCols = TradingCols.default,
  ): DataFrame = {
    require(jumpPct >= 1, "jumpPct >= 1")
    val t = df.select(
      col(c.symbol).cast("string").as("symbol"),
      col(c.ts).as("ts"),
      round(col(c.price) * 100).cast("long").as("pc"),
      col(c.tradeId).cast("long").as("trade_id"),
    )
    val wId = Window.partitionBy(col("symbol")).orderBy(col("trade_id"))
    val lagged = t
      .withColumn("__prev_ts", lag(col("ts"), 1).over(wId))
      .withColumn("__prev_pc", lag(col("pc"), 1).over(wId))
    lagged
      .groupBy(col("symbol"))
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
      .withColumn(
        "clean",
        (col("n_nonpos") === 0L && col("n_dup_ids") === 0L &&
          col("n_ts_backwards") === 0L && col("n_jumps") === 0L).cast("int"),
      )
  }
}
