package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.api.TradingCols

/** Futures-roll gap adjustment — the "ETF trick" (AFML ch.2.4,
  * reference scope: the continuous-series preprocessing the bar
  * operators assume). Contract months are (symbol, calendar month);
  * at each roll the new contract opens with a price gap that is
  * carry/basis, not tradable P&L, so the continuous series subtracts
  * the cumulative roll gaps:
  *
  *   gap_m  = open(m) − close(m−1)   (0 for the first month),
  *   adj_t  = p_t − Σ_{m ≤ month(t)} gap_m,
  *
  * which is gap-free at every roll and anchored at the first
  * contract's open (forward adjustment; the back-adjusted variant is
  * the same series minus its final cumulative gap, a per-symbol
  * constant).
  *
  * Determinism: prices are exact cents end-to-end; the ONLY FP step
  * is the final cents→price division, identical in the oracle.
  *
  * Scale shape: one aggregation to the per-(symbol, month) open/close
  * table (codegen-resident via [[graft.functions.OrderedAgg]] — a
  * struct-ordered min_by would demote the whole agg), windows over
  * that TINY table (rows = symbols × months, ~10⁴ smaller than
  * ticks), then one equi-join back to the ticks on (symbol, month) —
  * un-hinted so AQE broadcasts the gap table while it fits (it
  * essentially always does: even 10⁶ symbols × 120 months is ~2 GB
  * of 16-byte rows, shard by symbol range above that) and falls back
  * to a shuffled join beyond. No window function ever runs over the
  * tick-scale table.
  */
object RollAdjust {

  /** Per-(symbol, month) roll-gap table: symbol, month (date),
    * open_pc, close_pc, gap_cents, cum_gap_cents.
    */
  def rollGaps(df: DataFrame, c: TradingCols = TradingCols.default): DataFrame = {
    val months = df.na
      .drop(Seq(c.price))
      .select(
        col(c.symbol).cast("string").as("symbol"),
        trunc(to_date(col(c.ts)), "month").as("month"),
        col(c.ts).as("ts"),
        round(col(c.price) * 100).cast("long").as("pc"),
        col(c.tradeId).cast("long").as("trade_id"),
      )
      .groupBy(col("symbol"), col("month"))
      .agg(
        graft.functions.OrderedAgg.firstByOrd(col("pc"), col("ts"), col("trade_id")).as("open_pc"),
        graft.functions.OrderedAgg.lastByOrd(col("pc"), col("ts"), col("trade_id")).as("close_pc"),
      )
    val wM = Window.partitionBy(col("symbol")).orderBy(col("month"))
    val wCum = wM.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    months
      .withColumn("__prev_close", lag(col("close_pc"), 1).over(wM))
      .withColumn(
        "gap_cents",
        when(col("__prev_close").isNotNull, col("open_pc") - col("__prev_close")).otherwise(0L),
      )
      .withColumn("cum_gap_cents", sum(col("gap_cents")).over(wCum))
      .drop("__prev_close")
  }

  /** Gap-adjusted tick series: the input ticks plus `cum_gap_cents`
    * and `adj_price` (= price − cumulative gap at the tick's month).
    */
  def adjust(df: DataFrame, c: TradingCols = TradingCols.default): DataFrame = {
    val gaps = rollGaps(df, c).select(col("symbol"), col("month"), col("cum_gap_cents"))
    val ticks = df.na
      .drop(Seq(c.price))
      .select(
        col(c.symbol).cast("string").as("symbol"),
        col(c.ts).as("ts"),
        col(c.price).as("price"),
        round(col(c.price) * 100).cast("long").as("__pc"),
        trunc(to_date(col(c.ts)), "month").as("month"),
        col(c.tradeId).cast("long").as("trade_id"),
      )
    ticks
      .join(gaps, Seq("symbol", "month"))
      .select(
        col("symbol"),
        col("ts"),
        col("trade_id"),
        col("price"),
        col("cum_gap_cents"),
        ((col("__pc") - col("cum_gap_cents")).cast("double") / lit(100.0)).as("adj_price"),
      )
  }
}
