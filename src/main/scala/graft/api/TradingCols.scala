package graft.api

/** Column-name configuration for market-data operators.
  *
  * Mirrors the reference's configurable column names
  * (/root/reference/polars_trading/config.py:21 DEFAULT_COLUMN_NAMES)
  * as an immutable value passed to each operator — idiomatic Scala
  * instead of the reference's context-variable global.
  */
final case class TradingCols(
    symbol: String = "symbol",
    ts: String = "ts",
    price: String = "price",
    size: String = "size",
    /** Deterministic per-trade tiebreaker for ordering at equal
      * timestamps; operators fall back to timestamp-only ordering
      * when the input has no such column.
      */
    tradeId: String = "trade_id",
    /** OHLC output column names (config.py also renames the bar
      * outputs, not just the inputs).
      */
    open: String = "open",
    high: String = "high",
    low: String = "low",
    close: String = "close",
)

object TradingCols {
  val default: TradingCols = TradingCols()
}
