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
    /** Deterministic per-trade tiebreaker for ordering at equal timestamps. */
    tradeId: String = "trade_id",
)

object TradingCols {
  val default: TradingCols = TradingCols()
}
