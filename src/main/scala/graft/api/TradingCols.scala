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

  /** Session-scoped column config — the Spark-idiomatic analog of the
    * reference's context-variable global (config.py:68
    * `set_column_names`): `SET graft.price_col=px` (SQL) or
    * `spark.conf.set("graft.price_col", "px")` (Scala), read at call
    * time. Unset keys fall back to the defaults, so partial overrides
    * compose. Session confs are per-session (not cluster-global), the
    * same scoping the reference's context manager gives.
    */
  def fromSession(spark: org.apache.spark.sql.SparkSession): TradingCols = {
    def g(key: String, dflt: String): String =
      spark.conf.getOption(s"graft.${key}_col").filter(_.nonEmpty).getOrElse(dflt)
    TradingCols(
      symbol = g("symbol", default.symbol),
      ts = g("ts", default.ts),
      price = g("price", default.price),
      size = g("size", default.size),
      tradeId = g("trade_id", default.tradeId),
      open = g("open", default.open),
      high = g("high", default.high),
      low = g("low", default.low),
      close = g("close", default.close),
    )
  }
}
