package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.api.TradingCols
import graft.operators.Bars

/** Structured-Streaming OHLCV bars (Spark-first extension; the
  * reference is batch-only). The same tumbling-window time-bar
  * semantics as Bars.timeBars, expressed as a streaming aggregation:
  * watermarked event-time windows, incremental state per
  * (symbol, window), append-mode emission once the watermark passes.
  *
  * At scale this is the standard continuous ingestion path: state is
  * partitioned by group key, bounded by the watermark horizon, and
  * bars finalize exactly once.
  */
object StreamingBars {

  def timeBars(
      stream: DataFrame,
      barSize: String = "1 hour",
      watermark: String = "2 hours",
      c: TradingCols = TradingCols.default,
  ): DataFrame = {
    val aggs = Bars.ohlcvAggs(c, col(c.size))
    stream
      .where(col(c.price).isNotNull)
      .withWatermark(c.ts, watermark)
      .groupBy(col(c.symbol), window(col(c.ts), barSize).getField("start").as("bar_ts"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
