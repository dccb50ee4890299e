package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Bars
import graft.sources.TradeData
import graft.streaming.StreamingBars

/** Streaming time bars must agree with the batch operator on the
  * same input (complete-mode memory sink drives the whole file
  * through the streaming engine).
  */
class StreamingBarsSpec extends SparkSpec {

  test("stateful streaming tick bars equal batch tick bars (completed bars)") {
    val trades = TradeData.fromEvents(spark, "/root/testdata/sf0.001")
    val dir = Files.createTempDirectory("graft-stateful").toString
    trades.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(trades.schema).parquet(dir)
    val q = graft.streaming.StatefulBars
      .tickBars(stream, barSize = 20)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stateful_bars")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("stateful_bars")
    // batch equivalent without date splitting; trailing partial bars
    // stay in streaming state, so compare completed bars only
    val batch = Bars
      .tickBars(trades, barSize = 20, splitByDate = false)
      .where(col("n_trades") === 20)
    assert(streamed.count() == batch.count() && streamed.count() > 0)
    val joined = streamed
      .as("s")
      .join(batch.as("b"), col("s.symbol") === col("b.symbol") && col("s.ts_start") === col("b.ts_start"))
      .where(
        col("s.volume") =!= col("b.volume") ||
          abs(col("s.vwap") - col("b.vwap")) > lit(1e-9) ||
          col("s.open") =!= col("b.open") || col("s.close") =!= col("b.close")
      )
    assert(joined.count() == 0)
  }

  test("streaming time bars equal batch time bars on the same data") {
    val batchTrades = TradeData.fromEvents(spark, "/root/testdata/sf0.001")
    val dir = Files.createTempDirectory("graft-stream").toString
    batchTrades.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema(batchTrades.schema)
      .parquet(dir)
    val q = StreamingBars
      .timeBars(stream, "1 hour")
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("stream_bars")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("stream_bars")
    val batch = Bars.timeBars(batchTrades, "1 hour")
    assert(streamed.count() == batch.count())
    val joined = streamed
      .as("s")
      .join(batch.as("b"), Seq("symbol", "bar_ts"))
      .where(
        col("s.volume") =!= col("b.volume") ||
          col("s.n_trades") =!= col("b.n_trades") ||
          abs(col("s.vwap") - col("b.vwap")) > lit(1e-9) ||
          col("s.open") =!= col("b.open") || col("s.close") =!= col("b.close")
      )
    assert(joined.count() == 0)
  }
}
