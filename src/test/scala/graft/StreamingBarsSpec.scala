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
