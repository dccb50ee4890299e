package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.operators.RollAdjust
import graft.sources.TradeData
import graft.streaming.StreamingRollAdjust

/** Streaming roll adjustment must be bit-equal to the batch operator
  * on event-time-ordered replay — every tick, every column.
  */
class StreamingRollAdjustSpec extends SparkSpec {
  import spark.implicits._

  test("streaming roll adjust == batch adjust, bit-equal on real ticks") {
    val trades = TradeData.fromEvents(spark, "/root/testdata/sf0.001")
    val dir = Files.createTempDirectory("graft-rolladj").toString
    trades.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(trades.schema).parquet(dir)
    val q = StreamingRollAdjust
      .adjusted(stream)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_rolladj")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark
      .table("stream_rolladj")
      .orderBy("symbol", "trade_id")
      .select("symbol", "trade_id", "price", "cum_gap_cents", "adj_price")
      .as[(String, Long, Double, Long, Double)]
      .collect()
      .toSeq
    val batch = RollAdjust
      .adjust(trades)
      .orderBy("symbol", "trade_id")
      .select("symbol", "trade_id", "price", "cum_gap_cents", "adj_price")
      .as[(String, Long, Double, Long, Double)]
      .collect()
      .toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming roll adjust: gap continuity across a month boundary, O(1) state") {
    val rows = Seq(
      ("A", java.sql.Timestamp.valueOf("2021-01-05 10:00:00"), 100.0, 1L),
      ("A", java.sql.Timestamp.valueOf("2021-01-28 10:00:00"), 102.0, 2L),
      ("A", java.sql.Timestamp.valueOf("2021-02-01 09:00:00"), 105.0, 3L), // +3.00 gap
      ("A", java.sql.Timestamp.valueOf("2021-02-15 10:00:00"), 104.0, 4L),
    ).toDF("symbol", "ts", "price", "trade_id")
    val dir = Files.createTempDirectory("graft-rolladj2").toString
    rows.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(rows.schema).parquet(dir)
    val q = StreamingRollAdjust
      .adjusted(stream)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_rolladj2")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val out = spark.table("stream_rolladj2").orderBy("trade_id")
      .select("adj_price", "cum_gap_cents")
      .as[(Double, Long)].collect().toSeq
    assert(out == Seq((100.0, 0L), (102.0, 0L), (102.0, 300L), (101.0, 300L)))
  }
}
