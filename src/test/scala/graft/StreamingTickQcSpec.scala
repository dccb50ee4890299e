package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.TickQc
import graft.sources.TradeData
import graft.streaming.StreamingTickQc

/** The streaming ingest-QC twin must equal the batch per-(symbol,
  * day) report on completed days, and count every planted defect
  * exactly — including pairs split across micro-batch boundaries
  * (the lag carry, the duplicate-id seen-set, the day rollover).
  */
class StreamingTickQcSpec extends SparkSpec {

  test("streaming tick QC equals batch reportDaily on completed days") {
    val trades = TradeData.fromEvents(spark, "/root/testdata/sf0.001")
    val dir = Files.createTempDirectory("graft-sqc").toString
    trades.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(trades.schema).parquet(dir)
    val q = StreamingTickQc
      .report(stream)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_qc")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("stream_qc")
    val batch = TickQc
      .reportDaily(trades)
      .withColumn("date", col("date").cast("string"))
    // the last open day per symbol stays in streaming state
    val lastDay = batch.groupBy("symbol").agg(max("date").as("date"))
    val batchDone = batch.join(lastDay, Seq("symbol", "date"), "left_anti")
    assert(streamed.count() == batchDone.count() && streamed.count() > 0)
    val joined = streamed.as("s").join(batchDone.as("b"), Seq("symbol", "date"))
    assert(joined.count() == batchDone.count())
    // integer counters and the identical cents/100.0 division: exact
    assert(
      joined.where(
        col("s.n_ticks") =!= col("b.n_ticks") || col("s.n_nonpos") =!= col("b.n_nonpos") ||
          col("s.n_dup_ids") =!= col("b.n_dup_ids") ||
          col("s.n_ts_backwards") =!= col("b.n_ts_backwards") ||
          col("s.n_jumps") =!= col("b.n_jumps") ||
          col("s.min_price") =!= col("b.min_price") ||
          col("s.max_price") =!= col("b.max_price") ||
          col("s.first_id") =!= col("b.first_id") || col("s.last_id") =!= col("b.last_id") ||
          col("s.clean") =!= col("b.clean")
      ).count() == 0
    )
  }

  test("planted defects count exactly across micro-batch boundaries") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    // day1 (AAA): 8 ticks, 1 nonpos (id 103), 1 dup (id 104 resent in
    // the NEXT micro-batch), 2 backwards ts (ids 102, 106), 2 jumps
    // (1020→0 at id 103, 1020→1080 at id 106 — both >5% in cents)
    val b1 = Seq(
      StreamingTickQc.QcTick("AAA", t("2024-01-01 10:00:00"), 10.00, 100L),
      StreamingTickQc.QcTick("AAA", t("2024-01-01 10:00:01"), 10.20, 101L),
      StreamingTickQc.QcTick("AAA", t("2024-01-01 10:00:00"), 10.20, 102L),
      StreamingTickQc.QcTick("AAA", t("2024-01-01 10:00:03"), 0.00, 103L),
      StreamingTickQc.QcTick("AAA", t("2024-01-01 10:00:04"), 10.20, 104L),
      StreamingTickQc.QcTick("BBB", t("2024-01-01 10:00:00"), 50.00, 500L),
      StreamingTickQc.QcTick("BBB", t("2024-01-01 10:00:01"), 50.00, 501L),
    )
    val b2 = Seq(
      StreamingTickQc.QcTick("AAA", t("2024-01-01 10:00:05"), 10.20, 104L), // resend
      StreamingTickQc.QcTick("AAA", t("2024-01-01 10:00:06"), 10.20, 105L),
      StreamingTickQc.QcTick("AAA", t("2024-01-01 10:00:05"), 10.80, 106L),
      StreamingTickQc.QcTick("AAA", t("2024-01-02 09:00:00"), 10.80, 200L), // rolls day1
      StreamingTickQc.QcTick("AAA", t("2024-01-02 09:00:01"), 10.80, 201L),
      StreamingTickQc.QcTick("BBB", t("2024-01-02 09:00:00"), 50.00, 600L), // rolls BBB day1
    )
    val b3 = Seq(
      StreamingTickQc.QcTick("AAA", t("2024-01-02 09:00:02"), 10.80, 202L),
      StreamingTickQc.QcTick("AAA", t("2024-01-03 09:00:00"), 11.00, 300L), // rolls day2
    )
    val ms = MemoryStream[StreamingTickQc.QcTick](spark)
    val q = StreamingTickQc
      .report(ms.toDF())
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_qc_planted")
      .start()
    try {
      Seq(b1, b2, b3).foreach { b => ms.addData(b); q.processAllAvailable() }
    } finally q.stop()

    val got = spark.table("stream_qc_planted")
    // exact planted counts for AAA day1
    val d1 = got.where(col("symbol") === "AAA" && col("date") === "2024-01-01").collect()
    assert(d1.length == 1)
    val r = d1.head
    assert(r.getAs[Long]("n_ticks") == 8L)
    assert(r.getAs[Long]("n_nonpos") == 1L)
    assert(r.getAs[Long]("n_dup_ids") == 1L, "cross-batch resend missed")
    assert(r.getAs[Long]("n_ts_backwards") == 2L)
    assert(r.getAs[Long]("n_jumps") == 2L)
    assert(r.getAs[Double]("min_price") == 0.0 && r.getAs[Double]("max_price") == 10.80)
    assert(r.getAs[Long]("first_id") == 100L && r.getAs[Long]("last_id") == 106L)
    assert(r.getAs[Int]("clean") == 0)
    // completed days match the batch operator on the same rows
    val all = (b1 ++ b2 ++ b3).toDF()
    val batch = TickQc
      .reportDaily(all)
      .withColumn("date", col("date").cast("string"))
    val lastDay = batch.groupBy("symbol").agg(max("date").as("date"))
    val batchDone = batch.join(lastDay, Seq("symbol", "date"), "left_anti")
    assert(got.count() == batchDone.count()) // AAA day1+day2, BBB day1
    val joined = got.as("s").join(batchDone.as("b"), Seq("symbol", "date"))
    assert(joined.count() == 3)
    assert(
      joined.where(
        col("s.n_ticks") =!= col("b.n_ticks") || col("s.n_nonpos") =!= col("b.n_nonpos") ||
          col("s.n_dup_ids") =!= col("b.n_dup_ids") ||
          col("s.n_ts_backwards") =!= col("b.n_ts_backwards") ||
          col("s.n_jumps") =!= col("b.n_jumps") ||
          col("s.min_price") =!= col("b.min_price") ||
          col("s.max_price") =!= col("b.max_price") ||
          col("s.first_id") =!= col("b.first_id") || col("s.last_id") =!= col("b.last_id") ||
          col("s.clean") =!= col("b.clean")
      ).count() == 0
    )
    // clean-day verdict sanity: AAA day2 and BBB day1 are defect-free
    assert(
      got.where(col("clean") === 1).count() == 2
    )
  }
}
