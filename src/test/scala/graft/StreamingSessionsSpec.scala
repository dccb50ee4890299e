package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Sessionize
import graft.streaming.StreamingSessions

/** Streaming sessionization must agree with the batch operator: every
  * session whose close horizon the watermark passes is emitted
  * exactly once, field-identical to batch.
  */
class StreamingSessionsSpec extends SparkSpec {
  import spark.implicits._

  // day-1 base: an event at exactly epoch 0 would equal the initial
  // watermark and be dropped as late before reaching the operator
  private def ts(min: Long) = new Timestamp(86400000L + min * 60000L)

  test("streaming sessions equal batch sessions once the watermark flushes them") {
    // 5 users x interleaved sessions (gaps of 45 min split; <=30 keep),
    // plus a sentinel user far in the future that drags the watermark
    // past every other user's close horizon.
    val rows = (for {
      u <- 0L until 5L
      s <- 0 until 4 // 4 sessions per user
      i <- 0 until 6 // 6 events each, 5 min apart
    } yield (u, ts(s * 120L + i * 5L + u), s"e${i % 3}", (u * 7 + i).toDouble / 3.0)) :+
      ((99L, ts(10000L), "end", 0.0))
    val events = rows.toDF("user_id", "ts", "event_type", "value")
    val dir = Files.createTempDirectory("graft-ssess").toString
    events.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(events.schema).parquet(dir)
    val q = StreamingSessions
      .sessions(stream, gapMinutes = 30, watermark = "2 hours")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_sessions")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("stream_sessions").where(col("user_id") =!= 99L)
    val batch = Sessionize.sessions(events.where(col("user_id") =!= 99L))
    assert(batch.count() == 20) // 5 users x 4 sessions
    assert(streamed.count() == batch.count(), s"streamed=${streamed.count()} batch=${batch.count()}")
    val joined = streamed.as("s").join(
      batch.as("b"),
      col("s.user_id") === col("b.user_id") && col("s.session_idx") === col("b.session_idx"),
    )
    assert(joined.count() == batch.count())
    assert(
      joined.where(
        col("s.ts_start") =!= col("b.ts_start") ||
          col("s.ts_end") =!= col("b.ts_end") ||
          col("s.n_events") =!= col("b.n_events") ||
          col("s.n_event_types") =!= col("b.n_event_types") ||
          col("s.value_cents") =!= col("b.value_cents")
      ).count() == 0
    )
  }

  test("sessions past the watermark horizon stay open (bounded state, no premature emit)") {
    val rows = Seq(
      (1L, ts(0L), "a", 1.0), (1L, ts(10L), "b", 2.0), // session 0
      (1L, ts(60L), "a", 3.0), // session 1 — within 2h of max event time: stays open
    )
    val events = rows.toDF("user_id", "ts", "event_type", "value")
    val dir = Files.createTempDirectory("graft-ssess2").toString
    events.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(events.schema).parquet(dir)
    val q = StreamingSessions
      .sessions(stream, gapMinutes = 30, watermark = "2 hours")
      .writeStream
      .outputMode("append").format("memory").queryName("stream_sessions_open")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("stream_sessions_open").as[StreamingSessions.Session].collect()
    // session 0 was closed by the in-stream gap; session 1 awaits timeout
    assert(got.map(_.session_idx).toSeq == Seq(0L))
    assert(got.head.n_events == 2L && got.head.value_cents == 300L)
  }
}
