package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Dedup
import graft.streaming.StreamingMinhash

/** Streaming MinHash+LSH near-dup pairs must equal the batch operator
  * on the same corpus (within the watermark horizon), with exactly-once
  * pair emission and the documented recall bound outside the horizon.
  */
class StreamingMinhashSpec extends SparkSpec {

  private def runStream(docs: org.apache.spark.sql.DataFrame, name: String, watermark: String) = {
    val dir = Files.createTempDirectory("graft-smh").toString
    docs.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(docs.schema).parquet(dir)
    val q = StreamingMinhash
      .pairsWithinWatermark(stream, "ts", watermark = watermark, threshold = 0.5)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    spark.table(name)
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("id_a", "id_b", "jaccard")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet

  test("streaming minhash pairs equal batch minhashLsh on the same corpus") {
    val base = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    // guarantee near-dups: 20 exact copies under shifted ids
    val corpus = base.unionByName(
      base.limit(20).select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    )
    val docs = corpus.withColumn(
      "ts",
      timestamp_micros(lit(1704067200000000L) + (col("doc_id") % 1000) * 1000000L),
    )
    val streamed = pairSet(runStream(docs, "smh_pairs", watermark = "1 day"))
    val batch = pairSet(Dedup.minhashLsh(corpus, threshold = 0.5))
    assert(streamed.nonEmpty)
    assert(streamed == batch, s"streaming != batch: only-streaming=${streamed -- batch}, only-batch=${batch -- streamed}")
  }

  test("pairs separated by more than the watermark horizon are not emitted") {
    import spark.implicits._
    val docs = Seq(
      // identical texts: certain LSH collision, jaccard 1.0
      (1L, "the quick brown fox jumps over the lazy dog again and again", "2024-01-01 00:00:00"),
      (2L, "the quick brown fox jumps over the lazy dog again and again", "2024-01-01 02:30:00"),
      // identical texts 10 minutes apart: inside the 1h horizon
      (3L, "spark structured streaming keeps state bounded by watermarks", "2024-01-01 05:00:00"),
      (4L, "spark structured streaming keeps state bounded by watermarks", "2024-01-01 05:10:00"),
    ).toDF("doc_id", "text", "s").withColumn("ts", col("s").cast("timestamp")).drop("s")
    val got = pairSet(runStream(docs, "smh_horizon", watermark = "1 hour"))
    assert(got == Set((3L, 4L, 1.0)), s"got $got")
  }
}
