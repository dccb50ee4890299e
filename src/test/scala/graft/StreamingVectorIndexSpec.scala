package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.VectorIndex
import graft.streaming.StreamingVectorIndex

class StreamingVectorIndexSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private val split = 80L

  private def temp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-svidx-$tag").toString

  test("streamed ingest == batch appendIndex, store contents file-compatible") {
    val storeBatch = temp("b")
    val storeStream = temp("s")
    VectorIndex.buildIndex(emb.where(col("vec_id") < split), storeBatch, nCells = 16, kmeansIters = 0)
    VectorIndex.buildIndex(emb.where(col("vec_id") < split), storeStream, nCells = 16, kmeansIters = 0)
    VectorIndex.appendIndex(spark, storeBatch, emb.where(col("vec_id") >= split))
    // the same batch-2 rows over a file stream, multiple source files
    // so AvailableNow forms more than one micro-batch shape
    val src = temp("src")
    emb.where(col("vec_id") >= split).repartition(3).write.mode("overwrite").parquet(src)
    val q = StreamingVectorIndex
      .ingest(spark, storeStream, spark.readStream.schema(emb.schema).parquet(src), temp("ckpt"))
      .start()
    q.awaitTermination()
    def stored(dir: String) =
      spark.read
        .parquet(s"$dir/vectors")
        .select(col("id"), col("cell").cast("long").as("cell"), col("nv"))
        .orderBy("id")
        .collect()
        .toSeq
        .map(_.toSeq)
    val a = stored(storeBatch)
    val b = stored(storeStream)
    assert(a.size == emb.count())
    assert(a == b) // ids, cells AND normalized vectors bit-equal
  }

  test("stateless assigned transform: streamed cells == the store's batch assignment") {
    val store = temp("a")
    VectorIndex.buildIndex(emb.where(col("vec_id") < split), store, nCells = 16, kmeansIters = 0)
    VectorIndex.appendIndex(spark, store, emb.where(col("vec_id") >= split))
    val src = temp("asrc")
    emb.where(col("vec_id") >= split).repartition(2).write.mode("overwrite").parquet(src)
    val q = StreamingVectorIndex
      .assigned(spark, store, spark.readStream.schema(emb.schema).parquet(src))
      .writeStream
      .format("memory")
      .queryName("svidx_assigned")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark
      .table("svidx_assigned")
      .select(col("id"), col("cell"))
      .orderBy("id")
      .collect()
      .toSeq
      .map(_.toSeq)
    val batch = spark.read
      .parquet(s"$store/vectors")
      .select(col("id"), col("cell").cast("long").as("cell"))
      .where(col("id") >= split)
      .orderBy("id")
      .collect()
      .toSeq
      .map(_.toSeq)
    assert(streamed.nonEmpty && streamed == batch)
  }
}
