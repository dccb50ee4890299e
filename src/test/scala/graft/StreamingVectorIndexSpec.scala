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

  test("ingestWithMaintenance: drifted stream trips the split mid-stream; store stays exact") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val store = temp("m")
    VectorIndex.buildIndex(emb.where(col("vec_id") < split), store, nCells = 16, kmeansIters = 0)
    val nCells0 = spark.read.parquet(s"$store/centroids").count()
    // drifted ingest: 200 vectors jittered around ONE direction — they
    // pile into a single cell (≈200 ≫ 4 × mean ≈ 17), the §6l failure
    // mode the maintenance policy exists to catch
    val dim = 64
    val base = Array.tabulate(dim)(i => if (i < 8) 1.0f else 0.05f)
    def jit(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      base.map(x => x + 0.02f * r.nextGaussian().toFloat)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType))))
    val drift = spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(
          (0 until 200).map(i => Row(1000L + i, jit(i).toSeq))).asJava),
      schema,
    )
    val src = temp("msrc")
    // several source files so AvailableNow forms multiple micro-batches
    drift.repartition(4).write.mode("overwrite").parquet(src)
    var maintained = 0
    val q = StreamingVectorIndex
      .ingestWithMaintenance(
        spark, store,
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src),
        temp("mckpt"),
        splitFactor = 4.0,
        onMaintain = r => maintained += r.count().toInt,
      )
      .start()
    q.awaitTermination()
    assert(maintained > 0, "maintenance never fired on a drifted stream")
    val cents = spark.read.parquet(s"$store/centroids")
    assert(cents.count() > nCells0, "split should add centroids")
    // store exactness across mid-stream maintenance: every id exactly
    // once (exercises the empty-parent partition drop under
    // streaming), totals right, every stored cell present in the
    // centroid table
    val stored = spark.read.parquet(s"$store/vectors")
      .select(col("id"), col("cell").cast("long").as("cell"), col("nv"))
    assert(stored.count() == split + 200)
    assert(stored.groupBy("id").count().where(col("count") > 1).count() == 0, "duplicate ids")
    assert(
      stored.join(cents, stored("cell") === cents("cent_id"), "left_anti").count() == 0,
      "stored cell missing from centroid table",
    )
    // probe exactness at any cell layout: an exhaustive probe
    // (nProbe >= cells) over the maintained store IS brute force
    val nCells = cents.count().toInt
    val queries = emb.where(col("vec_id") >= split && col("vec_id") < split + 5)
    val ivf = VectorIndex
      .incrementalTopK(spark, store, queries, nQueries = 5, k = 5, nProbe = nCells)
      .orderBy(col("query_id"), col("rnk"))
      .collect().toSeq.map(_.toSeq)
    val qnv = VectorIndex.normalized(queries, "vec_id", "embedding")
      .select(col("id").as("query_id"), col("nv").as("qv"))
    val corpus = stored.select(col("id"), col("nv"))
      .unionByName(VectorIndex.normalized(queries, "vec_id", "embedding").select(col("id"), col("nv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    val brute = corpus.join(qnv, col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        graft.functions.VectorExprs.dotNative(col("qv"), col("nv")).as("score"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("score"))
      .orderBy(col("query_id"), col("rnk"))
      .collect().toSeq.map(_.toSeq)
    assert(ivf.nonEmpty && ivf == brute, "exhaustive probe != brute force after maintenance")
  }

  test("replayed micro-batch is exactly-once: same batch through the sink path twice == once") {
    val store = temp("replay")
    VectorIndex.buildIndex(emb.where(col("vec_id") < split), store, nCells = 16, kmeansIters = 0)
    val batch = emb.where(col("vec_id") >= split)
    def stored() = spark.read
      .parquet(s"$store/vectors")
      .select(col("id"), col("cell").cast("long").as("cell"), col("nv"))
      .orderBy("id")
      .collect().toSeq.map(_.toSeq)
    // the sink-path append, exactly as ingest()'s foreachBatch invokes it
    VectorIndex.appendIndexIdempotent(spark, store, batch, batchId = 7L)
    val once = stored()
    assert(once.size == emb.count(), "first apply incomplete")
    // at-least-once replay: checkpoint commit lost, batch re-executed
    VectorIndex.appendIndexIdempotent(spark, store, batch, batchId = 7L)
    assert(stored() == once, "replayed batch changed the store")
    // a DIFFERENT batch id still appends (idempotence is per-batch)
    VectorIndex.appendIndexIdempotent(
      spark, store, batch.withColumn("vec_id", col("vec_id") + lit(100000L)), batchId = 8L)
    assert(stored().size == once.size + batch.count(), "next batch blocked")
  }

  test("mid-promote crash replay converges to exactly-once") {
    import org.apache.hadoop.fs.Path
    val store = temp("crash")
    VectorIndex.buildIndex(emb.where(col("vec_id") < split), store, nCells = 16, kmeansIters = 0)
    val batch = emb.where(col("vec_id") >= split)
    def stored() = spark.read
      .parquet(s"$store/vectors")
      .select(col("id"), col("cell").cast("long").as("cell"), col("nv"))
      .orderBy("id")
      .collect().toSeq.map(_.toSeq)
    VectorIndex.appendIndexIdempotent(spark, store, batch, batchId = 3L)
    val once = stored()
    // simulate a crash AFTER the promote but BEFORE the commit marker:
    // the batch's files are in the store, the inflight marker is up,
    // the commit marker is gone — the worst-case replay window
    val root = new Path(store)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.delete(new Path(root, "_ingest_commits/batch-3"), false), "commit marker missing")
    fs.create(new Path(root, "_ingest_commits/batch-3.inflight"), true).close()
    // a blind append here would double every batch-3 vector
    VectorIndex.appendIndexIdempotent(spark, store, batch, batchId = 3L)
    assert(stored() == once, "crash replay duplicated or lost batch rows")
    assert(!fs.exists(new Path(root, "_ingest_commits/batch-3.inflight")), "inflight not cleaned")
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
