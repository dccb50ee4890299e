package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming-twin throughput probe (r16 verdict #7): every streaming
  * twin is bit-equality-pinned against its batch form, but none had a
  * measured rows/sec or state-size datum — and at 100 TB the ingest
  * path is the front door. This probe drives the three heaviest
  * twins with a FILE-SOURCE stream (parquet input split into
  * `nFiles`, `maxFilesPerTrigger` per micro-batch — the
  * backlog-drain shape `Trigger.AvailableNow` serves in production)
  * and reports one JSON line: input rows, wall seconds, rows/sec,
  * micro-batches, and the max stateful-operator row count across the
  * run (from StreamingQueryProgress — the state-vs-watermark datum).
  *
  * Usage: runMain graft.StreamingBench <sfDir> <bars|minhash|vidx>
  *          [maxFilesPerTrigger=4] [nFiles=32]
  */
object StreamingBench {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mode = args(1)
    val perTrigger = if (args.length > 2) args(2).toInt else 4
    val nFiles = if (args.length > 3) args(3).toInt else 32
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed JIT/codegen warmup
    spark.range(0, 4000000, 1, 32)
      .selectExpr("id % 97 AS k", "cast(id AS double) AS v")
      .groupBy("k").agg(avg("v"), sum("v"))
      .write.format("noop").mode("overwrite").save()

    val scratch = java.nio.file.Files.createTempDirectory("graft-sbench").toString
    val ckpt = s"$scratch/ckpt"
    def f(v: Double): Double = math.round(v * 100) / 100.0

    def run(
        name: String,
        inputRows: Long,
        start: () => org.apache.spark.sql.streaming.StreamingQuery,
    ): Unit = {
      val t0 = System.nanoTime()
      val q = start()
      q.awaitTermination()
      val sec = (System.nanoTime() - t0) / 1e9
      val progresses = q.recentProgress.toSeq
      val maxState =
        progresses.flatMap(_.stateOperators.map(_.numRowsTotal)).foldLeft(0L)(math.max)
      val batches = progresses.count(_.numInputRows > 0)
      println(
        s"""{"probe":"$name","dir":"$dir","input_rows":$inputRows,"sec":${f(sec)},""" +
          s""""rows_per_sec":${f(inputRows / sec)},"micro_batches":$batches,""" +
          s""""max_state_rows":$maxState,"files_per_trigger":$perTrigger}""")
    }

    mode match {
      case "bars" =>
        // stateful tick bars over the full tick feed
        val trades = sources.TradeData.fromEvents(spark, dir)
        val in = s"$scratch/trades"
        trades.repartition(nFiles).write.mode("overwrite").parquet(in)
        val rows = spark.read.parquet(in).count()
        val stream = spark.readStream
          .schema(trades.schema)
          .option("maxFilesPerTrigger", perTrigger)
          .parquet(in)
        run("streaming_tick_bars", rows, () =>
          streaming.StatefulBars
            .tickBars(stream, barSize = 100)
            .writeStream
            .outputMode("append")
            .format("noop")
            .option("checkpointLocation", s"$ckpt/bars")
            .trigger(Trigger.AvailableNow())
            .start())

      case "minhash" =>
        // watermark-windowed near-dup pairs; ts synthesized from
        // doc_id so the corpus spans a realistic event-time axis
        val docs = spark.read
          .parquet(s"$dir/documents.parquet")
          .withColumn("ts", timestamp_seconds(col("doc_id") % 86400L))
        val in = s"$scratch/docs"
        docs.repartition(nFiles).write.mode("overwrite").parquet(in)
        val rows = spark.read.parquet(in).count()
        val stream = spark.readStream
          .schema(docs.schema)
          .option("maxFilesPerTrigger", perTrigger)
          .parquet(in)
        run("streaming_minhash", rows, () =>
          streaming.StreamingMinhash
            .pairsWithinWatermark(stream, "ts", watermark = "1 hour", threshold = 0.5)
            .writeStream
            .outputMode("append")
            .format("noop")
            .option("checkpointLocation", s"$ckpt/minhash")
            .trigger(Trigger.AvailableNow())
            .start())

      case "vidx" =>
        // exactly-once store ingest: freeze the index on 3/4 of the
        // corpus, stream the last quarter through appendIdempotent
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        val store = s"$scratch/vidx"
        operators.VectorIndex.buildIndex(emb.where(col("vec_id") % 4 =!= 3), store, nCells = 0)
        val batch = emb.where(col("vec_id") % 4 === 3)
        val in = s"$scratch/emb"
        batch.repartition(nFiles).write.mode("overwrite").parquet(in)
        val rows = spark.read.parquet(in).count()
        val stream = spark.readStream
          .schema(batch.schema)
          .option("maxFilesPerTrigger", perTrigger)
          .parquet(in)
        run("streaming_vidx_ingest", rows, () =>
          streaming.StreamingVectorIndex
            .ingest(spark, store, stream, s"$ckpt/vidx")
            .start())

      case other => throw new IllegalArgumentException(s"mode $other (bars|minhash|vidx)")
    }
    try {
      java.nio.file.Files
        .walk(java.nio.file.Paths.get(scratch))
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    } catch { case _: Exception => () }
    spark.stop()
  }
}
