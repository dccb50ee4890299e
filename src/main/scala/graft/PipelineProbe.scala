package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Composed-pipeline decade probe (r16 verdict #4): every operator
  * family has per-operator decade evidence, but a production run
  * CHAINS them under one JVM — checkpoint gates, AQE, store formats
  * and scratch churn interacting. This probe runs the two production
  * chains end-to-end with parquet hand-offs between stages (the
  * store-format boundary a real pipeline has), one JSON line per
  * stage with wall seconds and output rows.
  *
  *  - `docs <docsDir> [eventsDir]`: tick-feed QC gate (events) →
  *    MinHash-LSH near-dup pairs → connected-component clusters /
  *    canonical keepers → trained quality-classifier scores over the
  *    keepers → pack_sequences over the scored keepers.
  *  - `emb <embDir>`: buildIndex on half the corpus (√N cells) →
  *    incremental semantic dedup of quarter 2 against the store →
  *    append quarter 2 → incremental dedup of quarter 3 (now against
  *    history INCLUDING the first increment) → append quarter 3 —
  *    the build→append→dedup chain ITERATED, which is what an
  *    ingest loop actually runs.
  *
  * Usage: runMain graft.PipelineProbe <docs|emb> <dir> [eventsDir]
  */
object PipelineProbe {

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val dir = args(1)
    val eventsDir = if (args.length > 2) Some(args(2)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed JIT/codegen warmup (same intent as Bench's preamble)
    spark.range(0, 4000000, 1, 32)
      .selectExpr("id % 97 AS k", "cast(id AS double) AS v")
      .groupBy("k").agg(avg("v"), sum("v"))
      .write.format("noop").mode("overwrite").save()

    val scratch = java.nio.file.Files.createTempDirectory("graft-pipe").toString
    def f(v: Double): Double = math.round(v * 100) / 100.0
    def stage(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"""{"probe":"$mode","dir":"$dir","stage":"$name","sec":${f(sec)},"rows":$rows}""")
    }
    // write the stage output to the scratch store and return its row
    // count from the WRITTEN files — the next stage reads the store,
    // never this stage's in-memory plan
    def handoff(df: DataFrame, name: String): Long = {
      df.write.mode("overwrite").parquet(s"$scratch/$name")
      spark.read.parquet(s"$scratch/$name").count()
    }

    mode match {
      case "docs" =>
        eventsDir.foreach { ev =>
          stage("tick_qc_gate") {
            operators.TickQc.report(sources.TradeData.fromEvents(spark, ev)).count()
          }
        }
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        stage("minhash_pairs") {
          handoff(operators.Dedup.minhashLsh(docs, threshold = 0.5), "pairs")
        }
        stage("cc_clusters") {
          val pairs = spark.read.parquet(s"$scratch/pairs")
          handoff(operators.Dedup.clusters(docs, pairs), "clusters")
        }
        stage("quality_keepers") {
          val keepers = spark.read.parquet(s"$scratch/clusters").where(col("is_canonical") === 1)
          val kept = docs.join(keepers.select(col("doc_id")), "doc_id")
          handoff(
            operators.TextAnalysis.classifierScore(
              kept, weights = Some(operators.TextAnalysis.trainedQualityWeights)),
            "scored",
          )
        }
        stage("pack_sequences") {
          val scored = spark.read.parquet(s"$scratch/scored")
          val toPack = docs
            .join(scored.select(col("doc_id")), "doc_id")
            .withColumn("n_tokens", operators.TextAnalysis.tokenCountWs(col("text")))
          handoff(operators.Packing.packSequences(toPack, maxTokens = 2048L, nShards = 32).toDF(), "packed")
        }

      case "emb" =>
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        val store = s"$scratch/vidx"
        stage("build_half") {
          operators.VectorIndex.buildIndex(emb.where(col("vec_id") % 4 < 2), store, nCells = 0)
          spark.read.parquet(s"$store/vectors").count()
        }
        stage("incr_dedup_q2") {
          handoff(
            operators.VectorIndex
              .incrementalSemanticDedup(spark, store, emb.where(col("vec_id") % 4 === 2), threshold = 0.3),
            "dedup_q2",
          )
        }
        stage("append_q2") {
          operators.VectorIndex.appendIndex(spark, store, emb.where(col("vec_id") % 4 === 2))
          spark.read.parquet(s"$store/vectors").count()
        }
        stage("incr_dedup_q3") {
          handoff(
            operators.VectorIndex
              .incrementalSemanticDedup(spark, store, emb.where(col("vec_id") % 4 === 3), threshold = 0.3),
            "dedup_q3",
          )
        }
        stage("append_q3") {
          operators.VectorIndex.appendIndex(spark, store, emb.where(col("vec_id") % 4 === 3))
          spark.read.parquet(s"$store/vectors").count()
        }

      case other => throw new IllegalArgumentException(s"mode $other (docs|emb)")
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
