package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Similarity, VectorIndex}

/** Vector-index drift probe (round-12 task): measures
  * incrementalTopK recall@k and candidate-scan cost as drifted
  * batches append onto frozen centroids, then after
  * [[VectorIndex.maintainIndex]] re-splits the swollen cells.
  *
  * Drift model: batch b shifts every base vector by alpha_b = 0.5·b
  * along a fixed deterministic ±1 direction — the whole batch piles
  * into the few cells nearest the drift direction, the production
  * failure mode of train-once-add-forever IVF. Recall ground truth
  * is the exact brute-force cosine top-k over the same candidate set
  * the index query sees (stored ∪ probe batch, self excluded).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.VidxDrift"  → one JSON line per stage.
  */
object VidxDrift {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft-vidx-drift").toString

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").select(col("vec_id"), col("embedding"))
    val dim = emb.head().getSeq[Float](1).length
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    val drift = Similarity.planeWeights(1, dim, prefix = "drift")(0)

    def driftedBatch(b: Int): DataFrame = {
      val alpha = 0.5 * b
      emb.select(
        (col("vec_id") + lit((maxId + 1L) * b)).as("vec_id"),
        zip_with(
          col("embedding"),
          typedLit(drift.toSeq),
          (x, w) => x.cast("double") + lit(alpha) * w,
        ).as("embedding"),
      )
    }

    val nQ = 20
    val k = 10
    val nProbe0 = 4

    /** recall@k of the index result vs exact brute force over the
      * identical candidate universe, plus the probed-candidate count.
      */
    def measure(stage: String, batch: DataFrame, nProbe: Int = nProbe0): Unit = {
      val idx = VectorIndex
        .incrementalTopK(spark, dir, batch, nQueries = nQ, k = k, nProbe = nProbe)
        .select(col("query_id"), col("neighbor_id"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))

      val stored = spark.read
        .schema("id BIGINT, nv ARRAY<DOUBLE>, cell BIGINT")
        .parquet(s"$dir/vectors")
        .select(col("id"), col("nv"))
      val newNv = VectorIndex.normalized(batch, "vec_id", "embedding")
      val all = stored.unionByName(newNv)
      val q = newNv.orderBy(col("id")).limit(nQ).select(col("id").as("qid"), col("nv").as("qv"))
      val wR = Window.partitionBy(col("qid")).orderBy(col("s").desc, col("id"))
      val truth = all
        .join(broadcast(q), col("id") =!= col("qid"))
        .select(col("qid"), col("id"), Similarity.dotNorm(col("qv"), col("nv")).as("s"))
        .withColumn("r", row_number().over(wR))
        .where(col("r") <= k)
        .select(col("qid"), col("id"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))

      val truthBy = truth.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val idxBy = idx.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val recall = truthBy.map { case (qid, t) =>
        idxBy.getOrElse(qid, Set.empty).intersect(t).size.toDouble / t.size
      }.sum / truthBy.size

      // candidate cost: rows scanned = sizes of each query's probed cells
      val cents = spark.read.parquet(s"$dir/centroids").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      val sizes = spark.read
        .schema("id BIGINT, nv ARRAY<DOUBLE>, cell BIGINT")
        .parquet(s"$dir/vectors")
        .groupBy(col("cell")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val qv = q.collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      val avgCand = qv.map { case (_, v) =>
        cents
          .map { case (cid, cv) => (cid, cv.zip(v).map { case (a, b) => a * b }.sum) }
          .sortBy { case (cid, s) => (-s, cid) }
          .take(nProbe)
          .map { case (cid, _) => sizes.getOrElse(cid, 0L) }
          .sum
      }.sum.toDouble / qv.length
      val maxCell = if (sizes.isEmpty) 0L else sizes.values.max
      println(
        s"""{"stage":"$stage","cells":${sizes.size},"max_cell":$maxCell,""" +
          s""""avg_candidates":${math.round(avgCand * 10) / 10.0},""" +
          s""""recall_at_$k":${math.round(recall * 1000) / 1000.0}}"""
      )
    }

    VectorIndex.buildIndex(emb, dir, nCells = 0, kmeansIters = 2)
    measure("base", driftedBatch(1))
    (1 to 4).foreach { b =>
      VectorIndex.appendIndex(spark, dir, driftedBatch(b))
      measure(s"after_append_$b", driftedBatch(b + 1))
    }
    val report = VectorIndex.maintainIndex(spark, dir, splitFactor = 2.0, kmeansIters = 2)
    val nSplit = report.count()
    println(s"""{"stage":"maintain","cells_split":$nSplit}""")
    measure("after_maintain", driftedBatch(5))
    // finer cells let a larger nProbe buy recall back at a fraction
    // of the pre-maintenance scan cost
    measure("after_maintain_probe8", driftedBatch(5), nProbe = 8)
    measure("after_maintain_probe16", driftedBatch(5), nProbe = 16)
    spark.stop()
  }
}
