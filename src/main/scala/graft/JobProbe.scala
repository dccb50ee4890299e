package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic main (edit the body while tuning; not part of
  * the contract surface). Currently: the incremental-vs-one-shot
  * scale probe for VectorIndex — build a frozen index on 90% of a
  * corpus, then compare deduping the remaining 10% incrementally
  * against re-running the one-shot over the union (SURVEY §6j).
  *
  * Usage: runMain graft.JobProbe <embeddingsParquet> [nCells]
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/tmp/graft_sf1/embeddings.parquet")
    val nCellsArg = if (args.length > 1) args(1).toInt else 0
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TOTAL $label ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    val emb = spark.read.parquet(src)
    val n = emb.count()
    val splitId = emb.selectExpr("percentile_approx(vec_id, 0.9, 10000) AS s").head().getLong(0)
    // same cell count for one-shot and store (the semanticDedup
    // N/256 policy), so the comparison isolates incremental-vs-redo
    val nCells = if (nCellsArg > 0) nCellsArg else math.max(16, (n / 256L).toInt)
    println(s"corpus $n vectors, split at id $splitId, $nCells cells")
    // warm the execution classes once so timings compare plans, not JIT
    graft.operators.Similarity
      .semanticDedup(emb.limit(2000), threshold = 0.3, nCells = 16, kmeansIters = 0)
      .write.format("noop").mode("overwrite").save()

    timed("one-shot semanticDedup (full union)") {
      graft.operators.Similarity
        .semanticDedup(emb, threshold = 0.3, nCells = nCells, kmeansIters = 0)
        .write.format("noop").mode("overwrite").save()
    }
    val store = java.nio.file.Files.createTempDirectory("graft-vidx-probe").toString
    timed("buildIndex (90% history, one-time)") {
      graft.operators.VectorIndex
        .buildIndex(emb.where(col("vec_id") <= splitId), store, nCells = nCells, kmeansIters = 0)
    }
    timed("incrementalSemanticDedup (10% batch)") {
      graft.operators.VectorIndex
        .incrementalSemanticDedup(spark, store, emb.where(col("vec_id") > splitId), threshold = 0.3)
        .write.format("noop").mode("overwrite").save()
    }
    timed("incrementalTopK (10 queries, nProbe=4)") {
      graft.operators.VectorIndex
        .incrementalTopK(spark, store, emb.where(col("vec_id") > splitId), nQueries = 10, k = 10, nProbe = 4)
        .write.format("noop").mode("overwrite").save()
    }
    timed("appendIndex (10% batch ingest)") {
      graft.operators.VectorIndex
        .appendIndex(spark, store, emb.where(col("vec_id") > splitId))
    }
    spark.stop()
  }
}
