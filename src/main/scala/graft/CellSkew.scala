package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cell-census probe for the semantic-dedup production shape: cell
  * count, size percentiles, and Σ|cell|² — the term that SETS the
  * scoring stage's compute (Σ|cell|²/2 pairs × dim multiplies) and
  * its straggler profile (a hot cell is single-threaded by
  * construction). At fd sf100 / kmeansIters=0 the seed-Voronoi cells
  * measure p50=90, p99=3495, max=4993, Σ|cell|²=4.1e9 (≈8× the
  * balanced-cell value) — the honest account behind §6z's scoring
  * constant; k-means rounds or maintainIndex splits are the balance
  * lever, at the cost of oracle replayability.
  *
  * Usage: runMain graft.CellSkew <sfDir>
  */
object CellSkew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
    val out = operators.Similarity.semanticDedup(emb, threshold = 0.3, kmeansIters = 0)
    val sizes = out.groupBy("cell").count()
    sizes.agg(
      count(lit(1)).as("cells"),
      sum(col("count")).as("n"),
      max(col("count")).as("max_cell"),
      expr("percentile(count, 0.5)").as("p50"),
      expr("percentile(count, 0.99)").as("p99"),
      sum(col("count") * col("count")).as("sum_sq"),
    ).show(false)
    spark.stop()
  }
}
