package graft
import org.apache.spark.sql.SparkSession
object DebugPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
    val st = operators.Similarity.cosineStages(emb, threshold = 0.3)
    println(st.pairs.queryExecution.executedPlan.treeString.take(8000))
    spark.stop()
  }
}
