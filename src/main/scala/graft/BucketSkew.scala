package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object BucketSkew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
    val n = emb.count()
    val (t, p, pb) = operators.Similarity.autoLshParams(n)
    println(s"n=$n tables=$t planes=$p probeBits=$pb")
    val d = emb.select(size(col("embedding"))).head().getInt(0)
    val bk = emb.select(col("vec_id").as("id"),
      posexplode(operators.Similarity.lshBuckets(col("embedding"), t, p, d)).as(Seq("tbl", "bucket")))
    val sizes = bk.groupBy("tbl", "bucket").count()
    sizes.orderBy(desc("count")).show(12)
    sizes.selectExpr("sum(count*count) as raw_pair_mass", "count(*) as n_buckets", "max(count) as max_bucket").show()
    spark.stop()
  }
}
