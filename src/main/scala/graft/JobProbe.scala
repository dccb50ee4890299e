package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
object JobProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new scala.collection.concurrent.TrieMap[Int, (Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs(js.jobId) = (System.nanoTime(), js.stageInfos.map(_.numTasks).sum)
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, nt) = jobs(je.jobId)
        println(f"JOB ${je.jobId}%3d  ${(System.nanoTime()-t0)/1e9}%6.3f s  tasks=$nt")
      }
    })
    spark.range(0, 1000000, 1, 32).selectExpr("id % 97 AS k").groupBy("k").count()
      .write.format("noop").mode("overwrite").save()
    val c = graft.api.TradingCols(ts = "ts_event")
    val t = spark.read.parquet("/tmp/graft_refbench/s1000000c5u/trades.parquet")
    // warm
    graft.operators.Labels.dailyVol(t, span = 100, c = c).write.format("noop").mode("overwrite").save()
    println("=== timed daily_vol ===")
    val t0 = System.nanoTime()
    graft.operators.Labels.dailyVol(t, span = 100, c = c).write.format("noop").mode("overwrite").save()
    println(f"TOTAL ${(System.nanoTime()-t0)/1e9}%6.3f s")
    spark.stop()
  }
}
