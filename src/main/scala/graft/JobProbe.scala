package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler._

/** Scratch diagnostic main: per-job wall/task breakdown for one
  * operator (edit the body while tuning; not part of the contract
  * surface). Currently wired to the incremental-dedup store build.
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
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
    // warm the execution classes on an unrelated shape
    spark.range(0, 1000000, 1, 32).selectExpr("id % 97 AS k").groupBy("k").count()
      .write.format("noop").mode("overwrite").save()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def timed[A](label: String)(f: => A): A = {
      println(s"=== $label ===")
      val t0 = System.nanoTime()
      val r = f
      println(f"TOTAL $label ${(System.nanoTime() - t0) / 1e9}%6.3f s")
      r
    }
    val store = java.nio.file.Files.createTempDirectory("graft-probe-store").toString
    timed("buildStore") {
      operators.IncrementalDedup.buildStore(docs.where(col("doc_id") % 4 =!= 3), store)
    }
    timed("incrementalPairs") {
      operators.IncrementalDedup
        .incrementalPairs(spark, store, docs.where(col("doc_id") % 4 === 3), threshold = 0.5)
        .orderBy(col("id_a"), col("id_b"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
