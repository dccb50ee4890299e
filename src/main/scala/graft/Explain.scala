package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val qs = if (args.nonEmpty) args.toSeq else Seq("q1_agg", "q5_join", "time_bars", "volume_bars", "returns_24h", "triple_barrier", "ann_topk", "sessionize", "pack_sequences", "train_split", "stratified_sample", "profile", "group_quantiles", "cusum_events", "trend_labels", "sadf", "ffd_min_d", "corwin_schultz", "sign_entropy", "repetition_score", "decontaminate", "bm25_topk", "domain_mix", "lm_perplexity", "return_attribution")
    for (q <- qs) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
