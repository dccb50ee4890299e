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
    // SPARK_GRAFT_EXPLAIN_MODE=formatted switches to FormattedMode —
    // the shape the r17 plan artifacts (plans/r17/*.txt) are dumped in
    val mode: org.apache.spark.sql.execution.ExplainMode =
      sys.env.get("SPARK_GRAFT_EXPLAIN_MODE") match {
        case Some("formatted") => org.apache.spark.sql.execution.FormattedMode
        case _ => org.apache.spark.sql.execution.SimpleMode
      }
    for (q <- qs) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.explainString(mode))
    }
    spark.stop()
  }
}
