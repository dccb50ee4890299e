package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc scale probe: times one operator CONFIGURATION (not a
  * SparkEntry query — those pin oracle-replayable parameters) against
  * SPARK_GRAFT_SF_DIR. Used for production-default measurements the
  * bench's pinned forms can't exercise, e.g. semanticDedup with its
  * N/256 cell default vs the oracle's fixed 16 cells.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.ScaleProbe <name>
  */
object ScaleProbe {

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("semantic_dedup_default")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val probes: Map[String, () => Unit] = Map(
      "semantic_dedup_default" -> { () =>
        operators.Similarity
          .semanticDedup(spark.read.parquet(s"$sfDir/embeddings.parquet"))
          .write.format("noop").mode("overwrite").save()
      },
      "dup_spans_w16" -> { () =>
        operators.Dedup
          .dupSpans(spark.read.parquet(s"$sfDir/documents.parquet"), window = 16)
          .write.format("noop").mode("overwrite").save()
      },
    )
    val t0 = System.nanoTime()
    probes(name)()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"probe":"$name","value":$sec%.2f,"unit":"sec","sf":"$sfDir"}""")
    spark.stop()
  }
}
