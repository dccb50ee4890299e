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
        import org.apache.spark.sql.functions._
        val out = operators.Similarity
          .semanticDedup(spark.read.parquet(s"$sfDir/embeddings.parquet"))
          .cache()
        out.write.format("noop").mode("overwrite").save()
        // the scale claim is "in-cell pairs ~ N*256/2 at any N" — log
        // the actual bound Σ|cell|·(|cell|−1)/2 so the docstring's
        // linearity is a measured number, not an assertion
        val row = out
          .groupBy(col("cell")).agg(count(lit(1)).as("c"))
          .agg(
            sum(col("c")).as("n"),
            count(lit(1)).as("cells"),
            expr("sum(c * (c - 1) div 2)").as("pair_bound"),
            max(col("c")).as("max_cell"),
          )
          .head()
        println(
          s"""{"probe_detail":"semantic_dedup_default","n":${row.getLong(0)},""" +
            s""""cells":${row.getLong(1)},"pair_bound":${row.getLong(2)},""" +
            s""""max_cell":${row.getLong(3)}}"""
        )
        out.unpersist()
      },
      "embed_dedup_default" -> { () =>
        // production default: autoLshParams scales planes with
        // ceil(log2 n)+2, unlike the oracle-pinned (4,4,0) form whose
        // bucket population grows linearly in n
        operators.Similarity
          .cosinePairs(spark.read.parquet(s"$sfDir/embeddings.parquet"), threshold = 0.3)
          .write.format("noop").mode("overwrite").save()
      },
      "minhash_diag" -> { () =>
        import org.apache.spark.sql.functions._
        import graft.operators.Dedup
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val base = docs.select(
          col("doc_id").as("id"),
          graft.functions.TextExprs
            .shingleHashes(graft.operators.TextAnalysis.normText(col("text")), 5).as("hsl"),
        ).cache()
        val nDocs = base.count()
        val reps = base.groupBy(col("hsl")).agg(min(col("id")).as("id"), count(lit(1)).as("k")).cache()
        val nReps = reps.count()
        val maxCluster = reps.agg(max("k")).head().getLong(0)
        val sig = reps.select(
          col("id"),
          graft.functions.TextExprs.minhashSig(
            col("hsl"), 16, Dedup.MinhashP,
            (0 until 16).map(Dedup.minhashA), (0 until 16).map(Dedup.minhashB)).as("sig"),
        )
        val buckets = sig
          .select(col("id"), explode(Dedup.bandHashes(col("sig"), 16, 4)).as("band"))
          .groupBy("band").agg(count(lit(1)).as("s"))
          .agg(
            expr("sum(s * (s - 1) div 2)").as("cand_bound"),
            max(col("s")).as("max_bucket"),
            count(lit(1)).as("n_buckets"),
          ).head()
        val cappedBound = sig
          .select(col("id"), explode(Dedup.bandHashes(col("sig"), 16, 4)).as("band"))
          .groupBy("band").agg(count(lit(1)).as("s"))
          .where(col("s") <= 4096)
          .agg(expr("sum(s * (s - 1) div 2)")).head().getLong(0)
        val nOut = Dedup.minhashLsh(spark.read.parquet(s"$sfDir/documents.parquet"), threshold = 0.5).count()
        println(
          s"""{"probe_detail":"minhash_diag","docs":$nDocs,"reps":$nReps,""" +
            s""""max_cluster":$maxCluster,"cand_bound":${buckets.getLong(0)},""" +
            s""""capped_cand_bound":$cappedBound,"out_pairs":$nOut,""" +
            s""""max_bucket":${buckets.getLong(1)},"n_buckets":${buckets.getLong(2)}}"""
        )
        base.unpersist(); reps.unpersist()
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
