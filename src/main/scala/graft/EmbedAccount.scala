package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured pair-growth account for
  * [[graft.operators.Similarity.cosinePairs]] (r14 verdict #3: the
  * embedding family had no third-decade evidence). Counts every stage
  * of the cosine-LSH pipeline — vectors, bucket entries, raw
  * candidate join rows, distinct candidate pairs, and verified output
  * pairs — so a superlinear decade step can be ATTRIBUTED to a stage
  * (candidate background vs verified mass vs shuffle granularity)
  * instead of estimated. The fixed-density corpora plant
  * srcRows × C(familySize, 2) expected near-dup pairs at EVERY
  * decade, so a flat out_pairs row is the fixed-density signature.
  *
  * Usage: runMain graft.EmbedAccount <sfDir> [<sfDir> ...]
  * Prints one JSON line per dir.
  * SPARK_GRAFT_EMBED_CAND_ONLY=1 stops after the candidate counts.
  */
object EmbedAccount {

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val candOnly = sys.env.get("SPARK_GRAFT_EMBED_CAND_ONLY").contains("1")
    for (dir <- dirs) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val st = operators.Similarity.cosineStages(emb, threshold = 0.3)
      val t0 = System.nanoTime()
      val nVec = emb.count()
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      val nBuckets = st.buckets.count()
      val nCandRows = st.cand.count()
      val nCandPairs = st.cand
        .select(col("a.id").as("ia"), col("b.id").as("ib")).distinct().count()
      val nOut = if (candOnly) -1L else st.pairs.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(
        s"""{"dir":"$dir","vectors":$nVec,"dim":$dim,"bucket_rows":$nBuckets,""" +
          s""""cand_rows":$nCandRows,"cand_pairs":$nCandPairs,"out_pairs":$nOut,""" +
          s""""sec":${math.round(sec * 100) / 100.0}}""")
    }
    spark.stop()
  }
}
