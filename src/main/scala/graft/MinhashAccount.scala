package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured pair-growth account for [[graft.operators.Dedup.minhashLsh]]
  * (r12 verdict: the sf1→sf10 wall-time step was 16.8× for 10× data
  * with no stage-level numbers behind the explanation). Counts every
  * stage of the LSH pipeline — documents, distinct-shingle-set
  * representatives, band-bucket candidate pairs, Jaccard-verified rep
  * pairs, and expanded output pairs — so the superlinear term can be
  * ATTRIBUTED: if output pairs grow ~C(k,2) in the duplicate-cluster
  * size k (ScaleGen mutates ~100 copies per base doc, so 10× docs ≈
  * 10× copies per cluster ≈ up to 100× intra-cluster pairs), the wall
  * time is output-bound, not a plan defect.
  *
  * Usage: runMain graft.MinhashAccount <sfDir> [<sfDir> ...]
  * Prints one JSON line per dir.
  */
object MinhashAccount {

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- dirs) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val shingled = docs.select(
        col("doc_id").as("id"),
        graft.functions.TextExprs
          .shingleHashes(operators.TextAnalysis.normText(col("text")), 5)
          .as("hsl"),
      )
      val st = operators.Dedup.lshStages(
        shingled, nHashes = 16, bands = 4, threshold = 0.5, maxBucket = 4096)
      // SPARK_GRAFT_MINHASH_CAND_ONLY=1 stops after the candidate
      // count: at family-quadratic densities (sf100 synthetic) the
      // verify/expand stages need TBs of array-join traffic, but the
      // candidate count itself is a skinny-row distinct — measurable
      // one decade past where the full operator fits the box
      val candOnly = sys.env.get("SPARK_GRAFT_MINHASH_CAND_ONLY").contains("1")
      val t0 = System.nanoTime()
      val nDocs = docs.count()
      val nReps = st.reps.count()
      val nCand = st.cand.count()
      val nRepPairs = if (candOnly) -1L else st.repPairs.count()
      val nOut = if (candOnly) -1L else st.pairs.count()
      // cluster-size histogram head: the C(k,2) term's drivers
      val topClusters = st.members
        .groupBy(col("rid")).agg(count(lit(1)).as("k"))
        .orderBy(col("k").desc).limit(5)
        .collect().map(_.getLong(1)).mkString("[", ",", "]")
      val sec = (System.nanoTime() - t0) / 1e9
      println(
        s"""{"dir":"$dir","docs":$nDocs,"reps":$nReps,"cand_pairs":$nCand,""" +
          s""""rep_pairs":$nRepPairs,"out_pairs":$nOut,"top_cluster_k":$topClusters,""" +
          s""""count_sec":${math.round(sec * 100) / 100.0}}"""
      )
    }
    spark.stop()
  }
}
