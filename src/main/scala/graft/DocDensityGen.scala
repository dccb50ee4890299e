package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Document-DENSITY scale generator: N× the documents table with the
  * copies sharing CONTENT, not just volume — the axis [[ScaleGen]]
  * does not grow (its day-shifted copies change every table except
  * documents, whose texts stay distinct).
  *
  * Web corpora at 100 TB are duplicate-HEAVY: the same boilerplate
  * sentence on billions of pages, the same article mirrored across
  * thousands of hosts. That shape is what breaks dedup plans — a
  * hot gram/paragraph fingerprint whose every occurrence lands on one
  * task (window skew), or a candidate-pair structure quadratic in the
  * duplication factor. This generator builds exactly that worst case:
  *
  *  - ONE fixed boilerplate paragraph is prepended to EVERY output
  *    doc: each of its sliding grams occurs (copies × base) times
  *    globally — 500k at copies=100 on the sf0.1 base — the hot-gram
  *    probe for [[operators.Dedup.dupSpans]] and the hot-paragraph
  *    probe for [[operators.Dedup.dedupParagraphs]].
  *  - EVEN base ids keep their body byte-identical in every copy:
  *    exact-duplicate clusters of size `copies` (minhash/simhash/
  *    paragraph hot fingerprints, quadratic TRUE pair sets).
  *  - ODD base ids get a copy-distinct tail token: near-dup noise
  *    that keeps whole-doc fingerprints from collapsing.
  *
  * Copy i of a doc: doc_id shifted by i·(maxId+1); copy 0 keeps the
  * base ids. Only documents.parquet is written — the doc-pipeline
  * benches read nothing else.
  *
  * Usage: runMain graft.DocDensityGen <srcSfDir> <dstDir> [copies=10]
  */
object DocDensityGen {

  /** 15 tokens → every 8-token sliding gram is corpus-hot. */
  val boilerplate: String =
    "this document is provided under the standard terms and conditions of the corpus license agreement"

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val maxId = docs.agg(max("doc_id")).head().getLong(0) + 1
    val out = (0 until copies)
      .map { i =>
        docs
          .withColumn(
            "text",
            concat(
              lit(boilerplate + "\n\n"),
              col("text"),
              // parity of the BASE id (pre-shift): even = exact dup
              // body across all copies, odd = copy-distinct tail
              when(col("doc_id") % 2 === 1 && lit(i) > 0, lit(s" uniqtail$i")).otherwise(lit("")),
            ),
          )
          .withColumn("doc_id", col("doc_id") + lit(i.toLong * maxId))
          .withColumn("n_chars", length(col("text")))
      }
      .reduce(_ unionByName _)
    out
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    val n = spark.read.parquet(s"$dst/documents.parquet").count()
    println(s"""{"gen":"docdensity","copies":$copies,"rows":$n,"dst":"$dst"}""")
    spark.stop()
  }
}
