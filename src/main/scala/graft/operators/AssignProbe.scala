package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-decomposition of buildIndex's `assign_write` stage (the
  * dominant term of the r17 sf100 build stage table: 180 s of 268).
  * Times, on the same corpus and centroid table, each cumulative
  * slice: read+assign dots (noop), + the cell repartition (noop),
  * + the partitioned store write. The deltas attribute the stage to
  * compute vs shuffle vs parquet encode/file commit.
  *
  * Usage: runMain graft.operators.AssignProbe <sfDir> [nCells=0 (√N)]
  * (declared in graft.operators for private[operators] access).
  */
object AssignProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nCellsArg = if (args.length > 1) args(1).toInt else 0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(0, 4000000, 1, 32)
      .selectExpr("id % 97 AS k", "cast(id AS double) AS v")
      .groupBy("k").agg(avg("v"), sum("v"))
      .write.format("noop").mode("overwrite").save()

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .where(col("vec_id") % 4 < 3) // EmbedProbe's build slice
    val scratch = java.nio.file.Files.createTempDirectory("graft-assignprobe").toString
    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"""{"stage":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    }
    val nv = VectorIndex.normalized(emb, "vec_id", "embedding")
    val cells =
      if (nCellsArg > 0) nCellsArg else VectorIndex.sqrtCellsFromStats(emb, "embedding")
    println(s"""{"cells":$cells}""")
    val cents = nv.orderBy(col("id")).limit(cells)
      .select(col("id").as("cent_id"), col("nv").as("cv"))
    val seedPath = s"$scratch/cents"
    cents.write.parquet(seedPath)
    val centsStored = spark.read.parquet(seedPath)

    timed("read_assign_noop") {
      Similarity.assignToCells(nv, centsStored)
        .write.format("noop").mode("overwrite").save()
    }
    // A/B the store write codec in BOTH orders (JIT/page-cache warmth
    // favors whichever runs later — the codec signal must beat that)
    for (round <- 1 to 2) {
      val order = if (round == 1) Seq("none", "snappy") else Seq("snappy", "none")
      for (codec <- order) {
        timed(s"write_${codec}_r$round") {
          Similarity.assignToCells(nv, centsStored)
            .repartition(col("cell"))
            .write.mode("overwrite").option("compression", codec)
            .partitionBy("cell").parquet(s"$scratch/vectors_$codec")
        }
      }
    }
    try {
      java.nio.file.Files
        .walk(java.nio.file.Paths.get(scratch))
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    } catch { case _: Exception => () }
    spark.stop()
  }
}
