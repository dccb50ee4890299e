package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document corpus I/O: JSONL ingest and the training-shard sink that
  * closes the pipeline loop (ingest → clean → dedup → split → pack →
  * WRITE SHARDS).
  */
object DocStore {

  /** The canonical corpus schema (matches documents.parquet). An
    * explicit schema keeps JSONL ingest single-pass: without one,
    * spark.read.json runs a whole extra scan just to infer types —
    * at 100 TB that is the difference between one pass and two.
    */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
  ))

  /** JSONL (one JSON object per line) → corpus frame. Corrupt lines
    * land in `_corrupt_record` (PERMISSIVE) instead of failing the
    * ingest; callers split them off for quarantine.
    */
  def fromJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(docSchema.add("_corrupt_record", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Writes packed training shards: one directory per (split, shard),
    * files sorted by (seq_idx, doc_id) within each shard so a trainer
    * streams sequences in order without a sort of its own. `packed`
    * is Packing.packSequences output joined back to the docs plus a
    * `split` column from Sampling.hashSplit.
    *
    * Partition pruning reaches the file listing (a trainer reading
    * split=train/shard=17 touches exactly one directory), and the
    * repartition keys match the partitionBy keys so each output
    * directory is written by one task — no small-file explosion.
    */
  def writeShards(packed: DataFrame, path: String): Unit =
    packed
      .repartition(col("split"), col("shard"))
      .sortWithinPartitions(col("split"), col("shard"), col("seq_idx"), col("doc_id"))
      .write
      .mode("overwrite")
      .partitionBy("split", "shard")
      .parquet(path)

  /** Reads shards back; split/shard filters prune at the listing. */
  def readShards(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
