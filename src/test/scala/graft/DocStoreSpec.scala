package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Packing, Sampling}
import graft.sources.DocStore

class DocStoreSpec extends SparkSpec {
  import spark.implicits._

  test("JSONL ingest: valid lines parse, corrupt lines quarantine, single-pass schema") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    val lines = Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11}""",
      """{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "web", "n_chars": 7}""",
      """not json at all""",
    )
    Files.write(java.nio.file.Paths.get(dir, "part0.jsonl"),
      String.join("\n", lines: _*).getBytes)
    // Spark disallows filtering raw JSON on only _corrupt_record;
    // materialize first (the quarantine pass any real ingest does)
    val docs = DocStore.fromJsonl(spark, dir).cache()
    docs.count()
    assert(docs.where(col("_corrupt_record").isNull).count() == 2)
    assert(docs.where(col("_corrupt_record").isNotNull).count() == 1)
    assert(docs.where(col("doc_id") === 1L).head().getAs[String]("text") == "hello world")
  }

  test("training shards: pruned layout, in-order sequences on read-back") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("n_tokens", graft.operators.TextAnalysis.tokenCountWs(col("text")))
    val packed = Packing.packSequences(docs, maxTokens = 400L, nShards = 4).toDF()
    val withSplit = packed.join(
      Sampling.hashSplit(docs.select("doc_id"), "doc_id",
        Seq("train" -> 0.9, "val" -> 0.1)),
      "doc_id",
    )
    val out = Files.createTempDirectory("graft-shards").toString
    DocStore.writeShards(withSplit, out)

    // partition pruning reaches the listing
    val one = DocStore.readShards(spark, out)
      .where(col("split") === "train" && col("shard") === 1)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("split"), plan)

    // read-back preserves (seq_idx, doc_id) order within each shard file
    val rows = one.select("seq_idx", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty && rows.sameElements(rows.sortBy(identity)))

    // round trip loses nothing
    assert(DocStore.readShards(spark, out).count() == withSplit.count())
  }
}
