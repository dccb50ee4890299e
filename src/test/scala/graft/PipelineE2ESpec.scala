package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.DocStore

/** The whole training-data pipeline composed end to end:
  * JSONL ingest → clean/mask → exact+near dedup → cluster →
  * keep canonicals → quality gate → split → pack → write shards →
  * read back. One spec proving the operators compose — column
  * contracts line up and every stage's output feeds the next.
  */
class PipelineE2ESpec extends SparkSpec {

  test("ingest → clean → dedup → split → pack → shards round trip") {
    // corpus: real docs + planted exact dup + planted near dup + junk line
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "lang", "source", "n_chars").limit(40)
    val seedRow = base.where(col("doc_id") === 0L).head()
    val seedText = seedRow.getAs[String]("text")
    val dupRows = Seq(
      (9001L, seedText, "en", "dup", seedText.length.toLong), // exact dup of doc 0
      (9002L, seedText + " tail tweak", "en", "dup", seedText.length + 11L), // near dup
    )
    import spark.implicits._
    val corpus = base.union(dupRows.toDF(base.columns: _*))

    val dir = Files.createTempDirectory("graft-e2e-jsonl").toString
    corpus.write.mode("overwrite").json(dir) // JSONL on disk, as ingested in the wild

    // 1. ingest
    val ingested = DocStore.fromJsonl(spark, dir).drop("_corrupt_record")
    assert(ingested.count() == 42)

    // 2. clean + mask
    val cleaned = TextCleaning.maskPii(TextCleaning.clean(ingested))
      .withColumn("text", col("clean_text"))

    // 3. dedup: near-dup pairs → connected components → canonicals only
    val pairs = Dedup.minhashLsh(cleaned, threshold = 0.5)
    val clustered = Dedup.clusters(cleaned, pairs)
    assert(clustered.where(col("doc_id").isin(0L, 9001L, 9002L))
      .select("component").distinct().count() == 1) // all three share a cluster
    val canonical = cleaned.join(
      clustered.where(col("is_canonical") === 1).select("doc_id"), "doc_id")
    assert(canonical.count() <= 40) // the planted dups are gone

    // 4. quality gate + token counts
    val scored = canonical
      .withColumn("n_tokens", TextAnalysis.tokenCountWs(col("text")))
      .where(col("n_tokens") > 0)

    // 5. split + pack + shard write
    val split = Sampling.hashSplit(scored, "doc_id", Seq("train" -> 0.8, "val" -> 0.2))
    val packed = Packing.packSequences(scored, maxTokens = 512L, nShards = 2).toDF()
    val out = Files.createTempDirectory("graft-e2e-shards").toString
    DocStore.writeShards(packed.join(split.select("doc_id", "split"), "doc_id"), out)

    // 6. read back: lossless, budget respected
    val shards = DocStore.readShards(spark, out)
    assert(shards.count() == scored.count())
    val seqTotals = shards.groupBy("split", "shard", "seq_idx")
      .agg(sum("n_tokens").as("t"), count(lit(1)).as("nd")).collect()
    assert(seqTotals.forall(r => r.getAs[Long]("t") <= 512L || r.getAs[Long]("nd") == 1L))
  }

  test("curation gates compose: decontaminate → repetition/LM filters → mix") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

    // 1. benchmark decontamination: drop anything sharing a 3-gram
    //    with the (tiny, broadcast) eval slice
    val bench = docs.where(col("doc_id") % 97 === 0)
    val corpus = docs.where(col("doc_id") % 97 =!= 0)
    val flagged = Decontaminate.flags(corpus, bench, n = 3)
    val keptIds = flagged.where(col("contaminated") === 0).select("doc_id")
    val kept = corpus.join(keptIds, "doc_id")
    assert(kept.count() > 0 && kept.count() < corpus.count())

    // 2. repetition + LM-perplexity quality gates (filter the worst
    //    deciles — thresholds from the score distributions)
    val rep = kept.withColumn("dup3", TextAnalysis.dupNgramFrac(col("text"), 3))
    val ppl = LmScore.perplexity(kept).select(col("doc_id"), col("ppl"))
    val gated = rep
      .join(ppl, "doc_id")
      .where(col("dup3") < 0.9 && col("ppl").isNotNull)
    assert(gated.count() > 0 && gated.count() <= kept.count())

    // 3. domain mixture: even:odd source weights 1:3; mixture of the
    //    kept set shifts toward odd sources
    val weights = (0 until 20).map(i => (s"src$i", if (i % 2 == 0) 1L else 3L))
    val mixed = Sampling.mixToTarget(gated, "source", "doc_id", weights)
    val bySrcParity = mixed
      .withColumn("odd", (regexp_extract(col("source"), "\\d+", 0).cast("long") % 2).cast("int"))
      .groupBy("odd").count().as[(Int, Long)].collect().toMap
    assert(bySrcParity(1) > bySrcParity(0), s"odd sources must dominate 3:1: $bySrcParity")

    // 4. the survivors still split/pack cleanly (column contracts hold)
    val packed = Packing.packSequences(
      mixed.withColumn("n_tokens", TextAnalysis.tokenCountWs(col("text"))),
      maxTokens = 256L,
      nShards = 2,
    )
    assert(packed.count() == mixed.count())
  }
}
