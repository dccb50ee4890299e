package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bpe, BpeCore, Packing}

/** Byte-level BPE: training against hand-computed merges, encode
  * semantics (rank order, not scan order), and the packing-budget
  * composition.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("training replays the classic hand computation") {
    // corpus: "low" x5, "lowest" x2  (the Sennrich walkthrough shape)
    // pair counts round 1: (l,o)=7 (o,w)=7 (w,e)=2 (e,s)=2 (s,t)=2
    //   -> tie (l,o) vs (o,w) broken lexicographically: (l,o)
    // round 2: (lo,w)=7 wins; round 3: three pairs at 2 -> (e,s);
    // round 4: (es,t); round 5: (low,est)=2; round 6: nothing >= 2
    val d = docs((Seq.fill(5)("low") ++ Seq.fill(2)("lowest")): _*)
    val merges = Bpe.train(d, numMerges = 10)
    assert(merges == Seq(
      ("l", "o"),
      ("lo", "w"),
      ("e", "s"),
      ("es", "t"),
      ("low", "est"),
    ))
  }

  test("encode applies the lowest-RANKED merge first, not left-to-right") {
    // ranks: (b,c)=0, (a,b)=1. Scan order would merge (a,b) first and
    // yield [ab, c]; rank order must yield [a, bc].
    val ranks = Map(("b", "c") -> 0, ("a", "b") -> 1)
    assert(BpeCore.encodeWord("abc", ranks) == List("a", "bc"))
    // overlapping occurrences merge left-to-right within one rank
    assert(BpeCore.encodeWord("aaa", Map(("a", "a") -> 0)) == List("aa", "a"))
    // no applicable merges: one token per byte
    assert(BpeCore.encodeWord("xyz", ranks) == List("x", "y", "z"))
  }

  test("multi-byte UTF-8 splits into bytes before merging") {
    // é is 2 UTF-8 bytes -> 2 initial tokens; with no merges the
    // count is the byte count, not the char count
    assert(BpeCore.byteTokens("é").length == 2)
    assert(BpeCore.encodeWord("é", Map.empty).length == 2)
  }

  test("tokenCount is map-side (zero exchanges) and matches per-word encode") {
    val d = docs("low low lowest", "unseen words", "low")
    val merges = Bpe.train(d, numMerges = 10)
    val ranks = merges.zipWithIndex.toMap
    val out = Bpe.tokenCount(d, merges).orderBy("doc_id").collect()
    val expected = Seq("low low lowest", "unseen words", "low").map(
      _.split("\\s+").filter(_.nonEmpty).map(w => BpeCore.encodeWord(w, ranks).length).sum
    )
    assert(out.map(_.getAs[Int]("n_tokens_bpe")).toSeq == expected)
    val p = Bpe.tokenCount(d, merges).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"BPE count must be map-side:\n$p")
  }

  test("training is deterministic across runs") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m1 = Bpe.train(d, numMerges = 50)
    val m2 = Bpe.train(d, numMerges = 50)
    assert(m1 == m2)
    assert(m1.nonEmpty)
  }

  test("bpeTokens streams per-word encodes in document order") {
    val merges = Seq(("l", "o"), ("lo", "w"))
    val d = docs("low lo x")
    val out = d
      .select(graft.operators.Bpe.bpeTokens($"text", merges).as("t"))
      .head()
      .getSeq[String](0)
    assert(out == Seq("low", "lo", "x"))
  }

  test("tokenizer-true perplexity: BPE token stream with a broadcast-safe vocab") {
    val d = docs("low low lowest", "low lowest", "unseen unseen unseen")
    val merges = Bpe.train(d, numMerges = 10)
    val out = graft.operators.LmScore
      .perplexity(d, broadcastModel = true, tokens = Some(Bpe.bpeTokens($"text", merges)))
      .orderBy("doc_id")
      .collect()
    // n_bigrams is tokenizer-true: BPE token count minus one per doc
    val counts = Bpe.tokenCount(d, merges).orderBy("doc_id").collect()
      .map(_.getAs[Int]("n_tokens_bpe"))
    assert(out.map(_.getAs[Long]("n_bigrams")).toSeq ==
      counts.map(c => math.max(c - 1, 0).toLong).toSeq)
    // perplexities are finite and positive (add-one smoothing)
    assert(out.forall(r => r.getAs[Double]("ppl") > 0.0 && !r.getAs[Double]("ppl").isInfinite))
  }

  test("BPE counts feed packing budgets") {
    val d = docs("low low low low", "lowest lowest", "low")
    val merges = Bpe.train(d, numMerges = 10)
    val counted = Bpe.tokenCount(d, merges)
    val packed = Packing
      .packSequences(counted, maxTokens = 8, nShards = 1, tokCol = "n_tokens_bpe")
      .collect()
    assert(packed.length == 3)
    // budget respected: per (shard, seq) token sum <= maxTokens
    val bySeq = packed.groupBy(p => (p.shard, p.seq_idx)).values
    assert(bySeq.forall(_.map(_.n_tokens).sum <= 8))
  }
}
