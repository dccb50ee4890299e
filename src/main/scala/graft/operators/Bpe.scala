package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BpeExprs

/** Byte-level BPE tokenizer (the public GPT-2 algorithm: Sennrich et
  * al. 2016 byte-pair merges applied at byte granularity), replacing
  * the whitespace/regex token-count proxy with tokenizer-true counts
  * for packing budgets and perplexity normalization.
  *
  * Estimator/transformer split, sized for 100 TB:
  *  - [[train]] fits the merge table. The pair-merge loop is
  *    inherently sequential, so it runs ONCE inside a single Spark
  *    task over the aggregated word histogram — bounded model state
  *    (top `maxWords` distinct words by frequency, the standard
  *    trainer input), NOT the corpus. Only the fitted merges (≤
  *    `numMerges` rows) reach the driver — the same bounded-model
  *    contract as Spark ML estimators (e.g. KMeans centroids).
  *  - [[tokenCount]] is the 100 TB path: map-side only, zero
  *    shuffles — a Catalyst expression carrying the merge ranks in
  *    the plan (serialized to executors with the task closure), with
  *    a per-executor word→count memo (corpora repeat words; the memo
  *    turns the per-word merge loop into a hash probe).
  *
  * Pre-tokenization: whitespace split on the RAW text (byte-level BPE
  * is case-sensitive by construction — no normalization, unlike the
  * `tokenCountWs` proxy). Each word is encoded independently from its
  * UTF-8 bytes (one char per byte via ISO-8859-1 widening), so
  * multi-byte codepoints merge byte-by-byte exactly as published
  * byte-level vocabularies do.
  */
object Bpe {

  /** Word frequency histogram — the trainer input. One groupBy
    * shuffle on the word; `maxWords` bounds the model (rare-word tail
    * contributes no merges worth learning).
    */
  def wordHistogram(
      docs: DataFrame,
      textCol: String = "text",
      maxWords: Int = 50000,
  ): DataFrame =
    docs
      .select(explode(split(col(textCol), "\\s+")).as("word"))
      .where(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxWords)

  /** Fits `numMerges` byte-pair merges on the corpus word histogram.
    * Deterministic: the most frequent pair wins each round, ties
    * broken lexicographically. Returns merges in rank order.
    */
  def train(
      docs: DataFrame,
      textCol: String = "text",
      numMerges: Int = 200,
      minPairCount: Long = 2L,
      maxWords: Int = 50000,
  ): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    wordHistogram(docs, textCol, maxWords)
      .as[(String, Long)]
      .coalesce(1)
      .mapPartitions(it => BpeCore.train(it, numMerges, minPairCount))
      .collect() // <= numMerges fitted-model rows, never corpus data
      .sortBy(_._1)
      .map { case (_, a, b) => (a, b) }
      .toSeq
  }

  /** Tokenizer-true token count per document: map-side expression,
    * no shuffle. Feed the result to `Packing.packSequences` as its
    * `tokCol` for tokenizer-exact packing budgets.
    */
  def tokenCount(
      docs: DataFrame,
      merges: Seq[(String, String)],
      idCol: String = "doc_id",
      textCol: String = "text",
  ): DataFrame =
    docs.select(col(idCol), bpeCount(col(textCol), merges).as("n_tokens_bpe"))

  /** The count column alone (composition form). */
  def bpeCount(text: Column, merges: Seq[(String, String)]): Column =
    BpeExprs.bpeCount(text, merges)

  /** The full BPE token stream (whitespace pre-tokenization, per-word
    * byte-level merges, concatenated in document order) — feeds
    * `LmScore.perplexity(tokens = ...)` for tokenizer-true perplexity
    * over a BOUNDED vocab (≤ 256 + numMerges distinct tokens, the
    * case where `broadcastModel = true` is safe by construction).
    */
  def bpeTokens(text: Column, merges: Seq[(String, String)]): Column =
    BpeExprs.bpeTokens(text, merges)
}

/** Engine-independent BPE core: shared verbatim by the in-task
  * trainer, the Catalyst count expression, and the ScalaTest
  * hand-merge pins, so all three see identical semantics.
  */
object BpeCore {

  /** One string per UTF-8 byte (ISO-8859-1 widening: char code ==
    * byte value).
    */
  def byteTokens(word: String): Array[String] = {
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    Array.tabulate(bytes.length)(i => String.valueOf((bytes(i) & 0xff).toChar))
  }

  /** Classic BPE training loop over a word histogram: count adjacent
    * pairs weighted by word frequency, merge the winner everywhere,
    * repeat. O(numMerges × total histogram chars) — the trainer runs
    * on the bounded histogram, not the corpus, so the quadratic-ish
    * loop is a one-off model fit.
    */
  def train(
      wordCounts: Iterator[(String, Long)],
      numMerges: Int,
      minPairCount: Long,
  ): Iterator[(Int, String, String)] = {
    val words = wordCounts.map { case (w, c) =>
      (scala.collection.mutable.ArrayBuffer.from(byteTokens(w)), c)
    }.toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String)]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((toks, c) <- words; i <- 0 until toks.length - 1)
        pairCounts.updateWith((toks(i), toks(i + 1)))(v => Some(v.getOrElse(0L) + c))
      // winner: max count, then lexicographically smallest pair
      val best = pairCounts.foldLeft(Option.empty[((String, String), Long)]) {
        case (acc, (p, c)) =>
          acc match {
            case Some((bp, bc)) if bc > c || (bc == c && pairLe(bp, p)) => acc
            case _ => Some((p, c))
          }
      }
      best match {
        case Some((pair, c)) if c >= minPairCount =>
          merges += ((rank, pair._1, pair._2))
          for ((toks, _) <- words) mergeInPlace(toks, pair)
          rank += 1
        case _ => done = true
      }
    }
    merges.iterator
  }

  private def pairLe(a: (String, String), b: (String, String)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 <= b._2)

  /** Merge every non-overlapping occurrence of `pair`, left to right
    * (so "aaa" under merge (a,a) becomes ["aa","a"]).
    */
  def mergeInPlace(
      toks: scala.collection.mutable.ArrayBuffer[String],
      pair: (String, String),
  ): Unit = {
    var i = 0
    while (i < toks.length - 1) {
      if (toks(i) == pair._1 && toks(i + 1) == pair._2) {
        toks(i) = toks(i) + toks(i + 1)
        toks.remove(i + 1)
      }
      i += 1
    }
  }

  /** Encode one word: repeatedly apply the LOWEST-ranked applicable
    * merge (the GPT-2 encode order — NOT left-to-right greedy over
    * ranks), until no adjacent pair has a rank.
    */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): List[String] = {
    val toks = scala.collection.mutable.ArrayBuffer.from(byteTokens(word))
    var continue = toks.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i < toks.length - 1) {
        val r = ranks.getOrElse((toks(i), toks(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (toks(i), toks(i + 1)) }
        i += 1
      }
      if (bestPair == null) continue = false
      else mergeInPlace(toks, bestPair)
      if (toks.length < 2) continue = false
    }
    toks.toList
  }

  /** Fold over the whitespace-split words of `text`, memoizing the
    * per-word encode (the shared core of count and token-stream).
    */
  private def foldWords[A](
      text: String,
      ranks: Map[(String, String), Int],
      memo: scala.collection.mutable.HashMap[String, List[String]],
      zero: A,
  )(step: (A, List[String]) => A): A = {
    var acc = zero
    var start = 0
    val n = text.length
    while (start < n) {
      while (start < n && Character.isWhitespace(text.charAt(start))) start += 1
      var end = start
      while (end < n && !Character.isWhitespace(text.charAt(end))) end += 1
      if (end > start) {
        val w = text.substring(start, end)
        val toks = memo.get(w) match {
          case Some(v) => v
          case None =>
            val v = encodeWord(w, ranks)
            if (memo.size >= 65536) memo.clear() // bound executor memory
            memo.update(w, v)
            v
        }
        acc = step(acc, toks)
      }
      start = end
    }
    acc
  }

  /** Token count of a whitespace-split text under the merge table. */
  def countText(
      text: String,
      ranks: Map[(String, String), Int],
      memo: scala.collection.mutable.HashMap[String, List[String]],
  ): Int =
    foldWords(text, ranks, memo, 0)((acc, toks) => acc + toks.length)

  /** The concatenated BPE token stream of a whitespace-split text. */
  def tokensText(
      text: String,
      ranks: Map[(String, String), Int],
      memo: scala.collection.mutable.HashMap[String, List[String]],
  ): Seq[String] =
    foldWords(text, ranks, memo, Seq.newBuilder[String])((acc, toks) => acc ++= toks).result()
}
