package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis.normText

/** Deduplication operators for training-data pipelines.
  *
  * Design notes for 100 TB:
  *  - Exact dedup: one shuffle on the content fingerprint.
  *  - MinHash/LSH: per-row signatures are Catalyst expressions
  *    (map-side, no shuffle); the only shuffles are the band-bucket
  *    exchange and the candidate-pair join — the classic
  *    shingle→minhash→band→bucket-join pipeline, never an n² compare.
  *  - All hashing is md5 over strings, so signatures and buckets are
  *    engine-independent (DuckDB oracle replays them exactly).
  *  - Jaccard = ratio of exact integer set sizes → identical doubles
  *    in both engines.
  */
object Dedup {

  /** Distinct character k-shingles of the normalized text. */
  def charShingles(text: Column, k: Int = 5): Column = {
    val n = normText(text)
    when(
      length(n) >= k,
      array_distinct(
        transform(sequence(lit(1), length(n) - lit(k - 1)), i => n.substr(i, lit(k)))
      ),
    ).otherwise(array(n))
  }

  /** Distinct word n-grams (space-joined) of the normalized text. */
  def wordNgrams(text: Column, n: Int = 3): Column = {
    val toks = TextAnalysis.tokens(text)
    when(
      size(toks) >= n,
      array_distinct(
        transform(
          sequence(lit(1), size(toks) - lit(n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*),
        )
      ),
    ).otherwise(array(concat_ws(" ", toks)))
  }

  /** MinHash signature: per seed, the lexicographic minimum of
    * md5(seed || shingle). Returns array<string> of length nHashes.
    */
  def minhashSignature(shingles: Column, nHashes: Int = 16): Column =
    array((0 until nHashes).map { i =>
      array_min(transform(shingles, s => md5(concat(lit(s"$i:"), s))))
    }: _*)

  /** LSH band hashes: md5 over each band's concatenated signature
    * slice. nHashes must be divisible by bands.
    */
  def bandHashes(sig: Column, nHashes: Int, bands: Int): Column = {
    val rows = nHashes / bands
    array((0 until bands).map { b =>
      md5(concat_ws("|", (0 until rows).map(r => element_at(sig, b * rows + r + 1)): _*))
    }: _*)
  }

  /** Exact duplicates by normalized-content fingerprint: every doc
    * with its canonical keeper (minimum doc_id sharing the
    * fingerprint) and the duplicate-group size.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(col("fingerprint"))
    docs
      .select(col(idCol), TextAnalysis.fingerprint(col(textCol)).as("fingerprint"))
      .withColumn("keep_id", min(col(idCol)).over(w))
      .withColumn("group_size", count(lit(1)).over(w).cast("long"))
      .withColumn("is_dup", (col(idCol) =!= col("keep_id")).cast("int"))
  }

  /** Near-duplicate pairs via shingle→minhash→band→bucket-join, with
    * exact Jaccard verification of the LSH candidates.
    *
    * @param shingleFn per-doc shingle-set column (char or word grams)
    */
  def lshJaccardPairs(
      docs: DataFrame,
      shingleFn: Column => Column,
      idCol: String = "doc_id",
      textCol: String = "text",
      nHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5,
  ): DataFrame = {
    val base = docs.select(col(idCol).as("id"), shingleFn(col(textCol)).as("sh"))
    val withBands = base
      .withColumn("band", explode(bandHashes(minhashSignature(col("sh"), nHashes), nHashes, bands)))
      .select(col("id"), col("band"))
    val cand = withBands
      .as("a")
      .join(withBands.as("b"), col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cand
      .join(base.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn(
        "jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"),
      )
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash+LSH near-dup pairs on character 5-shingles. */
  def minhashLsh(docs: DataFrame, threshold: Double = 0.5): DataFrame =
    lshJaccardPairs(docs, charShingles(_, 5), threshold = threshold)

  /** Word-3-gram Jaccard similarity join (LSH-pruned). */
  def ngramJaccard(docs: DataFrame, threshold: Double = 0.3): DataFrame =
    lshJaccardPairs(docs, wordNgrams(_, 3), threshold = threshold)

  /** SimHash fingerprint (60-bit, kept positive in a signed 64-bit
    * value for engine portability): per bit j, the majority vote of
    * bit j of md5(token) over all (duplicate-counted) tokens.
    *
    * Per-row expression with one md5 per token; at petabyte scale
    * this would become a single custom Catalyst Expression computing
    * all 60 votes in one pass over the tokens (see SURVEY §4).
    */
  def simhash(text: Column, bits: Int = 60): Column = {
    val hashes = transform(
      filter(TextAnalysis.tokens(text), t => t =!= ""),
      t => md5(t),
    )
    val bitCols = (0 until bits).map { j =>
      val hexPos = j / 4 + 1
      val mask = 1L << (j % 4)
      // vote_j = sum of (bit ? 1 : -1) over token hashes
      val vote = aggregate(
        hashes,
        lit(0L),
        (acc, h) =>
          acc + when(
            (conv(substring(h, hexPos, 1), 16, 10).cast("long") / lit(mask)).cast("long") % 2 === 1,
            1L,
          ).otherwise(-1L),
      )
      when(vote > 0, lit(1L) * lit(1L << j)).otherwise(lit(0L))
    }
    bitCols.reduceLeft(_ + _)
  }

  /** Per-doc simhash with exact-bucket duplicate grouping. */
  def simhashDocs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(col("simhash"))
    docs
      .select(col(idCol), simhash(col(textCol)).as("simhash"))
      .withColumn("keep_id", min(col(idCol)).over(w))
      .withColumn("is_dup", (col(idCol) =!= col("keep_id")).cast("int"))
  }
}
