package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag documents
  * that share any word n-gram with a (small) benchmark/eval set —
  * the standard guard against test-set leakage into training data.
  *
  * Scale shape: the benchmark side is tiny by definition (eval sets),
  * so its distinct grams BROADCAST; the corpus side explodes its
  * per-doc distinct grams map-side and the only shuffle is the
  * per-doc hit-count aggregation (partial map-side combine). No
  * corpus×corpus pair structure anywhere — cost is linear in corpus
  * grams.
  */
object Decontaminate {

  /** @return one row per corpus doc: (idCol, n_hits, contaminated)
    *         where n_hits counts DISTINCT shared n-grams (int 0/1
    *         flag for hash-stable output).
    */
  def flags(
      corpus: DataFrame,
      benchmark: DataFrame,
      n: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text",
  ): DataFrame = {
    val benchGrams = benchmark
      .select(explode(TextAnalysis.wordNgrams(col(textCol), n)).as("__g"))
      .distinct()
    val corpusGrams = corpus
      .select(col(idCol), explode(array_distinct(TextAnalysis.wordNgrams(col(textCol), n))).as("__g"))
    val hits = corpusGrams
      .join(broadcast(benchGrams), "__g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
    corpus
      .select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).cast("int").as("contaminated"),
      )
  }
}
