package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 keyword scoring over a document corpus — the lexical
  * counterpart to the embedding ANN operators (training-data curation
  * filters by keywords as often as by vectors).
  *
  * Scale shape: term frequencies come from one map-side explode +
  * filter on the (few, literal) query terms, so only matching
  * (doc, term) rows enter the one aggregation shuffle; corpus stats
  * (N, Σdl, per-term df) are tiny aggregates that BROADCAST back.
  * Nothing is ever keyed on anything bigger than doc_id.
  *
  * Determinism: every input to the score (tf, dl, df, N, Σdl) is an
  * exact integer, and the per-term score terms are summed in the
  * FIXED literal order of `terms` (a left-to-right expression tree,
  * not a float aggregation) — so scores are bit-identical across
  * engines and partitionings, and the (score DESC, id ASC) top-k is
  * engine-exact.
  */
object Bm25 {

  def topK(
      corpus: DataFrame,
      terms: Seq[String],
      k: Int = 20,
      k1: Double = 1.2,
      b: Double = 0.75,
      idCol: String = "doc_id",
      textCol: String = "text",
  ): DataFrame = {
    require(terms.nonEmpty && terms == terms.distinct, "terms: non-empty, distinct")
    val dl = corpus.select(
      col(idCol),
      TextAnalysis.tokenCountWs(col(textCol)).cast("long").as("__dl"),
    )
    val termArr = array(terms.map(lit): _*)
    val tf = corpus
      .select(col(idCol), explode(filter(TextAnalysis.tokens(col(textCol)), t => array_contains(termArr, t))).as("__t"))
      .groupBy(col(idCol))
      .pivot("__t", terms)
      .agg(count(lit(1)))
      .na
      .fill(0L)
    // corpus stats: one row, broadcast back into the scoring projection
    val stats = dl.agg(
      count(lit(1)).cast("long").as("__n"),
      sum(col("__dl")).cast("long").as("__sumdl"),
    )
    // per-term document frequencies, derived from the (already tiny)
    // tf table — no second corpus scan
    val dfCols = terms.map(t => sum(when(col(s"`$t`") > 0, 1L).otherwise(0L)).as(s"__df_$t"))
    val dfs = tf.agg(dfCols.head, dfCols.tail: _*)
    val scored = tf
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(dfs))
    val avgdl = col("__sumdl").cast("double") / col("__n").cast("double")
    def termScore(t: String): Column = {
      val tfc = col(s"`$t`").cast("double")
      val dfc = col(s"__df_$t")
      val idf = log(lit(1.0) + ((col("__n") - dfc).cast("double") + lit(0.5)) / (dfc.cast("double") + lit(0.5)))
      idf * (tfc * lit(k1 + 1)) /
        (tfc + lit(k1) * (lit(1 - b) + lit(b) * col("__dl").cast("double") / avgdl))
    }
    // fixed left-to-right sum over the literal term order
    val score = terms.map(termScore).reduceLeft(_ + _)
    scored
      .select(col(idCol), score.as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
