package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language-model scoring — the perplexity
  * proxy quality filter (a la CCNet): documents whose token stream is
  * improbable under the corpus's own add-one-smoothed bigram model
  * get high perplexity and can be filtered.
  *
  *   nll(doc) = -(1/n) Σ_i ln( (c(w_i, w_{i+1}) + 1) / (c(w_i) + V) )
  *   ppl(doc) = exp(nll)
  *
  * Scale shape: the model (unigram + bigram count tables and the
  * vocab size) comes from two aggregations of the exploded token
  * stream and is joined back onto the per-doc bigram stream. The
  * default tokens are WHITESPACE WORDS — an unbounded vocabulary, so
  * the bigram table grows with observed distinct bigrams and on a
  * 100 TB corpus would blow any broadcast limit. The default join
  * strategy therefore carries NO broadcast hint: Spark's size-gated
  * planner (and AQE at runtime) broadcasts the count tables while
  * they fit under spark.sql.autoBroadcastJoinThreshold and degrades
  * to a shuffle join on the token keys once they outgrow it — the
  * safe path at any corpus size. `broadcastModel = true` restores
  * the forced-broadcast plan as an opt-in for genuinely bounded
  * vocabularies (sub-word/BPE vocabs are ≤ ~100k rows). The 1-row
  * vocab-size table is always broadcast (its size is corpus-
  * independent).
  *
  * `minBigramCount` is the standard frequency-floor variant: bigrams
  * observed fewer than the floor times are pruned from the MODEL
  * (their smoothed probability falls back to the unseen case
  * 1/(c(w)+V)), which bounds the bigram table by the corpus's
  * non-hapax bigram count — the classic trick for add-one models.
  * The default 0 keeps the exact model (identical output to previous
  * rounds; the oracle replays the floor=0 form).
  *
  * The per-doc sum folds the doc's OWN ln-terms in position order
  * (sorted-array aggregate, like uniqueness weights) — a parallel
  * float SUM would drift with partitioning; the ordered fold is
  * bit-stable and the oracle replays it with an ordered list_reduce.
  */
object LmScore {

  def perplexity(
      corpus: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      broadcastModel: Boolean = false,
      minBigramCount: Long = 0L,
      /** Override the token stream — e.g. `Bpe.bpeTokens(col("text"),
        * merges)` for tokenizer-true perplexity over a vocab bounded
        * by 256 + merges.length, the case where `broadcastModel =
        * true` is safe by construction. Default: whitespace words
        * (the oracle-replayed form).
        */
      tokens: Option[org.apache.spark.sql.Column] = None,
  ): DataFrame = {
    val tokCol =
      tokens.getOrElse(filter(TextAnalysis.tokens(col(textCol)), t => t =!= ""))
    val ex = corpus.select(
      col(idCol),
      posexplode(tokCol).as(Seq("__pos", "__w")),
    )
    val wDoc = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    val bi = ex
      .withColumn("__w2", lead(col("__w"), 1).over(wDoc))
      .where(col("__w2").isNotNull)
    val uni = ex.groupBy(col("__w")).agg(count(lit(1)).as("__c1"))
    val vocab = uni.agg(count(lit(1)).cast("long").as("__v"))
    val biCountsAll = bi.groupBy(col("__w").as("__bw"), col("__w2").as("__bw2"))
      .agg(count(lit(1)).as("__c2"))
    val biCounts =
      if (minBigramCount > 0L) biCountsAll.where(col("__c2") >= lit(minBigramCount))
      else biCountsAll
    val hint: DataFrame => DataFrame = if (broadcastModel) broadcast(_) else identity
    // Left join: with the default floor=0 every observed bigram is in
    // the model (identical to an inner join); with a floor, pruned
    // bigrams fall through to the unseen count 0.
    val terms = bi
      .join(hint(biCounts), col("__w") === col("__bw") && col("__w2") === col("__bw2"), "left")
      .join(hint(uni.withColumnRenamed("__w", "__uw")), col("__w") === col("__uw"))
      .crossJoin(broadcast(vocab))
      .select(
        col(idCol),
        col("__pos"),
        log((coalesce(col("__c2"), lit(0L)) + lit(1L)).cast("double") /
          (col("__c1") + col("__v")).cast("double"))
          .as("__term"),
      )
    val folded = terms
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        aggregate(
          transform(
            array_sort(collect_list(struct(col("__pos"), col("__term")))),
            x => x.getField("__term"),
          ),
          lit(0.0),
          (acc, x) => acc + x,
        ).as("__s"),
      )
    corpus
      .select(col(idCol))
      .join(folded, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        (-col("__s") / col("n_bigrams").cast("double")).as("nll"),
        exp(-col("__s") / col("n_bigrams").cast("double")).as("ppl"),
      )
  }
}
