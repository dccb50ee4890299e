package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DSIR-style data selection with importance resampling (Xie et al.
  * 2023, "Data Selection for Language Models via Importance
  * Resampling"): score every raw document by the log-likelihood
  * ratio of a TARGET hashed-ngram distribution over the RAW corpus
  * distribution, then sample proportionally via Gumbel top-k.
  *
  *   logw(doc) = Σ_{g ∈ grams(doc)} [ ln p̂_t(b(g)) − ln p̂_r(b(g)) ]
  *
  * over unigrams + bigrams hashed into `buckets` feature ids (the
  * same 32-bit md5 feature hashing as the quality classifier), with
  * add-one smoothing: p̂(b) = (count_b + 1) / (total + buckets).
  *
  * Engine exactness: a per-doc Σ of double log-ratios is
  * partition-order-dependent, so each bucket's ratio is quantized
  * ONCE to integer nano-units — qllr_b = round(1e9·(ln t_b − ln r_b))
  * on the ≤`buckets`-row stat table — and the per-doc sum
  * accumulates those BIGINTs associatively (map-side partials, any
  * partition order); logw = Σqllr / 1e9 is the only per-doc FP step.
  * |qllr| ≤ ~4e10 (ln of corpus scale × 1e9), so the per-doc BIGINT
  * sum has headroom to ~2e8 grams per document.
  *
  * The Gumbel key makes top-k selection a sample WITHOUT replacement
  * from softmax(logw): score = logw + G_doc with
  * G = −ln(−ln u), u ∈ (0,1) a deterministic md5 hash of the doc id
  * (the [[Sampling]] reproducibility idiom) — `ORDER BY score DESC
  * LIMIT k` downstream is Spark's distributed TakeOrdered, no global
  * sort materialization.
  *
  * Scale shape: one map-side-combinable exchange onto ≤`buckets`
  * stat rows, the stat table broadcast back over the exploded grams,
  * one (doc-keyed) aggregation exchange. No corpus-sized join sides,
  * no windows, no driver materialization.
  *
  * Cross-run form (the [[IncrementalDedup]]/[[VectorIndex]] store
  * pattern): [[buildStore]] persists the raw integer bucket counts,
  * [[appendStore]] rolls them forward snapshot-style (counts add),
  * and [[scoreAgainst]] scores a NEW batch against the frozen stats
  * without touching the old corpus — the production shape where the
  * target/raw distributions are estimated once and reused across
  * ingests.
  */
object Dsir {

  /** doc_id, tgt, b — one row per (unigram+bigram) gram occurrence. */
  private def gramBuckets(
      docs: DataFrame,
      isTarget: Column,
      buckets: Int,
      idCol: String,
      textCol: String,
  ): DataFrame = {
    val tk = filter(TextAnalysis.tokens(col(textCol)), t => t =!= "")
    val hashes = concat(
      graft.functions.TextExprs.gramHashes32(tk, 1),
      graft.functions.TextExprs.gramHashes32(tk, 2),
    )
    docs
      .select(col(idCol).as("doc_id"), isTarget.as("tgt"), explode(hashes).as("h"))
      .select(col("doc_id"), col("tgt"), pmod(col("h"), lit(buckets.toLong)).as("b"))
  }

  /** b, tcnt, rcnt — integer counts, map-side combinable. */
  private def statsOf(exploded: DataFrame): DataFrame =
    exploded
      .groupBy(col("b"))
      .agg(
        sum(when(col("tgt"), lit(1L)).otherwise(lit(0L))).as("tcnt"),
        count(lit(1)).as("rcnt"),
      )

  /** b, qllr — the quantized per-bucket log-likelihood ratio; the
    * ONLY log/division site, on ≤`buckets` rows. Corpus totals via
    * an unpartitioned window over the bounded stat table (keeps ONE
    * stats subtree instead of two scans of the gram stream).
    */
  private def llrOf(bucketStats: DataFrame, buckets: Int): DataFrame = {
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy()
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    bucketStats
      .withColumn("t_total", sum(col("tcnt")).over(wAll).cast("long"))
      .withColumn("r_total", sum(col("rcnt")).over(wAll).cast("long"))
      .select(
        col("b"),
        round(
          (log((col("tcnt") + lit(1L)).cast("double") / (col("t_total") + lit(buckets.toLong)).cast("double")) -
            log((col("rcnt") + lit(1L)).cast("double") / (col("r_total") + lit(buckets.toLong)).cast("double"))) * lit(1e9)
        ).cast("long").as("qllr"),
      )
  }

  /** Per-doc BIGINT qllr sums + the Gumbel key, left-joined back so
    * zero-gram docs score 0.
    */
  private def scoreDocs(
      docs: DataFrame,
      exploded: DataFrame,
      llr: DataFrame,
      idCol: String,
      salt: String,
  ): DataFrame = {
    val perDoc = exploded
      .join(broadcast(llr), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("qllr")).cast("long").as("qsum"), count(lit(1)).as("n_grams"))
    // deterministic Gumbel(0,1) from the doc id's md5 (u ∈ (0,1))
    val h32 = conv(
      substring(md5(concat(col("doc_id").cast("string"), lit(":" + salt))), 1, 8),
      16,
      10,
    ).cast("long")
    val u = (h32.cast("double") + lit(0.5)) / lit(4294967296.0)
    val logw = col("qsum").cast("double") / lit(1e9)
    docs
      .select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        when(col("qsum").isNull, lit(0.0)).otherwise(logw).as("dsir_logw"),
        (when(col("qsum").isNull, lit(0.0)).otherwise(logw) - log(-log(u))).as("sample_score"),
      )
  }

  /** Per-document importance weights against a target subset.
    *
    * @param isTarget row predicate over `docs` marking the target
    *                 distribution's documents (e.g. `col("lang") === "en"`)
    * @return doc_id, n_grams, dsir_logw, sample_score (logw + Gumbel)
    */
  def weights(
      docs: DataFrame,
      isTarget: Column,
      buckets: Int = 4096,
      idCol: String = "doc_id",
      textCol: String = "text",
      salt: String = "dsir",
  ): DataFrame = {
    val exploded = gramBuckets(docs, isTarget, buckets, idCol, textCol)
    scoreDocs(docs, exploded, llrOf(statsOf(exploded), buckets), idCol, salt)
  }

  /** The selection step: top-k documents by Gumbel-perturbed weight —
    * importance resampling without replacement from softmax(logw).
    */
  def resample(
      docs: DataFrame,
      isTarget: Column,
      k: Int,
      buckets: Int = 4096,
      idCol: String = "doc_id",
      textCol: String = "text",
      salt: String = "dsir",
  ): DataFrame =
    weights(docs, isTarget, buckets, idCol, textCol, salt)
      .orderBy(col("sample_score").desc, col("doc_id"))
      .limit(k)

  /** Persist the raw integer bucket counts (b, tcnt, rcnt) plus the
    * bucket-count meta — counts, not ratios, so stores ADD under
    * [[appendStore]] and the smoothing stays a scoring-time choice.
    */
  def buildStore(
      docs: DataFrame,
      isTarget: Column,
      dir: String,
      buckets: Int = 4096,
      idCol: String = "doc_id",
      textCol: String = "text",
  ): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    statsOf(gramBuckets(docs, isTarget, buckets, idCol, textCol))
      .write.mode("overwrite").parquet(s"$dir/buckets")
    Seq(buckets).toDF("buckets").write.mode("overwrite").parquet(s"$dir/meta")
  }

  private def storeBuckets(spark: SparkSession, dir: String): (DataFrame, Int) = {
    val b = spark.read.parquet(s"$dir/buckets")
    val k = spark.read.parquet(s"$dir/meta").head().getInt(0)
    (b, k)
  }

  /** Roll the store forward with a new batch, snapshot-style (the
    * [[IncrementalDedup.appendStore]] contract): bucket counts add;
    * pinned table-equal to a fresh [[buildStore]] over the union.
    */
  def appendStore(
      spark: SparkSession,
      dir: String,
      newDocs: DataFrame,
      isTarget: Column,
      outDir: String,
      idCol: String = "doc_id",
      textCol: String = "text",
  ): Unit = {
    require(
      new java.io.File(outDir).getCanonicalPath != new java.io.File(dir).getCanonicalPath,
      "appendStore writes a NEW snapshot dir (read-while-overwrite is unsafe)",
    )
    import spark.implicits._
    val (old, buckets) = storeBuckets(spark, dir)
    old
      .unionByName(statsOf(gramBuckets(newDocs, isTarget, buckets, idCol, textCol)))
      .groupBy(col("b"))
      .agg(sum(col("tcnt")).cast("long").as("tcnt"), sum(col("rcnt")).cast("long").as("rcnt"))
      .write.mode("overwrite").parquet(s"$outDir/buckets")
    Seq(buckets).toDF("buckets").write.mode("overwrite").parquet(s"$outDir/meta")
  }

  /** Score a NEW batch against the frozen store — no old-corpus
    * rescan; equals [[weights]] with the store's stats by
    * construction (same llr/scoring subtrees).
    */
  def scoreAgainst(
      spark: SparkSession,
      dir: String,
      newDocs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      salt: String = "dsir",
  ): DataFrame = {
    val (stats, buckets) = storeBuckets(spark, dir)
    // complete the stats over the full bucket spine: a NEW batch can
    // hash grams into buckets the stored corpus never saw, and those
    // must score the smoothed zero-count ratio, not be dropped by
    // the llr join (add-one smoothing exists exactly for this; the
    // one-shot path never hits it — every gram's own bucket is
    // present there). The spine is ≤`buckets` rows; totals are
    // unchanged by the zero rows.
    val spine = spark.range(buckets).select(col("id").as("b"))
    val complete = spine
      .join(stats, Seq("b"), "left")
      .select(
        col("b"),
        coalesce(col("tcnt"), lit(0L)).as("tcnt"),
        coalesce(col("rcnt"), lit(0L)).as("rcnt"),
      )
    val exploded = gramBuckets(newDocs, lit(false), buckets, idCol, textCol)
    scoreDocs(newDocs, exploded, llrOf(complete, buckets), idCol, salt)
  }

  /** Stateless map-side scorer against the frozen store — the
    * streaming-ingest shape: the ≤`buckets`-row qllr table collapses
    * to a LITERAL lookup array (bounded driver collect, the
    * classifier-LUT pattern), so scoring is explode-free and
    * shuffle-free — works unchanged on a streaming DataFrame (no
    * aggregation, no watermark, append mode). The per-doc qllr sum
    * folds the gram array sequentially, but integer addition is
    * order-free, so rows are bit-equal to [[scoreAgainst]] (pinned).
    */
  def scoreMapSide(
      spark: SparkSession,
      dir: String,
      newDocs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      salt: String = "dsir",
  ): DataFrame = {
    val (stats, buckets) = storeBuckets(spark, dir)
    val spine = spark.range(buckets).select(col("id").as("b"))
    val complete = spine
      .join(stats, Seq("b"), "left")
      .select(
        col("b"),
        coalesce(col("tcnt"), lit(0L)).as("tcnt"),
        coalesce(col("rcnt"), lit(0L)).as("rcnt"),
      )
    // bounded by construction: exactly `buckets` rows
    val lut = new Array[Long](buckets)
    llrOf(complete, buckets).collect().foreach(r => lut(r.getLong(0).toInt) = r.getLong(1))
    val tk = filter(TextAnalysis.tokens(col(textCol)), t => t =!= "")
    val hashes = concat(
      graft.functions.TextExprs.gramHashes32(tk, 1),
      graft.functions.TextExprs.gramHashes32(tk, 2),
    )
    val qsum = aggregate(
      hashes,
      lit(0L),
      (acc, h) => acc + element_at(typedLit(lut.toSeq), (pmod(h, lit(buckets.toLong)) + 1).cast("int")),
    )
    val h32 = conv(
      substring(md5(concat(col("doc_id").cast("string"), lit(":" + salt))), 1, 8),
      16,
      10,
    ).cast("long")
    val u = (h32.cast("double") + lit(0.5)) / lit(4294967296.0)
    newDocs
      .select(
        col(idCol).as("doc_id"),
        // null text -> null array: coalesce to the batch path's
        // zero-gram outcome (explode drops the row there)
        coalesce(size(hashes).cast("long"), lit(0L)).as("n_grams"),
        coalesce(qsum, lit(0L)).as("qsum"),
      )
      .select(
        col("doc_id"),
        col("n_grams"),
        when(col("n_grams") === 0L, lit(0.0))
          .otherwise(col("qsum").cast("double") / lit(1e9)).as("dsir_logw"),
        (when(col("n_grams") === 0L, lit(0.0))
          .otherwise(col("qsum").cast("double") / lit(1e9)) - log(-log(u))).as("sample_score"),
      )
  }

  /** Per-document surprisal against the frozen store: mean negative
    * log-likelihood of the doc's grams under the store's smoothed
    * RAW distribution,
    *
    *   surprisal(doc) = −(Σ_g ln p̂_ref(b(g))) / n_grams,
    *
    * the document-granularity outlier alarm next to the per-source
    * [[driftAgainst]] — an off-distribution document scores high
    * even inside an on-distribution feed. Same construction as
    * [[scoreMapSide]]: the ≤`buckets` ln-probabilities are quantized
    * to nano-units once driver-side and carried as a literal LUT, so
    * scoring is a map-side aggregate over the gram array — no
    * explode, no shuffle, no watermark; runs unchanged (bit-equal,
    * pinned) on a streaming DataFrame. Zero-gram docs score null.
    *
    * Output: idCol, n_grams, surprisal (nats/gram).
    */
  def surprisalAgainst(
      spark: SparkSession,
      dir: String,
      newDocs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
  ): DataFrame = {
    val (stats, buckets) = storeBuckets(spark, dir)
    val spine = spark.range(buckets).select(col("id").as("b"))
    val complete = spine
      .join(stats, Seq("b"), "left")
      .select(col("b"), coalesce(col("rcnt"), lit(0L)).as("rc"))
    import org.apache.spark.sql.expressions.Window
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val qln = complete
      .withColumn("n_r", sum(col("rc")).over(wAll).cast("long"))
      .select(
        col("b"),
        round(
          log((col("rc") + lit(1L)).cast("double") / (col("n_r") + lit(buckets.toLong)).cast("double")) * lit(1e9)
        ).cast("long").as("q"),
      )
    // bounded by construction: exactly `buckets` rows
    val lut = new Array[Long](buckets)
    qln.collect().foreach(r => lut(r.getLong(0).toInt) = r.getLong(1))
    val tk = filter(TextAnalysis.tokens(col(textCol)), t => t =!= "")
    val hashes = concat(
      graft.functions.TextExprs.gramHashes32(tk, 1),
      graft.functions.TextExprs.gramHashes32(tk, 2),
    )
    val qsum = aggregate(
      hashes,
      lit(0L),
      (acc, h) => acc + element_at(typedLit(lut.toSeq), (pmod(h, lit(buckets.toLong)) + 1).cast("int")),
    )
    newDocs
      .select(
        col(idCol).as("doc_id"),
        coalesce(size(hashes).cast("long"), lit(0L)).as("n_grams"),
        coalesce(qsum, lit(0L)).as("__qsum"),
      )
      .select(
        col("doc_id"),
        col("n_grams"),
        when(
          col("n_grams") > 0L,
          -(col("__qsum").cast("double") / lit(1e9)) / col("n_grams").cast("double"),
        ).as("surprisal"),
      )
  }

  /** Cross-run drift monitor: [[corpusKl]]'s KL/TV statistics for a
    * NEW batch, but against the FROZEN raw distribution of a
    * persisted store ([[buildStore]]) instead of the batch's own
    * corpus — the ingest-time alarm a production pipeline runs per
    * feed without rescanning history. Same gram/spine/smoothing/
    * quantization trees as [[corpusKl]]; the reference totals come
    * from the ≤`buckets`-row store.
    *
    * Output per source in the new batch: source, n_grams, kl_nats,
    * tv_dist.
    */
  def driftAgainst(
      spark: SparkSession,
      dir: String,
      newDocs: DataFrame,
      textCol: String = "text",
      sourceCol: String = "source",
  ): DataFrame = {
    val (stats, buckets) = storeBuckets(spark, dir)
    import org.apache.spark.sql.expressions.Window
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val spine = spark.range(buckets).select(col("id").as("b"))
    val ref = spine
      .join(stats, Seq("b"), "left")
      .select(col("b"), coalesce(col("rcnt"), lit(0L)).as("rc"))
      .withColumn("n_r", sum(col("rc")).over(wAll).cast("long"))
    val tk = filter(TextAnalysis.tokens(col(textCol)), t => t =!= "")
    val hashes = concat(
      graft.functions.TextExprs.gramHashes32(tk, 1),
      graft.functions.TextExprs.gramHashes32(tk, 2),
    )
    val cnt = newDocs
      .select(col(sourceCol).as("source"), explode(hashes).as("h"))
      .select(col("source"), pmod(col("h"), lit(buckets.toLong)).as("b"))
      .groupBy(col("source"), col("b"))
      .agg(count(lit(1)).as("c"))
    val srcSpine = cnt
      .select(col("source"))
      .distinct()
      .crossJoin(broadcast(spark.range(buckets).select(col("id").as("b"))))
    val wS = Window.partitionBy(col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val full = srcSpine
      .join(cnt, Seq("source", "b"), "left")
      .select(col("source"), col("b"), coalesce(col("c"), lit(0L)).as("c"))
      .withColumn("n_s", sum(col("c")).over(wS).cast("long"))
      .join(broadcast(ref), Seq("b"))
    val ps = (col("c") + lit(1L)).cast("double") / (col("n_s") + lit(buckets.toLong)).cast("double")
    val pc = (col("rc") + lit(1L)).cast("double") / (col("n_r") + lit(buckets.toLong)).cast("double")
    full
      .select(
        col("source"),
        col("n_s"),
        round((ps * (log(ps) - log(pc))) * lit(1e9)).cast("long").as("qkl"),
        round(abs(ps - pc) * lit(1e9)).cast("long").as("qtv"),
      )
      .groupBy(col("source"))
      .agg(
        max(col("n_s")).as("n_grams"),
        sum(col("qkl")).cast("long").as("__qk"),
        sum(col("qtv")).cast("long").as("__qt"),
      )
      .select(
        col("source"),
        col("n_grams"),
        (col("__qk").cast("double") / lit(1e9)).as("kl_nats"),
        (col("__qt").cast("double") / lit(1e9) * lit(0.5)).as("tv_dist"),
      )
  }

  /** Per-source corpus drift: KL divergence and total-variation
    * distance of each source's hashed-ngram distribution against the
    * whole corpus — the monitoring statistic a multi-source ingest
    * pipeline tracks to catch a feed going off-distribution (and the
    * aggregate companion of the per-document [[weights]] scorer; same
    * grams, same add-one smoothing):
    *
    *   KL(s) = Σ_b p̂_s(b)·(ln p̂_s(b) − ln p̂_c(b)),
    *   TV(s) = ½·Σ_b |p̂_s(b) − p̂_c(b)|,
    *
    * over the FULL bucket spine (zero-count buckets contribute their
    * smoothed mass — dropping them understates drift).
    *
    * Engine exactness: each bucket's term is one deterministic double
    * tree over integer counts, quantized to nano-units (the [[llrOf]]
    * idiom) so the per-source sums accumulate as BIGINTs in any
    * partition order; ÷1e9 is the only post-sum FP step. |qkl| ≤
    * ~2e10 ⇒ headroom to ~4e8 buckets per source.
    *
    * Scale shape: one map-side-combinable exchange onto ≤ sources ×
    * `buckets` stat rows; the spine, totals windows, and final
    * aggregation all run on that bounded table. Nothing downstream
    * of the gram explode is corpus-sized.
    *
    * Output per source: source, n_grams, kl_nats, tv_dist.
    */
  def corpusKl(
      docs: DataFrame,
      buckets: Int = 4096,
      textCol: String = "text",
      sourceCol: String = "source",
  ): DataFrame = {
    require(buckets > 0, "buckets > 0")
    val spark = docs.sparkSession
    val tk = filter(TextAnalysis.tokens(col(textCol)), t => t =!= "")
    val hashes = concat(
      graft.functions.TextExprs.gramHashes32(tk, 1),
      graft.functions.TextExprs.gramHashes32(tk, 2),
    )
    val cnt = docs
      .select(col(sourceCol).as("source"), explode(hashes).as("h"))
      .select(col("source"), pmod(col("h"), lit(buckets.toLong)).as("b"))
      .groupBy(col("source"), col("b"))
      .agg(count(lit(1)).as("c"))
    val spine = cnt
      .select(col("source"))
      .distinct()
      .crossJoin(broadcast(spark.range(buckets).select(col("id").as("b"))))
    val full = spine
      .join(cnt, Seq("source", "b"), "left")
      .select(col("source"), col("b"), coalesce(col("c"), lit(0L)).as("c"))
    import org.apache.spark.sql.expressions.Window
    val wS = Window.partitionBy(col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wB = Window.partitionBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val stats = full
      .withColumn("c_b", sum(col("c")).over(wB).cast("long"))
      .withColumn("n_s", sum(col("c")).over(wS).cast("long"))
      .withColumn("n_c", sum(col("c")).over(wAll).cast("long"))
    val ps = (col("c") + lit(1L)).cast("double") / (col("n_s") + lit(buckets.toLong)).cast("double")
    val pc = (col("c_b") + lit(1L)).cast("double") / (col("n_c") + lit(buckets.toLong)).cast("double")
    stats
      .select(
        col("source"),
        col("n_s"),
        round((ps * (log(ps) - log(pc))) * lit(1e9)).cast("long").as("qkl"),
        round(abs(ps - pc) * lit(1e9)).cast("long").as("qtv"),
      )
      .groupBy(col("source"))
      .agg(
        max(col("n_s")).as("n_grams"),
        sum(col("qkl")).cast("long").as("__qk"),
        sum(col("qtv")).cast("long").as("__qt"),
      )
      .select(
        col("source"),
        col("n_grams"),
        (col("__qk").cast("double") / lit(1e9)).as("kl_nats"),
        (col("__qt").cast("double") / lit(1e9) * lit(0.5)).as("tv_dist"),
      )
  }
}
