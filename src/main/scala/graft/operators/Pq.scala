package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExprs

/** Product quantization (PQ) for embedding search at 100 TB: vectors
  * are split into `m` subspaces, each subvector replaced by the id of
  * its nearest per-subspace codebook entry — m small ints instead of
  * `dim` floats (32× compression at m=8, k≤256 over 64-dim f32), so
  * the candidate set a query scans fits in memory at corpus sizes
  * where raw vectors cannot.
  *
  * Queries score candidates with the asymmetric distance (ADC): one
  * m·k partial-distance table per query (tiny, broadcast), then one
  * table lookup + add per subspace per candidate — the codegen'd
  * PqAdcExpr — instead of a full dim-length arithmetic pass.
  *
  * Codebooks: deterministic seeds (subvectors of the first k vectors)
  * refined by `iters` Lloyd rounds: one broadcast-join assignment +
  * one primitive vector-sum pass ([[VectorAgg.sumByKey]], r17 — the
  * posexplode/avg form hash-aggregated N·dim exploded rows per
  * round) with the mean tree op-for-op. iters=0 (pure seeds) is the
  * SQL-oracle-able configuration; training is a front-loaded,
  * reusable artifact either way.
  *
  * All distance arithmetic is left-to-right f64 (L2SqExpr), matching
  * the DuckDB oracle's list_reduce bit-for-bit.
  */
object Pq {

  private def subCol(v: Column, s: Int, subDim: Int): Column =
    slice(transform(v, x => x.cast("double")), s * subDim + 1, subDim)

  /** (id, sub, sv) — every vector exploded into its m subvectors. */
  private def subvectors(
      emb: DataFrame,
      m: Int,
      subDim: Int,
      idCol: String,
      vecCol: String,
  ): DataFrame = {
    val subs = (0 until m).map(s => struct(lit(s).as("sub"), subCol(col(vecCol), s, subDim).as("sv")))
    emb
      .select(col(idCol).as("id"), explode(array(subs: _*)).as("x"))
      .select(col("id"), col("x.sub").as("sub"), col("x.sv").as("sv"))
  }

  /** Trains per-subspace codebooks.
    *
    * @return (sub, code, cv: array<double>) — m·k rows
    */
  def train(
      emb: DataFrame,
      m: Int = 8,
      k: Int = 16,
      iters: Int = 0,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): DataFrame = {
    val dim = emb.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    val sv = subvectors(emb, m, subDim, idCol, vecCol)
    val seed = sv
      .where(col("id") < k)
      .select(col("sub"), col("id").cast("int").as("code"), col("sv").as("cv"))
    (0 until iters).foldLeft(seed) { (cb, _) =>
      // the argmin agg is SLIM (id, sub, code, d — §6z byte rule: an
      // agg with array/typed buffers falls to sort-based execution
      // past 128 keys, and its sort must never carry the subvector
      // payload); sv re-joins by (id, sub) afterwards
      val winner = sv
        .join(broadcast(cb), "sub")
        .select(
          col("id"),
          col("sub"),
          col("code"),
          VectorExprs.l2sqNative(col("sv"), col("cv")).as("d"),
        )
        .groupBy(col("id"), col("sub"))
        .agg(graft.functions.OrderedAgg.firstByOrd(col("code"), col("d"), col("code")).as("code"))
      val assigned = sv.join(winner, Seq("id", "sub"))
      // codebook means via the primitive sum kernel (r17, same move
      // as Similarity.kmeansRound: the posexplode/avg form hash-
      // aggregated N·dim (key, pos, x) rows per iter). Key packs
      // (sub, code) — both in [0, m)×[0, k) by construction. The
      // mean Column tree (`Σ/n`, null where no non-null element)
      // matches avg op-for-op; m·k ≤ a few hundred keys, so the
      // driver buffers are KBs.
      val sums = VectorAgg.sumByKey(
        assigned.select((col("sub").cast("long") * k + col("code")).as("kk"), col("sv")))
      VectorAgg
        .sumsToDF(emb.sparkSession, sums)
        .select(
          floor(col("k") / k).cast("int").as("sub"),
          (col("k") % k).cast("int").as("code"),
          VectorAgg.meanCol(col("s"), col("c")).as("cv"),
        )
    }
  }

  /** Encodes every vector: (id, codes array<int> of length m). */
  def encode(
      emb: DataFrame,
      codebooks: DataFrame,
      m: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): DataFrame = {
    val dim = emb.select(size(col(vecCol))).head().getInt(0)
    val subDim = dim / m
    subvectors(emb, m, subDim, idCol, vecCol)
      .join(broadcast(codebooks), "sub")
      .withColumn("d", VectorExprs.l2sqNative(col("sv"), col("cv")))
      // deterministic tiebreak: smallest code
      .groupBy(col("id"), col("sub"))
      .agg(min_by(col("code"), struct(col("d"), col("code"))).as("code"))
      .groupBy(col("id"))
      .agg(
        transform(array_sort(collect_list(struct(col("sub"), col("code")))), s => s.getField("code"))
          .as("codes")
      )
  }

  /** ADC top-k: queries (id < nQueries, full vectors) against the
    * encoded corpus. Score = squared L2 estimate, ascending; ties on
    * (score, neighbor_id).
    */
  def adcTopK(
      emb: DataFrame,
      codebooks: DataFrame,
      codes: DataFrame,
      m: Int = 8,
      k: Int = 16,
      nQueries: Int = 10,
      topK: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): DataFrame = {
    val dim = emb.select(size(col(vecCol))).head().getInt(0)
    val subDim = dim / m
    // per-query flattened (sub × code) partial table, ordered by (sub, code)
    val tables = subvectors(emb.where(col(idCol) < nQueries), m, subDim, idCol, vecCol)
      .join(broadcast(codebooks), "sub")
      .withColumn("partial", VectorExprs.l2sqNative(col("sv"), col("cv")))
      .groupBy(col("id").as("query_id"))
      .agg(
        transform(
          array_sort(collect_list(struct(col("sub"), col("code"), col("partial")))),
          s => s.getField("partial"),
        ).as("tbl")
      )
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").asc, col("neighbor_id"))
    codes
      .join(broadcast(tables), lit(true))
      .where(col("id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("id").as("neighbor_id"),
        VectorExprs.pqAdcNative(col("codes"), col("tbl"), k).as("score"),
      )
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("score"))
  }

  /** ADC shortlist → exact rerank: the standard PQ deployment. The
    * compressed scan cuts the candidate set to `shortlist` per query
    * (the expensive part, done without touching raw vectors); only
    * the shortlist re-reads true embeddings for exact ordering. On
    * isotropic random data plain ADC ranking suffers distance
    * concentration (recall ~0.2 at m=8,k=16 — pinned honestly in the
    * spec); reranking restores recall while keeping the scan
    * compressed.
    */
  def topKReranked(
      emb: DataFrame,
      m: Int = 8,
      k: Int = 16,
      iters: Int = 0,
      nQueries: Int = 10,
      topKn: Int = 10,
      shortlist: Int = 100,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): DataFrame = {
    val cb = train(emb, m, k, iters, idCol, vecCol)
    val enc = encode(emb, cb, m, idCol, vecCol)
    val cand = adcTopK(emb, cb, enc, m, k, nQueries, shortlist, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"))
    val v = emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"))
    val q = emb
      .where(col(idCol) < nQueries)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").asc, col("neighbor_id"))
    cand
      .join(v, "neighbor_id")
      .join(broadcast(q), "query_id")
      .select(
        col("query_id"),
        col("neighbor_id"),
        VectorExprs.l2sqNative(col("qv"), col("nv")).as("score"),
      )
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= topKn)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("score"))
  }

  /** IVF-PQ: the composition a 100 TB ANN deployment actually runs.
    * IVF cells prune the candidate set to nProbe/nCells of the corpus
    * WITHOUT touching raw vectors (cell ids ride with the codes); PQ
    * ADC scores the survivors from compressed codes; only the final
    * shortlist reads true embeddings for exact ordering. Memory per
    * candidate during the scan: m bytes of codes + a cell id — the
    * raw vectors are read exactly shortlist·nQueries times.
    */
  def ivfPqTopK(
      emb: DataFrame,
      m: Int = 8,
      k: Int = 16,
      iters: Int = 1,
      nCells: Int = 16,
      nProbe: Int = 4,
      nQueries: Int = 10,
      topKn: Int = 10,
      shortlist: Int = 100,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): DataFrame = {
    val dim = emb.select(size(col(vecCol))).head().getInt(0)
    val subDim = dim / m
    // coarse quantizer: full-vector centroids (seeded, L2 assignment)
    val full = emb.select(
      col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"),
    )
    val cents = full.where(col("id") < nCells).select(col("id").cast("int").as("cent_id"), col("v").as("cv"))
    val assigned = full
      .join(broadcast(cents), lit(true))
      .withColumn("d", VectorExprs.l2sqNative(col("v"), col("cv")))
      .groupBy(col("id"))
      .agg(min_by(col("cent_id"), struct(col("d"), col("cent_id"))).as("cell"))
    // fine quantizer: PQ codes
    val cb = train(emb, m, k, iters, idCol, vecCol)
    val codes = encode(emb, cb, m, idCol, vecCol).join(assigned, "id")
    // queries probe their nProbe nearest cells
    val qProbe = full
      .where(col("id") < nQueries)
      .join(broadcast(cents), lit(true))
      .withColumn("d", VectorExprs.l2sqNative(col("v"), col("cv")))
      .withColumn(
        "r",
        row_number().over(Window.partitionBy(col("id")).orderBy(col("d").asc, col("cent_id"))),
      )
      .where(col("r") <= nProbe)
      .select(col("id").as("query_id"), col("cent_id").as("cell"))
    val tables = subvectors(emb.where(col(idCol) < nQueries), m, subDim, idCol, vecCol)
      .join(broadcast(cb), "sub")
      .withColumn("partial", VectorExprs.l2sqNative(col("sv"), col("cv")))
      .groupBy(col("id").as("query_id"))
      .agg(
        transform(
          array_sort(collect_list(struct(col("sub"), col("code"), col("partial")))),
          s => s.getField("partial"),
        ).as("tbl")
      )
    val wSl = Window.partitionBy(col("query_id")).orderBy(col("score").asc, col("neighbor_id"))
    val cand = codes
      .join(broadcast(qProbe), Seq("cell")) // cell-pruned candidates
      .join(broadcast(tables), "query_id")
      .where(col("id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("id").as("neighbor_id"),
        VectorExprs.pqAdcNative(col("codes"), col("tbl"), k).as("score"),
      )
      .withColumn("rnk", row_number().over(wSl))
      .where(col("rnk") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))
    // exact rerank of the shortlist
    val v = emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"))
    val q = emb.where(col(idCol) < nQueries).select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    cand
      .join(v, "neighbor_id")
      .join(broadcast(q), "query_id")
      .select(
        col("query_id"),
        col("neighbor_id"),
        VectorExprs.l2sqNative(col("qv"), col("nv")).as("score"),
      )
      .withColumn("rnk", row_number().over(wSl))
      .where(col("rnk") <= topKn)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("score"))
  }

  /** train + encode + search in one call (iters=0 = oracle form). */
  def topK(
      emb: DataFrame,
      m: Int = 8,
      k: Int = 16,
      iters: Int = 0,
      nQueries: Int = 10,
      topKn: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): DataFrame = {
    val cb = train(emb, m, k, iters, idCol, vecCol)
    val enc = encode(emb, cb, m, idCol, vecCol)
    adcTopK(emb, cb, enc, m, k, nQueries, topKn, idCol, vecCol)
  }
}
