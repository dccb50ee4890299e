package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (ANN) over an Array[Float] column.
  *
  * Float arithmetic is order-pinned: dot products accumulate
  * left-to-right in double precision in both Spark (aggregate over
  * zip_with) and the DuckDB oracle (list_reduce over list_transform),
  * so scores — and therefore top-k membership and LSH sign bits —
  * are bit-identical across engines.
  *
  * Scale notes (100 TB): brute force is the correctness baseline and
  * is O(Q·N) with the query side broadcast; the LSH path buckets both
  * sides map-side (random-hyperplane signs, planes derived from md5
  * so the oracle replays them) and joins per bucket, pruning the
  * candidate set by ~2^nPlanes.
  */
object Similarity {

  /** Deterministic ±1 hyperplane weights: plane j, dim k is +1 iff
    * the first hex nibble of md5("p{j}_{k}") is < 8. Reproducible in
    * any engine with md5.
    */
  def planeWeights(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    val mdig = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nPlanes, dim) { (j, k) =>
      val h = mdig.digest(s"p${j}_${k}".getBytes("UTF-8"))
      if (((h(0) >> 4) & 0xf) < 8) 1.0 else -1.0
    }
  }

  /** Left-to-right f64 dot product of two array columns — native
    * codegen'd expression (graft.functions.DotProductExpr); the
    * equivalent HOF form `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
    * produces identical doubles but runs ~1000x slower interpreted.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExprs.dotNative(a, b)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** f64-normalized copy of a vector column (norm computed once per
    * row, not per element). Cosine of normalized vectors = plain dot
    * — 3x fewer dot products in pair joins.
    */
  private def withNormalized(df: DataFrame, vecCol: String, outCol: String): DataFrame =
    df.withColumn("__nrm", sqrt(dot(col(vecCol), col(vecCol))))
      .withColumn(outCol, transform(col(vecCol), x => x.cast("double") / col("__nrm")))
      .drop("__nrm")

  /** Plain f64 dot for already-normalized vectors (same native
    * expression; float/double element types are handled per side).
    */
  def dotNorm(a: Column, b: Column): Column =
    graft.functions.VectorExprs.dotNative(a, b)

  /** Random-hyperplane LSH bucket id in [0, 2^nPlanes). */
  def lshBucket(v: Column, nPlanes: Int, dim: Int): Column = {
    val w = planeWeights(nPlanes, dim)
    val bits = (0 until nPlanes).map { j =>
      val wj = array(w(j).map(lit): _*)
      when(dot(v, wj) > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduceLeft(_ + _)
  }

  /** Multi-table LSH buckets: table t uses planes
    * [t*nPlanes, (t+1)*nPlanes) of the shared deterministic plane
    * pool. Union-of-tables candidate retrieval is what makes
    * hyperplane LSH usable on uniform data — single-table recall
    * decays as (1 - p^planes).
    */
  def lshBuckets(v: Column, nTables: Int, nPlanes: Int, dim: Int): Column = {
    val w = planeWeights(nTables * nPlanes, dim)
    val buckets = (0 until nTables).map { t =>
      (0 until nPlanes)
        .map { j =>
          val wj = array(w(t * nPlanes + j).map(lit): _*)
          when(dot(v, wj) > 0, lit(1L << j)).otherwise(lit(0L))
        }
        .reduceLeft(_ + _)
    }
    array(buckets: _*)
  }

  /** Brute-force top-k cosine neighbors for each query vector
    * (queries = the first `nQueries` vec_ids; self-matches excluded).
    * The query side is broadcast — the big side streams map-side.
    */
  def bruteForceTopK(
      emb: DataFrame,
      nQueries: Int = 10,
      k: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): DataFrame = {
    val q = emb
      .where(col(idCol) < nQueries)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = emb
      .join(broadcast(q), col(idCol) =!= col("query_id"))
      .withColumn("score", cosine(col("qv"), col(vecCol)))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col(idCol))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("rank"), col("score"))
  }

  /** Multi-table-LSH top-k: identical contract to bruteForceTopK but
    * only scores candidates sharing a bucket with the query in at
    * least one table. Candidate fraction ≈ 1-(1-2^-planes)^tables of
    * the corpus; recall rises with tables.
    */
  def lshTopK(
      emb: DataFrame,
      nQueries: Int = 10,
      k: Int = 10,
      nTables: Int = 4,
      nPlanes: Int = 4,
      dim: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): DataFrame = {
    val tb = withNormalized(emb, vecCol, "__v")
      .select(
        col(idCol),
        col("__v"),
        posexplode(lshBuckets(col(vecCol), nTables, nPlanes, dim)).as(Seq("tbl", "bucket")),
      )
    val q = tb
      .where(col(idCol) < nQueries)
      .select(col(idCol).as("query_id"), col("__v").as("qv"), col("tbl"), col("bucket"))
    // score at match time (cheap with the native dot), then dedup the
    // (query, neighbor) pairs that matched in several tables — avoids
    // shuffling vector payloads through the dedup exchange
    val scored = tb
      .join(broadcast(q), Seq("tbl", "bucket"))
      .where(col(idCol) =!= col("query_id"))
      .withColumn("s", dotNorm(col("qv"), col("__v")))
      .groupBy(col("query_id"), col(idCol).as("neighbor_id"))
      .agg(first(col("s")).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("score"))
  }

  /** IVF (inverted-file) ANN: vectors are assigned to the cell of
    * their nearest centroid; a query probes its `nProbe` closest
    * cells and ranks only those candidates. Centroid "training" is
    * deterministic seed-selection (the first `nCells` vectors) — the
    * assignment/probe machinery is the real scale path (a k-means
    * refinement would only change the centroid table). Candidate
    * fraction ≈ nProbe/nCells of the corpus.
    */
  def ivfTopK(
      emb: DataFrame,
      nQueries: Int = 10,
      k: Int = 10,
      nCells: Int = 16,
      nProbe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): DataFrame = {
    val nv = withNormalized(emb.select(col(idCol).as("id"), col(vecCol).as("v")), "v", "nv")
      .select(col("id"), col("nv"))
    val cents = nv.where(col("id") < nCells).select(col("id").as("cent_id"), col("nv").as("cv"))
    // cell assignment: nearest centroid by cosine (deterministic
    // tiebreak on centroid id)
    val wAssign = Window.partitionBy(col("id")).orderBy(col("cs").desc, col("cent_id"))
    val assigned = nv
      .join(broadcast(cents), lit(true))
      .withColumn("cs", dotNorm(col("nv"), col("cv")))
      .withColumn("r", row_number().over(wAssign))
      .where(col("r") === 1)
      .select(col("id"), col("nv"), col("cent_id").as("cell"))
    // queries probe their nProbe nearest cells
    val qProbe = nv
      .where(col("id") < nQueries)
      .join(broadcast(cents), lit(true))
      .withColumn("cs", dotNorm(col("nv"), col("cv")))
      .withColumn("r", row_number().over(Window.partitionBy(col("id")).orderBy(col("cs").desc, col("cent_id"))))
      .where(col("r") <= nProbe)
      .select(col("id").as("query_id"), col("nv").as("qv"), col("cent_id").as("cell"))
    val wRank = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    assigned
      .join(broadcast(qProbe), Seq("cell"))
      .where(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"), dotNorm(col("qv"), col("nv")).as("score"))
      .withColumn("rnk", row_number().over(wRank))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("score"))
  }

  /** Embedding near-duplicate pairs: sharing an LSH bucket in any
    * table and cosine above `threshold`.
    */
  def cosinePairs(
      emb: DataFrame,
      threshold: Double = 0.9,
      nTables: Int = 4,
      nPlanes: Int = 4,
      dim: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): DataFrame = {
    val tb = withNormalized(emb.select(col(idCol).as("id"), col(vecCol).as("v")), "v", "nv")
      .select(col("id"), col("nv"), posexplode(lshBuckets(col("v"), nTables, nPlanes, dim)).as(Seq("tbl", "bucket")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    tb.count() // eager: both self-join sides must hit the cache
    tb.as("a")
      .join(
        tb.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"),
      )
      .withColumn("s", dotNorm(col("a.nv"), col("b.nv")))
      .where(col("s") >= threshold)
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(first(col("s")).as("score"))
      .select(col("id_a"), col("id_b"), col("score"))
  }
}
