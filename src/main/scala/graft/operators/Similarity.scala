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
