package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorExprs
import graft.operators.Pq

class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val nVecs = emb.count().toInt

  private def bruteForceL2(topK: Int = 10, nQueries: Int = 10) = {
    val v = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
    val q = v.where(col("id") < nQueries).select(col("id").as("query_id"), col("v").as("qv"))
    v.join(broadcast(q), col("id") =!= col("query_id"))
      .select(
        col("query_id"), col("id").as("neighbor_id"),
        VectorExprs.l2sqNative(col("qv"), col("v")).as("score"),
      )
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(col("score").asc, col("neighbor_id"))))
      .where(col("rnk") <= topK)
  }

  test("m=1, k=N degenerates to EXACT L2 search (ADC = true distance)") {
    val exact = bruteForceL2().select("query_id", "neighbor_id", "rnk", "score")
      .as[(Long, Long, Int, Double)].collect().sortBy(r => (r._1, r._3))
    val pq = Pq.topK(emb, m = 1, k = nVecs, iters = 0)
      .select("query_id", "neighbor_id", "rnk", "score")
      .as[(Long, Long, Int, Double)].collect().sortBy(r => (r._1, r._3))
    assert(pq.sameElements(exact)) // scores bit-equal, not just same ids
  }

  test("codes are m small ints, deterministic under repartitioning") {
    val cb = Pq.train(emb, m = 8, k = 16, iters = 1)
    val a = Pq.encode(emb, cb, m = 8).collect().map(r =>
      (r.getLong(0), r.getSeq[Int](1).toList)).sortBy(_._1)
    assert(a.forall { case (_, codes) => codes.length == 8 && codes.forall(c => c >= 0 && c < 16) })
    val b = Pq.encode(emb.repartition(7), cb, m = 8).collect().map(r =>
      (r.getLong(0), r.getSeq[Int](1).toList)).sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("Lloyd refinement does not increase quantization error") {
    def qError(iters: Int): Double = {
      val cb = Pq.train(emb, m = 8, k = 16, iters = iters)
      Pq.encode(emb, cb, m = 8) // reuse assignment machinery via explicit join
      // total min distance over all (vector, subspace) pairs
      val dim = 64; val subDim = dim / 8
      val sv = (0 until 8).map(s =>
        emb.select(col("vec_id").as("id"), lit(s).as("sub"),
          slice(transform(col("embedding"), x => x.cast("double")), s * subDim + 1, subDim).as("sv")))
        .reduce(_ union _)
      sv.join(broadcast(cb), "sub")
        .withColumn("d", VectorExprs.l2sqNative(col("sv"), col("cv")))
        .groupBy("id", "sub").agg(min("d").as("md"))
        .agg(sum("md")).head().getDouble(0)
    }
    val e0 = qError(0); val e2 = qError(2)
    assert(e2 <= e0 + 1e-9, s"iters=2 error $e2 vs iters=0 $e0")
  }

  test("rerank with shortlist=N reproduces exact L2 search bit-for-bit") {
    val exact = bruteForceL2().select("query_id", "neighbor_id", "rnk", "score")
      .as[(Long, Long, Int, Double)].collect().sortBy(r => (r._1, r._3))
    val rr = Pq.topKReranked(emb, m = 8, k = 16, iters = 0, shortlist = nVecs)
      .select("query_id", "neighbor_id", "rnk", "score")
      .as[(Long, Long, Int, Double)].collect().sortBy(r => (r._1, r._3))
    assert(rr.sameElements(exact))
  }

  test("recall@10 on clustered data (PQ's design regime) and honest isotropic floor") {
    // 20 well-separated centers + small noise: the structure real
    // embedding spaces have and PQ exploits
    val rng = new scala.util.Random(7)
    val centers = Array.fill(20, 64)(rng.nextGaussian() * 2.0)
    val rows = (0 until 500).map { i =>
      val c = centers(i % 20)
      (i.toLong, c.map(x => (x + rng.nextGaussian() * 0.15).toFloat).toSeq)
    }
    val cemb = rows.toDF("vec_id", "embedding")

    def recallOf(got: Array[(Long, Long)], truth: Map[Long, Set[Long]]): Double = {
      val g = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      truth.keys.toSeq.map(q => (g(q) & truth(q)).size.toDouble / truth(q).size).sum / truth.size
    }
    val v = cemb.select(col("vec_id").as("id"), col("embedding").as("v"))
    val q = v.where(col("id") < 10).select(col("id").as("query_id"), col("v").as("qv"))
    val truth = v.join(broadcast(q), col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        VectorExprs.l2sqNative(col("qv"), col("v")).as("score"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(col("score").asc, col("neighbor_id"))))
      .where(col("rnk") <= 10).select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    val clustered = recallOf(
      Pq.topKReranked(cemb, m = 8, k = 16, iters = 2, shortlist = 50)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect(),
      truth,
    )
    info(f"clustered-data reranked recall@10 = $clustered%.3f")
    assert(clustered >= 0.9, f"clustered recall $clustered%.3f")

    // isotropic gaussians are PQ's worst case (distance concentration)
    // — document the floor rather than hide it
    val isotropic = recallOf(
      Pq.topK(emb, m = 8, k = 16, iters = 2)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect(),
      bruteForceL2().select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap,
    )
    info(f"isotropic ADC recall@10 = $isotropic%.3f (distance concentration)")
    assert(isotropic >= 0.1)

    // IVF-PQ: cell pruning + ADC + rerank — the full composition.
    // On clustered data the probed cells contain the true cluster.
    val ivfpq = recallOf(
      Pq.ivfPqTopK(cemb, m = 8, k = 16, iters = 2, nCells = 16, nProbe = 4, shortlist = 50)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect(),
      truth,
    )
    info(f"IVF-PQ reranked recall@10 = $ivfpq%.3f")
    assert(ivfpq >= 0.85, f"IVF-PQ recall $ivfpq%.3f")
  }
}
