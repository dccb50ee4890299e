package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Similarity, VectorIndex}

class VectorIndexSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def tempStore(): String =
    java.nio.file.Files.createTempDirectory("graft-vidx-spec").toString

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  // B1 holds every id below the split, so the one-shot union seeds
  // (its 16 smallest ids) all lie in B1 and the frozen store
  // centroids EQUAL the one-shot's — the exactness contract's
  // precondition (see VectorIndex scaladoc)
  private val split = 80L

  test("incremental semantic dedup == one-shot over the union, restricted to the new batch") {
    val store = tempStore()
    VectorIndex.buildIndex(emb.where(col("vec_id") < split), store, nCells = 16, kmeansIters = 0)
    val incr = VectorIndex
      .incrementalSemanticDedup(spark, store, emb.where(col("vec_id") >= split), threshold = 0.3)
      .orderBy(col("vec_id"))
    val oneShot = Similarity
      .semanticDedup(emb, threshold = 0.3, nCells = 16, kmeansIters = 0)
      .where(col("vec_id") >= split)
      .orderBy(col("vec_id"))
    val a = rows(incr)
    val b = rows(oneShot)
    assert(a.nonEmpty && a == b) // bit-equal cells, dup_of and cosines
  }

  test("chained append: increment after appendIndex still equals the one-shot union") {
    val store = tempStore()
    val mid = 40L
    VectorIndex.buildIndex(emb.where(col("vec_id") < mid), store, nCells = 16, kmeansIters = 0)
    VectorIndex
      .appendIndex(spark, store, emb.where(col("vec_id") >= mid && col("vec_id") < split))
    val incr = VectorIndex
      .incrementalSemanticDedup(spark, store, emb.where(col("vec_id") >= split), threshold = 0.3)
      .orderBy(col("vec_id"))
    val oneShot = Similarity
      .semanticDedup(emb, threshold = 0.3, nCells = 16, kmeansIters = 0)
      .where(col("vec_id") >= split)
      .orderBy(col("vec_id"))
    assert(rows(incr) == rows(oneShot))
  }

  test("appended vectors land in the frozen-centroid cells (store == one-shot assignment)") {
    val store = tempStore()
    VectorIndex.buildIndex(emb.where(col("vec_id") < split), store, nCells = 16, kmeansIters = 0)
    VectorIndex.appendIndex(spark, store, emb.where(col("vec_id") >= split))
    val stored = spark.read
      .parquet(s"$store/vectors")
      .select(col("id"), col("cell").cast("long").as("cell"))
    val expected = Similarity
      .semanticDedup(emb, threshold = 0.3, nCells = 16, kmeansIters = 0)
      .select(col("vec_id").as("id"), col("cell"))
    assert(stored.count() == emb.count())
    assert(rows(stored.orderBy("id")) == rows(expected.orderBy("id")))
    // the layout a probe can prune: one directory per cell
    val dirs = new java.io.File(s"$store/vectors").listFiles().filter(_.isDirectory)
    assert(dirs.nonEmpty && dirs.forall(_.getName.startsWith("cell=")))
  }

  test("incremental top-k: ranks dense 1..k, scores non-increasing, deterministic") {
    val store = tempStore()
    VectorIndex.buildIndex(emb.where(col("vec_id") < split), store, nCells = 16, kmeansIters = 0)
    val run1 = VectorIndex
      .incrementalTopK(spark, store, emb.where(col("vec_id") >= split), nQueries = 5, k = 7, nProbe = 4)
      .orderBy(col("query_id"), col("rnk"))
    val r1 = rows(run1)
    assert(r1.nonEmpty)
    // queries are the 5 smallest new-batch ids
    val qids = r1.map(_.head.asInstanceOf[Long]).distinct.sorted
    assert(qids == (split until split + 5).toSeq)
    r1.groupBy(_.head).foreach { case (_, g) =>
      val ranks = g.map(_(2).asInstanceOf[Int])
      assert(ranks == (1 to ranks.max).toList)
      val scores = g.sortBy(_(2).asInstanceOf[Int]).map(_(3).asInstanceOf[Double])
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
    }
    val run2 = VectorIndex
      .incrementalTopK(spark, store, emb.where(col("vec_id") >= split), nQueries = 5, k = 7, nProbe = 4)
      .orderBy(col("query_id"), col("rnk"))
    assert(r1 == rows(run2))
  }

  test("maintainIndex: splits only oversized cells, preserves every vector, argmax children") {
    val store = tempStore()
    VectorIndex.buildIndex(emb, store, nCells = 4, kmeansIters = 0)
    val before = rows(
      spark.read.parquet(s"$store/vectors")
        .select(col("id"), col("cell").cast("long"), col("nv")).orderBy("id"))
    val centsBefore = rows(spark.read.parquet(s"$store/centroids").orderBy("cent_id"))

    // a huge threshold is a no-op: empty report, store untouched
    val noop = VectorIndex.maintainIndex(spark, store, splitFactor = 1e9)
    assert(noop.count() == 0)
    assert(before == rows(
      spark.read.parquet(s"$store/vectors")
        .select(col("id"), col("cell").cast("long"), col("nv")).orderBy("id")))
    assert(centsBefore == rows(spark.read.parquet(s"$store/centroids").orderBy("cent_id")))

    // split anything above 1.01x the mean (real data is never flat)
    val report = VectorIndex.maintainIndex(spark, store, splitFactor = 1.01, kmeansIters = 1)
    val rep = report.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rep.nonEmpty, "expected at least one oversized cell on the test corpus")
    val splitCells = rep.map(_._1).toSet

    val after = spark.read.parquet(s"$store/vectors")
      .select(col("id"), col("cell").cast("long").as("cell"), col("nv"))
    // every vector survives, exactly once, nv untouched
    assert(rows(after.select(col("id"), col("nv")).orderBy("id")) ==
      before.map(r => Seq(r(0), r(2))))
    // untouched cells keep their assignment
    val beforeCell = before.map(r => r(0).asInstanceOf[Long] -> r(1).asInstanceOf[Long]).toMap
    val afterCell = rows(after.select(col("id"), col("cell")))
      .map(r => r(0).asInstanceOf[Long] -> r(1).asInstanceOf[Long]).toMap
    beforeCell.foreach { case (id, c) =>
      if (!splitCells.contains(c)) assert(afterCell(id) == c, s"vector $id moved from intact cell $c")
    }
    // split members land on the argmax child (smallest-id tiebreak)
    val cents = spark.read.parquet(s"$store/centroids").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // children of a parent = its new cells (parent id reused + fresh ids)
    val childrenOf = splitCells.map { pc =>
      pc -> afterCell.collect { case (id, c) if beforeCell(id) == pc => c }.toSet
    }.toMap
    val nvOf = before.map(r => r(0).asInstanceOf[Long] -> r(2).asInstanceOf[scala.collection.Seq[Double]]).toMap
    rep.foreach { case (pc, n, k) =>
      assert(childrenOf(pc).size <= k && childrenOf(pc).nonEmpty)
      assert(n == beforeCell.values.count(_ == pc))
    }
    beforeCell.foreach { case (id, pc) =>
      if (splitCells.contains(pc)) {
        val kids = childrenOf(pc).toSeq.sorted
        val v = nvOf(id)
        def cos(c: Long): Double = cents(c).zip(v).map { case (a, b) => a * b }.sum
        val best = kids.maxBy(c => (cos(c), -c))
        assert(afterCell(id) == best, s"vector $id: expected child $best, got ${afterCell(id)}")
      }
    }
    // the index still serves probes against the refined centroid set
    val tk = VectorIndex.incrementalTopK(
      spark, store, emb.limit(0).unionByName(emb.where(col("vec_id") >= 95)),
      nQueries = 3, k = 5, nProbe = 3)
    assert(tk.count() > 0)
  }

  test("rewriteSplitPartitions: a parent cell winning zero members is dropped from disk") {
    // the k-means empty-cluster case (r12 advice): dynamic partition
    // overwrite never touches a partition it gets no rows for, so a
    // parent id with zero final members would keep its OLD vectors on
    // disk (stale duplicates of the reassigned copies) unless the
    // rewrite explicitly drops it
    val store = tempStore()
    VectorIndex.buildIndex(emb, store, nCells = 4, kmeansIters = 0)
    val vecs = spark.read.parquet(s"$store/vectors")
      .select(col("id"), col("nv"), col("cell").cast("long").as("cell"))
      .localCheckpoint()
    val total = vecs.count()
    val cells = vecs.select("cell").distinct().collect().map(_.getLong(0)).sorted
    val parent = cells.head
    val fresh = cells.max + 1L
    // simulate the empty-parent outcome: every member of `parent`
    // reassigns to a FRESH child id; the parent id receives none
    val reassigned = vecs
      .where(col("cell") === parent)
      .select(col("id"), col("nv"), lit(fresh).as("cell"))
      .localCheckpoint()
    val stale = VectorIndex.rewriteSplitPartitions(spark, store, reassigned, Set(parent))
    assert(stale == Set(parent), "empty parent not reported stale")
    // r13 advice: the delete is deferred until after the centroid
    // commit — between the two calls the parent dir must still exist
    // (a crash there leaves duplicate-but-reachable rows, not lost
    // vectors)
    assert(
      new java.io.File(s"$store/vectors/cell=$parent").exists(),
      "parent partition deleted before the centroid commit window",
    )
    VectorIndex.deleteStaleParents(spark, store, stale)
    val after = spark.read.parquet(s"$store/vectors")
      .select(col("id"), col("cell").cast("long").as("cell"))
    assert(after.where(col("cell") === parent).count() == 0, "stale parent rows survived")
    assert(after.groupBy("id").count().where(col("count") > 1).count() == 0, "duplicate ids")
    assert(after.count() == total)
    assert(
      !new java.io.File(s"$store/vectors/cell=$parent").exists(),
      "stale parent partition directory survived",
    )
  }

  test("in-memory cell dedup is bit-equal to the pair-join form it replaced (r16, rows 20b/20c)") {
    import spark.implicits._
    // clustered corpus with planted near-dups so dup_of/max_sim are
    // really exercised (several per cell, cross-cluster keepers)
    val dim = 48
    val rnd = new scala.util.Random(7)
    val bases = Array.fill(12)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 600).map { i =>
      val b = bases(i % 12)
      val v = b.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
      (i.toLong, v)
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val res = Similarity
      .semanticDedup(emb, threshold = 0.9, nCells = 8, kmeansIters = 1)
      .localCheckpoint()
    assert(res.where(col("is_dup") === 1).count() > 50, "needs real dup mass to be a meaningful pin")
    // reference: the ORIGINAL pair self-join over the same assignment
    // (taken from the output's own cell column) — scores, dup_of and
    // max_sim must match bit-for-bit, not approximately
    val nv = emb.select(
      col("vec_id").as("id"),
      graft.functions.VectorExprs.normalizeNative(col("embedding")).as("nv"),
    )
    val assigned = res.select(col("vec_id").as("id"), col("cell")).join(nv, "id")
    val dups = assigned
      .as("a")
      .join(assigned.as("b"), col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .withColumn("s", graft.functions.VectorExprs.dotNative(col("a.nv"), col("b.nv")))
      .where(col("s") >= 0.9)
      .groupBy(col("b.id").as("id"))
      .agg(min(col("a.id")).as("dup_of"), max(col("s")).as("max_sim"))
    val ref = assigned
      .join(dups, Seq("id"), "left")
      .select(
        col("id").as("vec_id"),
        col("cell"),
        col("dup_of").isNotNull.cast("int").as("is_dup"),
        col("dup_of"),
        col("max_sim"),
      )
    assert(rows(res.orderBy("vec_id")) == rows(ref.orderBy("vec_id")))
  }
}
