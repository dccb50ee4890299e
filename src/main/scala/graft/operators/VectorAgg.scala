package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Primitive-buffer per-key vector sums — the centroid-mean kernel
  * for the spherical k-means rounds ([[Similarity.kmeansRound]], the
  * two-level fine rounds, [[Pq.train]]'s codebook update).
  *
  * The form it replaces computed per-key per-dimension means by
  * `posexplode(nv)` → `groupBy(key, pos).avg(x)` → re-assemble:
  * N·d exploded (key, pos, x) rows through a hash aggregate — one
  * hash probe per ELEMENT, ~2×10⁹ rows per round at 2M×d512
  * (r16 verdict, the named 40-60 s/round buildIndex term). Here each
  * input ROW costs one hash probe and d primitive adds into a
  * per-key f64 buffer; partials merge via `treeAggregate`, so the
  * corpus is read once per round with NO shuffle and no exploded
  * rows. Per-partition accumulation is in row order — the same
  * per-group fold order as the hash aggregate's partial `avg` — and
  * the partial-merge order is runtime-dependent in both forms.
  *
  * Driver/executor memory is bounded by keys × dim × 16 B (sums +
  * counts): every caller is gated by [[VectorIndex.maxInlineCells]] /
  * [[VectorIndex.maxInlineBytes]] (≤ 65536 × 512 × 8 B = 256 MiB of
  * sums — the same budget as the inline centroid reference object);
  * past the gate callers keep the distributed posexplode form.
  *
  * Null/ragged semantics match the explode form exactly: a null key
  * or null vector contributes nothing (posexplode emits no rows); a
  * null ELEMENT occupies its position but is not summed or counted
  * (avg skips nulls — a position with only nulls yields a null mean);
  * a short vector contributes only to its own positions.
  */
object VectorAgg {

  /** Per-key sums: one entry per observed key, with per-position sums
    * and non-null counts. Arrays grow to the longest vector seen.
    */
  final class VecSum(var s: Array[Double], var c: Array[Long]) extends Serializable {
    def grow(d: Int): Unit = {
      if (d > s.length) {
        s = java.util.Arrays.copyOf(s, d)
        c = java.util.Arrays.copyOf(c, d)
      }
    }
  }

  /** Sums `df`'s second column (array&lt;float|double&gt;) per first
    * column (bigint key) into driver-local primitive buffers. One
    * pass over the plan's InternalRows — no boxing, no shuffle.
    */
  def sumByKey(df: DataFrame): scala.collection.mutable.LongMap[VecSum] = {
    val schema = df.schema
    require(schema.length == 2, s"sumByKey wants (key, vec), got ${schema.map(_.name)}")
    val isFloat = schema(1).dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, _) => true
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType, _) => false
      case t => throw new IllegalArgumentException(s"sumByKey vec column type $t")
    }
    val rdd = df.queryExecution.toRdd
    type M = scala.collection.mutable.LongMap[VecSum]
    val seqOp: (M, org.apache.spark.sql.catalyst.InternalRow) => M = { (m, row) =>
      if (!row.isNullAt(0) && !row.isNullAt(1)) {
        val k = row.getLong(0)
        val arr = row.getArray(1)
        val d = arr.numElements()
        val e = m.getOrElseUpdate(k, new VecSum(new Array[Double](d), new Array[Long](d)))
        e.grow(d)
        var i = 0
        while (i < d) {
          if (!arr.isNullAt(i)) {
            e.s(i) += (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
            e.c(i) += 1
          }
          i += 1
        }
      }
      m
    }
    val combOp: (M, M) => M = { (a, b) =>
      b.foreach { case (k, v) =>
        a.get(k) match {
          case None => a.update(k, v)
          case Some(e) =>
            e.grow(v.s.length)
            var i = 0
            while (i < v.s.length) { e.s(i) += v.s(i); e.c(i) += v.c(i); i += 1 }
        }
      }
      a
    }
    rdd.treeAggregate(new M)(seqOp, combOp)
  }

  /** The summed buffers as a driver-local (k, s, c) DataFrame, so the
    * final mean/normalize stays the SAME Column tree as the explode
    * form (`when(c = 0, null) otherwise s/c`, then √Σm² and the
    * per-element divide) — op-for-op, oracle-compatible.
    */
  def sumsToDF(
      spark: SparkSession,
      sums: scala.collection.mutable.LongMap[VecSum],
      keep: Long => Boolean = _ => true,
  ): DataFrame = {
    import spark.implicits._
    sums.iterator.collect { case (k, v) if keep(k) => (k, v.s, v.c) }.toSeq.toDF("k", "s", "c")
  }

  /** (k, s, c) → (k, mv): per-position mean, null where the position
    * had no non-null contributions — exactly the explode form's
    * `avg` semantics.
    */
  def meanCol(s: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    zip_with(s, c, (si, ci) => when(ci === 0L, lit(null)).otherwise(si / ci))

  /** Per-key `k` SMALLEST-id members with their vectors, one
    * primitive pass — the fine-seed rule (`row_number() over
    * (partition by coarse order by id) <= finePer`) without the
    * window's slim-label shuffle OR the broadcast re-join's second
    * corpus scan (together the largest stage of the r17 semantic-
    * dedup decomposition at 2M×d512). Exact: smallest ids are a
    * deterministic set; a vector is decoded only when it can enter
    * its key's bounded TreeMap (expected k·ln(n/k) inserts per key).
    * Rows with a null key or null vector are skipped (the window
    * form crashed on them at the seed collect).
    *
    * Returns (key, rank 0-based in ascending id, vector). Caller
    * gates memory: every partial holds ≤ keys × k × dim × 8 B.
    */
  def minKByKey(df: DataFrame, k: Int): Array[(Long, Int, Array[Double])] = {
    val schema = df.schema
    require(schema.length == 3, s"minKByKey wants (key, id, vec), got ${schema.map(_.name)}")
    val isFloat = schema(2).dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, _) => true
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType, _) => false
      case t => throw new IllegalArgumentException(s"minKByKey vec column type $t")
    }
    val rdd = df.queryExecution.toRdd
    type T = java.util.TreeMap[Long, Array[Double]]
    type M = scala.collection.mutable.LongMap[T]
    val seqOp: (M, org.apache.spark.sql.catalyst.InternalRow) => M = { (m, row) =>
      if (!row.isNullAt(0) && !row.isNullAt(2)) {
        val key = row.getLong(0)
        val id = row.getLong(1)
        val t = m.getOrElseUpdate(key, new T)
        if (t.size < k || id < t.lastKey()) {
          val arr = row.getArray(2)
          val d = arr.numElements()
          val a = new Array[Double](d)
          var i = 0
          while (i < d) {
            a(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
            i += 1
          }
          t.put(id, a)
          if (t.size > k) t.pollLastEntry()
        }
      }
      m
    }
    val combOp: (M, M) => M = { (x, y) =>
      y.foreach { case (key, t) =>
        x.get(key) match {
          case None => x.update(key, t)
          case Some(tx) =>
            val it = t.entrySet().iterator()
            while (it.hasNext) {
              val e = it.next()
              if (tx.size < k || e.getKey < tx.lastKey()) {
                tx.put(e.getKey, e.getValue)
                if (tx.size > k) tx.pollLastEntry()
              }
            }
        }
      }
      x
    }
    val m = rdd.treeAggregate(new M)(seqOp, combOp)
    m.iterator.flatMap { case (key, t) =>
      val it = t.entrySet().iterator()
      Iterator.tabulate(t.size()) { r => (key, r, it.next().getValue) }
    }.toArray
  }
}
