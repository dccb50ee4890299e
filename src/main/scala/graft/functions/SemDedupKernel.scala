package graft.functions

/** The in-memory SemDeDup cell kernel shared by
  * [[SemDedupCellExpr]] (the collect_list aggregation form) and
  * [[graft.operators.Similarity.cellDedupScores]]'s streamed form
  * (repartition + sortWithinPartitions + per-cell grouping): decode
  * rules, normalization arithmetic, candidate ordering, and verdict
  * comparisons live HERE once, so the two physical shapes are
  * bit-identical by construction (pinned in ScalaTest either way).
  */
object SemDedupKernel {

  /** [[NormalizeExpr]]'s exact arithmetic: f64 Σx² left-to-right,
    * per-element /√. In place.
    */
  def normalizeInPlace(arr: Array[Double]): Unit = {
    var s2 = 0.0
    var k = 0
    while (k < arr.length) { val x = arr(k); s2 += x * x; k += 1 }
    val nrm = math.sqrt(s2)
    k = 0
    while (k < arr.length) { arr(k) = arr(k) / nrm; k += 1 }
  }

  /** Verdicts for one cell. `vecs(i) == null` marks a NON-SCORING
    * member (null vector or null element upstream): excluded from
    * every candidate set; a keeper verdict if `neu`. Members are
    * processed in ascending-id order — member b's candidates are
    * exactly the lower-id members, the join form's `a.id < b.id`.
    *
    * Output arrays are parallel over the first `nOut` entries;
    * `found(j)` false ⇒ keeper (dupOf/maxSim unset). A separate
    * found flag, never an id sentinel: negative member ids are legal
    * dup_of values (r16 advice).
    */
  final class CellVerdicts(cap: Int) {
    var nOut: Int = 0
    val ids = new Array[Long](cap)
    val found = new Array[Boolean](cap)
    val dupOf = new Array[Long](cap)
    val maxSim = new Array[Double](cap)
  }

  def verdicts(
      ids: Array[Long],
      neu: Array[Boolean],
      vecs: Array[Array[Double]],
      n: Int,
      threshold: Double,
  ): CellVerdicts = {
    val ord = new Array[Int](n)
    var i = 0
    while (i < n) { ord(i) = i; i += 1 }
    // sort positions by member id (boxing-free insertion would be
    // overkill: n is one cell)
    val ordBoxed = ord.take(n).sortBy(ids(_))
    val out = new CellVerdicts(n)
    var bi = 0
    while (bi < n) {
      val b = ordBoxed(bi)
      if (neu(b)) {
        val vb = vecs(b)
        var f = false
        var dOf = 0L
        var mSim = 0.0
        var ai = 0
        while (ai < bi && vb != null) {
          val a = ordBoxed(ai)
          val va = vecs(a)
          if (va != null) {
            val d = math.min(va.length, vb.length)
            var s = 0.0
            var k = 0
            while (k < d) { s += va(k) * vb(k); k += 1 }
            // Spark SQL comparison/max semantics: NaN is larger than
            // any value and qualifies — degenerate (zero-norm)
            // vectors behave exactly as in the join form
            if (s >= threshold || java.lang.Double.isNaN(s)) {
              if (!f) { f = true; dOf = ids(a); mSim = s } // first hit = min id
              else if (s > mSim || java.lang.Double.isNaN(s)) mSim = s
            }
          }
          ai += 1
        }
        val j = out.nOut
        out.ids(j) = ids(b)
        out.found(j) = f
        out.dupOf(j) = dOf
        out.maxSim(j) = mSim
        out.nOut = j + 1
      }
      bi += 1
    }
    out
  }
}
