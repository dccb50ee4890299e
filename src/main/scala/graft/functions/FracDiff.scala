package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-window fractional differentiation (FFD, AFML ch.5).
  *
  * Matches the reference kernel (/root/reference/src/frac_diff.rs:7):
  * weights w_0 = 1, w_k = -w_{k-1} * (d - k + 1) / k until
  * |w_k| < threshold; output_i = Σ_k w_k * price_{i-k}, null while
  * fewer than n_w prices precede.
  *
  * The weight vector is data-independent and tiny (d=0.5, 1e-3 →
  * ~30 weights), so it is computed on the driver and inlined as
  * literals into a codegen'd Σ w_k·lag_k window expression — one
  * shuffle on the partition keys, no sequential kernel.
  */
object FracDiff {

  def weights(d: Double, threshold: Double): Array[Double] = {
    val buf = scala.collection.mutable.ArrayBuffer(1.0)
    var k = 1.0
    var wk = -buf.last / k * (d - k + 1.0)
    while (math.abs(wk) >= threshold) {
      buf += wk
      k += 1.0
      wk = -buf.last / k * (d - k + 1.0)
    }
    buf.toArray // w(k) multiplies lag k (reference reverses instead and dots ascending windows)
  }

  /** frac_diff of `value` over a per-`partitionCols` time ordering. */
  def fracDiff(
      value: Column,
      d: Double,
      threshold: Double,
      partitionCols: Seq[Column],
      orderCols: Seq[Column],
  ): Column = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
    val ws = weights(d, threshold)
    val terms = ws.zipWithIndex.map { case (wk, k) =>
      if (k == 0) lit(wk) * value else lit(wk) * lag(value, k).over(w)
    }
    val dot = terms.reduceLeft(_ + _)
    when(row_number().over(w) >= ws.length, dot)
  }

  /** The same dot product as ANSI SQL for the DuckDB oracle, with the
    * identical weight literals and left-to-right addition order so
    * float results are bit-identical.
    */
  def oracleSqlExpr(
      valueCol: String,
      d: Double,
      threshold: Double,
      partitionBy: String,
      orderBy: String,
  ): String = {
    val ws = weights(d, threshold)
    val over = s"OVER (PARTITION BY $partitionBy ORDER BY $orderBy)"
    val terms = ws.zipWithIndex.map { case (wk, k) =>
      if (k == 0) s"($wk) * $valueCol"
      else s"($wk) * lag($valueCol, $k) $over"
    }
    s"CASE WHEN row_number() $over >= ${ws.length} THEN ${terms.mkString(" + ")} END"
  }
}
