package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range join: pairs (l, r) with matching `by` keys and
  * r.point in [l.start, l.end] — without the O(n²)-per-key cross
  * join a plain equi-join + BETWEEN filter degenerates into.
  *
  * Each left interval explodes into its covered fixed-width time
  * buckets (bounded by interval length / bucketWidth), the right side
  * maps to a single bucket, and the join runs on (by, bucket) — the
  * standard interval-join decomposition; fan-out is bounded by
  * interval length, so the plan survives any scale-up in row count.
  *
  * Used by Labels.tripleBarrier/barrierTouches (horizon-sized
  * buckets); public because every path/interval analysis at scale
  * needs exactly this shape.
  */
object RangeJoin {

  /** @param left        must contain `by`, `startCol`, `endCol` (timestamps)
    * @param right       must contain `by`, `pointCol` (timestamp)
    * @param bucketMicros bucket width; pick ~ the typical interval
    *                    length so left rows explode into ~2 buckets
    * @param inclusiveStart whether r.point == l.start matches
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      by: Seq[String],
      startCol: String,
      endCol: String,
      pointCol: String,
      bucketMicros: Long,
      inclusiveStart: Boolean = false,
  ): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    val lb = left.withColumn(
      "__b",
      explode(
        sequence(
          expr(s"unix_micros($startCol) div ${bucketMicros}L"),
          expr(s"unix_micros($endCol) div ${bucketMicros}L"),
        )
      ),
    )
    val rb = right.withColumn("__b", expr(s"unix_micros($pointCol) div ${bucketMicros}L"))
    val startCmp: Column =
      if (inclusiveStart) col(pointCol) >= col(startCol) else col(pointCol) > col(startCol)
    lb.join(rb, by :+ "__b")
      .where(startCmp && col(pointCol) <= col(endCol))
      .drop("__b")
  }
}
