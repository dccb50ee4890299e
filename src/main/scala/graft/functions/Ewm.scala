package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Exponentially-weighted moving statistics.
  *
  * Matches pandas/polars semantics used by the reference's
  * `daily_vol` (/root/reference/polars_trading/labels/
  * dynamic_labels.py:64 `ewm_std(span)` and the pandas oracle
  * /root/reference/polars_trading/_testing/labels.py:4):
  * adjust=true, bias=false (unbiased), ignore_na=false (null rows
  * decay the weights of older observations), null input -> null
  * output, first observation -> 0.0 (polars convention, pinned by
  * the reference's weekend-returns test).
  *
  * The EWM recurrence is a linear scan that no window function
  * expresses; implemented as a streaming per-partition pass with
  * O(1) state after one hash repartition on the group keys — no
  * per-group materialization, so arbitrarily long histories stream.
  */
object Ewm {

  /** Appends `outCol` = EWM std of `valueCol` per `keyCols` group in
    * `orderCols` order.
    */
  def stdOverKey(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      span: Int,
      outCol: String,
  ): DataFrame = {
    require(span >= 1, "span must be >= 1")
    val alpha = 2.0 / (span + 1.0)
    val decay = 1.0 - alpha

    val sorted = df
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols ++ orderCols).map(col): _*)

    val schema = StructType(sorted.schema.fields :+ StructField(outCol, DoubleType, nullable = true))
    val keyIdx = keyCols.map(sorted.schema.fieldIndex)
    val valIdx = sorted.schema.fieldIndex(valueCol)

    sorted.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var sumW, sumWX, sumWX2, sumW2 = 0.0
      var nObs = 0L
      it.map { row =>
        val key = keyIdx.map(row.get)
        if (key != curKey) {
          curKey = key
          sumW = 0.0; sumWX = 0.0; sumWX2 = 0.0; sumW2 = 0.0; nObs = 0L
        }
        sumW *= decay; sumWX *= decay; sumWX2 *= decay; sumW2 *= decay * decay
        val out: Any =
          if (row.isNullAt(valIdx)) null
          else {
            val x = row.getDouble(valIdx)
            sumW += 1.0; sumWX += x; sumWX2 += x * x; sumW2 += 1.0; nObs += 1
            val mean = sumWX / sumW
            val varBiased = math.max(sumWX2 / sumW - mean * mean, 0.0)
            val denom = sumW * sumW - sumW2
            if (denom <= 0.0) 0.0
            else math.sqrt(varBiased * sumW * sumW / denom)
          }
        Row.fromSeq(row.toSeq :+ out)
      }
    }(Encoders.row(schema))
  }
}
