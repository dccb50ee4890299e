package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.api.TradingCols

/** Event-time rolling features over trailing time windows
  * (RANGE frames on epoch-micros, per symbol): the declarative
  * formulation Catalyst evaluates incrementally in one pass per
  * partition — no self-join, no explode.
  */
object Rolling {

  /** Appends trailing-window features over the last `window`
    * (inclusive of the current tick):
    *  - rolling_vwap, rolling_mean_price, rolling_min/max, rolling_n
    */
  def features(
      df: DataFrame,
      window: String = "1 hour",
      c: TradingCols = TradingCols.default,
  ): DataFrame = {
    val micros = windowMicros(window)
    val w = Window
      .partitionBy(col(c.symbol))
      .orderBy(unix_micros(col(c.ts)))
      .rangeBetween(-micros, 0)
    df.withColumn("rolling_vwap", sum(col(c.price) * col(c.size)).over(w) / sum(col(c.size)).over(w))
      .withColumn("rolling_mean_price", avg(col(c.price)).over(w))
      .withColumn("rolling_min", min(col(c.price)).over(w))
      .withColumn("rolling_max", max(col(c.price)).over(w))
      .withColumn("rolling_n", count(lit(1)).over(w))
  }

  private[graft] def windowMicros(window: String): Long = {
    val parts = window.trim.split("\\s+")
    require(parts.length == 2, s"window must be '<n> <unit>', got $window")
    val n = parts(0).toLong
    val perUnit = parts(1).toLowerCase match {
      case u if u.startsWith("second") => 1000000L
      case u if u.startsWith("minute") => 60000000L
      case u if u.startsWith("hour")   => 3600000000L
      case u if u.startsWith("day")    => 86400000000L
      case u => throw new IllegalArgumentException(s"unsupported unit $u")
    }
    n * perUnit
  }
}
