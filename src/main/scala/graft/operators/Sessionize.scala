package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream: a new session starts
  * whenever a user's inter-event gap exceeds the threshold — the
  * standard clickstream/interaction-log grouping a training-data
  * pipeline applies before per-session feature extraction.
  *
  * Plan shape: one hash exchange on the user key, then two window
  * functions over the same (user, ts) sort — lag for the gap flag and
  * a running sum for the session index — so Catalyst plans a single
  * sort, no range exchange. Aggregates per session are integer-exact
  * (counts, micro timestamps, floor-cents sums), so results are
  * bit-stable across engines and thread counts.
  */
object Sessionize {

  /** Appends `session_idx` (0-based per user, in time order). */
  def assign(
      events: DataFrame,
      gap: Column = expr("INTERVAL 30 MINUTES"),
      userCol: String = "user_id",
      tsCol: String = "ts",
  ): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(prev.isNull || col(tsCol) > prev + gap, 1L).otherwise(0L)
    events
      .withColumn("__new", isNew)
      .withColumn("session_idx", sum(col("__new")).over(w) - 1L)
      .drop("__new")
  }

  /** Per-session aggregates over the assignment: bounds, event count,
    * distinct event types, and an exact floor-cents sum of `value`
    * (doubles are floored to integer cents BEFORE summing — the sum
    * is then associative, immune to aggregation-order drift).
    */
  def sessions(
      events: DataFrame,
      gap: Column = expr("INTERVAL 30 MINUTES"),
      userCol: String = "user_id",
      tsCol: String = "ts",
  ): DataFrame =
    assign(events, gap, userCol, tsCol)
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        min(col(tsCol)).as("ts_start"),
        max(col(tsCol)).as("ts_end"),
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_event_types"),
        sum(floor(col("value") * 100).cast("long")).as("value_cents"),
      )
}
