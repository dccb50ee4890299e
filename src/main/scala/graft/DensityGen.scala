package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tick-DENSITY scale generator: N× the events table with the copies
  * packed into the SAME (symbol, day) windows, not day-shifted like
  * [[ScaleGen]] (whose copies grow the chunk axis at constant
  * per-chunk density).
  *
  * This is the scale axis that breaks pair-materializing plans: an
  * event×path interval join grows O(density²·days) pair rows, while
  * chunked scans grow O(density·days·log). A liquid symbol at 100 TB
  * is exactly this shape — more ticks per horizon window, not more
  * calendar.
  *
  * Copy i of a tick: event_id shifted by i·(maxId+1); ts shifted by
  * i microseconds (same day, sub-tick interleave); price perturbed a
  * few deterministic cents so price structure does not degenerate
  * into exact duplicates. Only events.parquet is written — the bar /
  * label / microstructure benches read nothing else.
  *
  * Usage: runMain graft.DensityGen <srcSfDir> <dstDir> [copies=10]
  */
object DensityGen {

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$src/events.parquet")
    val ev: DataFrame = raw.withColumn("ts", graft.sources.TradeData.normalizeTs(raw))
    val maxEvId = ev.agg(max("event_id")).head().getLong(0) + 1
    val out = (0 until copies)
      .map { i =>
        ev.withColumn("event_id", col("event_id") + lit(i * maxEvId))
          .withColumn("ts", timestamp_micros(unix_micros(col("ts")) + lit(i.toLong)))
          .withColumn(
            "value",
            // copy 0 is the unperturbed base; each other copy gets a
            // DISTINCT whole-cent shift (i·$0.01) so no two copies
            // share a price path (an i%k scheme collides at copies>k
            // and re-creates the exact-duplicate structure this
            // perturbation exists to avoid). Prices <= $0.10 are left
            // alone (sf0.1 has $0.01 ticks; shifts stay positive).
            when(col("value").isNotNull && col("value") > 0.1 && lit(i) > 0,
              col("value") + lit(i * 0.01)).otherwise(col("value")),
          )
      }
      .reduce(_ unionByName _)
    out.write.mode("overwrite").parquet(s"$dst/events.parquet")
    val n = spark.read.parquet(s"$dst/events.parquet").count()
    println(s"[densitygen] wrote $n events to $dst (copies=$copies)")
    spark.stop()
  }
}
