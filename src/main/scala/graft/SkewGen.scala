package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hot-key skew generator (round-12 task): an sf1-scale events table
  * where ONE symbol carries ~50% of all ticks — the stress shape for
  * the per-symbol-sequential operators (adaptive imbalance bars,
  * CUSUM, run bars serialize a symbol's history through one core;
  * the (symbol, day)-chunked operators must NOT care).
  *
  * Construction mirrors ScaleGen's events transform (id shift +
  * copy × 64-day time shift, micros timestamps) with `hotCopies` of
  * the `copies` remapping every symbol to the single "HOTKEY"
  * event_type — so the hot symbol has |symbols|× the per-day tick
  * density of a normal one, over the same number of days, which is
  * exactly the axis the chunked scans parallelize on.
  *
  * Usage: runMain graft.SkewGen <srcSfDir> <dstDir> [copies=10] [hot=5]
  */
object SkewGen {

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val hot = if (args.length > 3) args(3).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val evRaw = spark.read.parquet(s"$src/events.parquet")
    val ev = evRaw.withColumn("ts", graft.sources.TradeData.normalizeTs(evRaw))
    val maxEvId = ev.agg(max("event_id")).head().getLong(0) + 1
    val dayMicros = 86400000000L
    val out = (0 until copies)
      .map { i =>
        val shifted = ev
          .withColumn("event_id", col("event_id") + lit(i * maxEvId))
          .withColumn("ts", timestamp_micros(unix_micros(col("ts")) + lit(i.toLong * 64L * dayMicros)))
        if (i >= 1 && i <= hot) shifted.withColumn("event_type", lit("HOTKEY"))
        else shifted
      }
      .reduce(_ unionByName _)
    out.write.mode("overwrite").parquet(s"$dst/events.parquet")
    val stats = spark.read
      .parquet(s"$dst/events.parquet")
      .groupBy(col("event_type"))
      .count()
      .orderBy(col("count").desc)
      .limit(3)
      .collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}")
      .mkString(", ")
    System.err.println(s"[skewgen] top symbols: $stats")
    spark.stop()
  }
}
