package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.TradingCols

/** Reference-shape benchmark: runs this engine's operators on the
  * exact scenarios polars-trading benchmarks itself on
  * (/root/reference/tests/benchmarks/ — n_rows × n_companies random
  * trade frames; params 1m time bars, 100-tick bars, 10k volume
  * bars, $1M dollar bars, frac_diff(0.5, 1e-3), daily_vol span 100,
  * fixed_time_return_classification(50, 0.2)).
  *
  * Data comes from tools/refbench_data.py (the reference fixture's
  * shape, parquet); the single-node baseline timings come from
  * tools/refbench_pd.py (the reference's own pandas twin
  * implementations — polars itself has no wheel in this offline
  * container). Each scenario is materialized through the noop sink,
  * best of 3 after one untimed warmup run.
  *
  * Usage: SPARK_GRAFT_REFBENCH_DIR=/tmp/graft_refbench \
  *   sbt "runMain graft.RefBench"   → one JSON line on stdout.
  */
object RefBench {

  private val cols = TradingCols(ts = "ts_event")

  private def scenarios(
      spark: SparkSession,
      dir: String,
      n: Long,
  ): Seq[(String, () => DataFrame)] = {
    // frac_diff/daily_vol: the pandas twins crash on duplicate
    // timestamps (certain at 1M second-resolution rows), so both
    // engines run those scenarios on the unique-microsecond variant
    def trades(c: Int, uniqueUs: Boolean = false) = {
      val suffix = if (uniqueUs && n > 100000L) "u" else ""
      spark.read.parquet(s"$dir/s${n}c$c$suffix/trades.parquet")
    }
    Seq(
      "time_bars" -> (() => operators.Bars.timeBars(trades(5), "1 minute", cols)),
      "tick_bars" -> (() => operators.Bars.tickBars(trades(5), 100, c = cols)),
      "volume_bars" -> (() => operators.Bars.volumeBars(trades(5), 10000L, c = cols)),
      "dollar_bars" -> (() => operators.Bars.dollarBars(trades(5), 1000000.0, c = cols)),
      "frac_diff" -> { () =>
        val t = trades(3, uniqueUs = true)
        t.select(
          col("ts_event"),
          col("symbol"),
          functions.FracDiff
            .fracDiff(
              col("price"),
              0.5,
              1e-3,
              Seq(col("symbol")),
              Seq(col("ts_event"), col("trade_id")),
            )
            .as("frac_diff"),
        )
      },
      "daily_vol" -> (() =>
        operators.Labels.dailyVol(trades(5, uniqueUs = true), span = 100, c = cols)),
      "fixed_time_return_class" -> (() =>
        operators.Labels
          .fixedTimeReturnClassification(trades(5), window = 50, threshold = Some(lit(0.2)), c = cols)),
    )
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_REFBENCH_DIR", "/tmp/graft_refbench")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sizes = sys.env
      .getOrElse("SPARK_GRAFT_REFBENCH_SIZES", "10000,1000000")
      .split(",")
      .map(_.trim.toLong)
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warmup (same rationale as Bench): aggregate + window
    // + sort shapes, untimed
    spark
      .range(0, 2000000, 1, 32)
      .selectExpr("id % 97 AS k", "cast(id AS double) AS v")
      .groupBy("k")
      .agg(avg("v"), sum("v"))
      .write
      .format("noop")
      .mode("overwrite")
      .save()
    spark
      .sql("""SELECT k, sum(v) OVER (PARTITION BY k ORDER BY id) AS c
             |FROM (SELECT id, id % 31 AS k, cast(id AS double) AS v
             |      FROM range(0, 300000)) ORDER BY k, c""".stripMargin)
      .write
      .format("noop")
      .mode("overwrite")
      .save()
    // SPARK_GRAFT_REFBENCH_ONLY=a,b: solo re-measure protocol (the
    // full-sweep per-scenario noise is ±20-30%; gate-adjacent numbers
    // get a quiet-box solo 3x before being believed)
    val only = sys.env.get("SPARK_GRAFT_REFBENCH_ONLY").map(_.split(",").map(_.trim).toSet)
    val results = scala.collection.mutable.LinkedHashMap[String, Map[String, Double]]()
    for ((name, mk) <- scenarios(spark, dir, sizes.head) if only.forall(_.contains(name))) {
      val bySize = scala.collection.mutable.LinkedHashMap[String, Double]()
      for (n <- sizes) {
        val mkN = scenarios(spark, dir, n).toMap.apply(name)
        def run(): Unit = mkN().write.format("noop").mode("overwrite").save()
        run() // untimed warmup
        val best = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          run()
          (System.nanoTime() - t0) / 1e9
        }.min
        bySize(n.toString) = math.round(best * 10000).toDouble / 10000
        System.err.println(s"$name n=$n: ${bySize(n.toString)}s")
      }
      results(name) = bySize.toMap
    }
    val json = results
      .map { case (k, v) =>
        val inner = v.map { case (s, t) => s""""$s":$t""" }.mkString(",")
        s""""$k":{$inner}"""
      }
      .mkString("{", ",", "}")
    println(json)
    spark.stop()
  }
}
