package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.FracDiff
import graft.operators.{Bars, Labels}
import graft.sources.TradeData

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) / §7 (plan).
  *
  * Every query's output is deterministic: explicit ordering with
  * tiebreaks, timestamps exposed as epoch-micros BIGINT, and integer
  * arithmetic for anything that decides grouping, so the DuckDB
  * oracle hash-matches bit-for-bit on discrete columns.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("time_bars")(spark, "/root/testdata/sf0.001")

  private def usTs(names: String*): DataFrame => DataFrame = df =>
    names.foldLeft(df)((d, n) => d.withColumn(n, unix_micros(col(n))))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> { (s, dir) =>
      s.read
        .parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          avg(col("l_quantity")).as("avg_qty"),
          avg(col("l_extendedprice")).as("avg_price"),
          avg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"),
        )
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    "q5_join" -> { (s, dir) =>
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val o = s.read.parquet(s"$dir/orders.parquet")
      val c = s.read.parquet(s"$dir/customer.parquet")
      val n = s.read.parquet(s"$dir/nation.parquet")
      val r = s.read.parquet(s"$dir/region.parquet")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"),
        )
        .orderBy(col("r_name"), col("n_name"))
    },
    "time_bars" -> { (s, dir) =>
      usTs("bar_ts", "ts_start", "ts_end")(
        Bars.timeBars(TradeData.fromEvents(s, dir), "1 hour")
      ).orderBy(col("symbol"), col("bar_ts"))
    },
    "tick_bars" -> { (s, dir) =>
      usTs("ts_start", "ts_end")(
        Bars.tickBars(TradeData.fromEvents(s, dir), barSize = 20)
      )
    },
    "volume_bars" -> { (s, dir) =>
      usTs("ts_start", "ts_end")(
        Bars.volumeBars(TradeData.fromEvents(s, dir), barSize = 500L)
      )
    },
    "dollar_bars" -> { (s, dir) =>
      usTs("ts_start", "ts_end")(
        Bars.dollarBars(TradeData.fromEvents(s, dir), barSize = 50000.0)
      )
    },
    "fixed_time_return" -> { (s, dir) =>
      usTs("ts")(
        Labels.fixedTimeReturn(TradeData.fromEvents(s, dir), window = 5)
          .select(col("symbol"), col("ts"), col("price"), col("fwd_return"))
      ).orderBy(col("symbol"), col("ts"))
    },
    "fixed_time_return_class" -> { (s, dir) =>
      usTs("ts")(
        Labels
          .fixedTimeReturnClassification(
            TradeData.fromEvents(s, dir),
            window = 5,
            threshold = Some(lit(0.05)),
          )
          .select(col("symbol"), col("ts"), col("price"), col("label"))
      ).orderBy(col("symbol"), col("ts"))
    },
    "frac_diff" -> { (s, dir) =>
      val t = TradeData.fromEvents(s, dir)
      usTs("ts")(
        t.select(
          col("symbol"),
          col("ts"),
          col("price"),
          FracDiff
            .fracDiff(col("price"), 0.5, 1e-3, Seq(col("symbol")), Seq(col("ts"), col("trade_id")))
            .as("frac_diff"),
        )
      ).orderBy(col("symbol"), col("ts"))
    },
    "returns_24h" -> { (s, dir) =>
      usTs("ts")(
        Labels.returns24h(TradeData.fromEvents(s, dir))
          .select(col("symbol"), col("ts"), col("price"), col("lookback_price"), col("return24h"))
      ).orderBy(col("symbol"), col("ts"))
    },
    "vertical_barrier" -> { (s, dir) =>
      usTs("ts", "vertical_barrier")(
        Labels.verticalBarrier(TradeData.fromEvents(s, dir), "24 hours")
      ).orderBy(col("symbol"), col("ts"))
    },
    "daily_vol" -> { (s, dir) =>
      usTs("ts")(
        Labels.dailyVol(TradeData.fromEvents(s, dir), span = 100)
      ).orderBy(col("symbol"), col("ts"))
    },
    "triple_barrier" -> { (s, dir) =>
      usTs("ts", "t1", "touch_ts")(
        Labels.tripleBarrier(
          TradeData.fromEvents(s, dir),
          horizon = "4 hours",
          constTarget = Some(0.02),
        )
      ).orderBy(col("symbol"), col("ts"))
    },
    "triple_barrier_vol" -> { (s, dir) =>
      usTs("ts", "t1", "touch_ts")(
        Labels.tripleBarrier(
          TradeData.fromEvents(s, dir),
          horizon = "4 hours",
          volSpan = 100,
        )
      ).orderBy(col("symbol"), col("ts"))
    },
  )

  private val T = TradeData.oracleTradesCte

  // event timestamps are unique (checked at sf0.01/sf0.1), so plain
  // arg_min/arg_max on ts is deterministic — DuckDB 1.0 has no
  // struct-keyed arg_min for a trade_id tiebreak.
  private val ohlcvSql =
    """epoch_us(min(ts)) AS ts_start,
      |       epoch_us(max(ts)) AS ts_end,
      |       arg_min(price, ts) AS open,
      |       max(price) AS high,
      |       min(price) AS low,
      |       arg_max(price, ts) AS close""".stripMargin

  /** DuckDB oracle SQL per query (same parquet tables). */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       sum(l_quantity) AS sum_qty,
        |       sum(l_extendedprice) AS sum_base_price,
        |       sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
        |       avg(l_quantity) AS avg_qty,
        |       avg(l_extendedprice) AS avg_price,
        |       avg(l_discount) AS avg_disc,
        |       CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q5_join" ->
      """SELECT r_name, n_name,
        |       sum(l_extendedprice * (1 - l_discount)) AS revenue,
        |       CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "time_bars" ->
      s"""WITH $T
         |SELECT symbol,
         |       epoch_us(date_trunc('hour', ts)) AS bar_ts,
         |       $ohlcvSql,
         |       CAST(sum(size) AS BIGINT) AS volume,
         |       sum(price * size) / sum(size) AS vwap,
         |       CAST(count(*) AS BIGINT) AS n_trades
         |FROM trades
         |GROUP BY symbol, date_trunc('hour', ts)
         |ORDER BY symbol, bar_ts""".stripMargin,
    "tick_bars" ->
      s"""WITH $T,
         |numbered AS (
         |  SELECT *, CAST(ts AS DATE) AS d,
         |         (row_number() OVER (PARTITION BY symbol, CAST(ts AS DATE)
         |                             ORDER BY ts, trade_id) - 1) // 20 AS g
         |  FROM trades)
         |SELECT symbol,
         |       $ohlcvSql,
         |       CAST(sum(size) AS BIGINT) AS volume,
         |       sum(price * size) / sum(size) AS vwap,
         |       CAST(count(*) AS BIGINT) AS n_trades
         |FROM numbered
         |GROUP BY symbol, d, g
         |ORDER BY symbol, d, g""".stripMargin,
    "volume_bars" ->
      s"""WITH $T,
         |cum AS (
         |  SELECT symbol, CAST(ts AS DATE) AS d, ts, trade_id, price, size,
         |         CAST(sum(size) OVER (PARTITION BY symbol, CAST(ts AS DATE)
         |                              ORDER BY ts, trade_id
         |                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_end
         |  FROM trades),
         |pieces AS (
         |  SELECT symbol, d, ts, trade_id, price,
         |         cum_end, cum_end - size AS cum_start,
         |         unnest(generate_series((cum_end - size) // 500, (cum_end - 1) // 500)) AS g
         |  FROM cum),
         |amounts AS (
         |  SELECT *, least(cum_end, (g + 1) * 500) - greatest(cum_start, g * 500) AS amount
         |  FROM pieces)
         |SELECT symbol,
         |       $ohlcvSql,
         |       CAST(sum(amount) AS BIGINT) AS volume,
         |       sum(price * amount) / sum(amount) AS vwap,
         |       CAST(count(*) AS BIGINT) AS n_trades
         |FROM amounts
         |GROUP BY symbol, d, g
         |ORDER BY symbol, d, g""".stripMargin,
    "fixed_time_return" ->
      s"""WITH $T
         |SELECT symbol, epoch_us(ts) AS ts, price,
         |       lead(price, 6) OVER (PARTITION BY symbol ORDER BY ts, trade_id) /
         |       lead(price, 1) OVER (PARTITION BY symbol ORDER BY ts, trade_id) - 1 AS fwd_return
         |FROM trades
         |ORDER BY symbol, ts""".stripMargin,
    "fixed_time_return_class" ->
      s"""WITH $T,
         |r AS (
         |  SELECT symbol, ts, price,
         |         lead(price, 6) OVER (PARTITION BY symbol ORDER BY ts, trade_id) /
         |         lead(price, 1) OVER (PARTITION BY symbol ORDER BY ts, trade_id) - 1 AS ret
         |  FROM trades)
         |SELECT symbol, epoch_us(ts) AS ts, price,
         |       CAST(CASE WHEN ret > 0.05 THEN 1
         |                 WHEN ret < -0.05 THEN -1
         |                 WHEN ret BETWEEN -0.05 AND 0.05 THEN 0
         |            END AS INTEGER) AS label
         |FROM r
         |ORDER BY symbol, ts""".stripMargin,
    "frac_diff" -> {
      val fd = FracDiff.oracleSqlExpr("price", 0.5, 1e-3, "symbol", "ts, trade_id")
      s"""WITH $T
         |SELECT symbol, epoch_us(ts) AS ts, price,
         |       $fd AS frac_diff
         |FROM trades
         |ORDER BY symbol, ts""".stripMargin
    },
    "returns_24h" ->
      s"""WITH $T,
         |l AS (SELECT symbol, ts, price, ts - INTERVAL 24 HOUR AS lb FROM trades)
         |SELECT l.symbol, epoch_us(l.ts) AS ts, l.price,
         |       r.price AS lookback_price,
         |       l.price / r.price - 1 AS return24h
         |FROM l ASOF LEFT JOIN trades r
         |  ON l.symbol = r.symbol AND l.lb >= r.ts
         |ORDER BY l.symbol, l.ts""".stripMargin,
    "vertical_barrier" ->
      s"""WITH $T,
         |l AS (SELECT symbol, ts, ts + INTERVAL 24 HOUR AS off FROM trades)
         |SELECT l.symbol, epoch_us(l.ts) AS ts,
         |       epoch_us(r.ts) AS vertical_barrier
         |FROM l ASOF LEFT JOIN trades r
         |  ON l.symbol = r.symbol AND l.off <= r.ts
         |ORDER BY l.symbol, l.ts""".stripMargin,
    "triple_barrier" ->
      s"""WITH $T,
         |ev AS (
         |  SELECT t.symbol, t.ts, t.price, 0.02 AS trgt,
         |         least(t.ts + INTERVAL 4 HOUR, m.last_ts) AS t1
         |  FROM trades t
         |  JOIN (SELECT symbol, max(ts) AS last_ts FROM trades GROUP BY symbol) m
         |    USING (symbol)),
         |touch AS (
         |  SELECT e.symbol, e.ts, e.price, e.trgt, e.t1,
         |         p.ts AS u, p.price / e.price - 1 AS ret
         |  FROM ev e
         |  JOIN trades p ON e.symbol = p.symbol AND p.ts > e.ts AND p.ts <= e.t1),
         |agg AS (
         |  SELECT symbol, ts, price, trgt, t1,
         |         min(CASE WHEN ret >= trgt THEN u END) AS pt_ts,
         |         min(CASE WHEN ret <= -trgt THEN u END) AS sl_ts,
         |         arg_min(ret, CASE WHEN ret >= trgt THEN u END) AS pt_ret,
         |         arg_min(ret, CASE WHEN ret <= -trgt THEN u END) AS sl_ret,
         |         arg_max(ret, u) AS v_ret
         |  FROM touch
         |  GROUP BY symbol, ts, price, trgt, t1),
         |lab AS (
         |  SELECT *,
         |         (pt_ts IS NOT NULL AND (sl_ts IS NULL OR pt_ts <= sl_ts)) AS pt_first,
         |         (sl_ts IS NOT NULL AND NOT (pt_ts IS NOT NULL AND (sl_ts IS NULL OR pt_ts <= sl_ts))) AS sl_first
         |  FROM agg)
         |SELECT symbol, epoch_us(ts) AS ts, trgt, epoch_us(t1) AS t1,
         |       epoch_us(CASE WHEN pt_first THEN pt_ts
         |                     WHEN sl_first THEN sl_ts
         |                     ELSE t1 END) AS touch_ts,
         |       CASE WHEN pt_first THEN pt_ret
         |            WHEN sl_first THEN sl_ret
         |            ELSE v_ret END AS touch_return,
         |       CAST(CASE WHEN pt_first THEN 1
         |                 WHEN sl_first THEN -1
         |                 ELSE 0 END AS INTEGER) AS label
         |FROM lab
         |ORDER BY symbol, ts""".stripMargin,
  )
}
