package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.TradingCols

/** Partitioned parquet persistence for tick data.
  *
  * Layout: `path/date=YYYY-MM-DD/symbol=X/part-*.parquet`. At 100 TB
  * this is the layout every bar/label operator wants: date+symbol
  * partition pruning reaches the file listing (queries for one day or
  * one book touch only their directories), and files arrive sorted by
  * (ts, trade_id) within each partition, so per-(symbol,date)
  * operators (bars, dollar carry scans) read presorted runs.
  */
object TradeStore {

  def write(
      trades: DataFrame,
      path: String,
      c: TradingCols = TradingCols.default,
  ): Unit = {
    trades
      .withColumn("date", to_date(col(c.ts)))
      .repartition(col("date"), col(c.symbol))
      .sortWithinPartitions(col("date"), col(c.symbol), col(c.ts), col(c.tradeId))
      .write
      .mode("overwrite")
      .partitionBy("date", c.symbol)
      .parquet(path)
  }

  /** Reads the store; date/symbol filters prune partitions at the
    * file listing (verify via PartitionFilters in explain).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Symbol-bucketed catalog table: the layout that makes every
    * downstream symbol-keyed operator exchange-free. A scan of a
    * table bucketed by symbol and sorted by (symbol, ts) reports
    * HashPartitioning(symbol) to Catalyst, so EnsureRequirements
    * elides the shuffle (and often the sort) for the native as-of
    * join, bars, and labels — pinned in ExplainSpec ("native asof
    * over bucketed tables elides both shuffle exchanges").
    *
    * Use nBuckets ≈ cluster cores at the target scale; bucket files
    * are written sorted so merge scans read presorted runs.
    */
  def writeBucketed(
      trades: DataFrame,
      table: String,
      nBuckets: Int = 32,
      c: TradingCols = TradingCols.default,
  ): Unit =
    trades.write
      .mode("overwrite")
      .bucketBy(nBuckets, c.symbol)
      .sortBy(c.symbol, c.ts)
      .saveAsTable(table)

  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
