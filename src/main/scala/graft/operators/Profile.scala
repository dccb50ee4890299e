package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling: per-column statistics a pipeline inspects
  * before training on a new corpus drop — row/null/distinct counts,
  * lexicographic bounds, and mean byte length.
  *
  * One aggregation over the whole table produces every column's
  * stats, then a `stack` unpivot reshapes to one row per column — a
  * single scan regardless of how many columns are profiled. Exact
  * distinct counts use Spark's expand-based multi-distinct (k-way row
  * multiplication through ONE shuffle); at 100 TB-wide profiles swap
  * in `approxProfile`, which keeps the single pass with
  * approx_count_distinct (HLL) at bounded error instead — same output
  * shape, error bound pinned in ScalaTest.
  */
object Profile {

  private def statCols(c: String): Seq[Column] = Seq(
    count(lit(1)).as(s"__${c}__n"),
    count(col(c)).as(s"__${c}__nn"),
    countDistinct(col(c)).as(s"__${c}__nd"),
    min(col(c).cast("string")).as(s"__${c}__min"),
    max(col(c).cast("string")).as(s"__${c}__max"),
    sum(length(col(c).cast("string")).cast("long")).as(s"__${c}__len"),
  )

  private def approxStatCols(c: String): Seq[Column] = Seq(
    count(lit(1)).as(s"__${c}__n"),
    count(col(c)).as(s"__${c}__nn"),
    approx_count_distinct(col(c)).as(s"__${c}__nd"),
    min(col(c).cast("string")).as(s"__${c}__min"),
    max(col(c).cast("string")).as(s"__${c}__max"),
    sum(length(col(c).cast("string")).cast("long")).as(s"__${c}__len"),
  )

  private def unpivot(agg: DataFrame, cols: Seq[String]): DataFrame = {
    val fields = cols
      .map(c =>
        s"'$c', __${c}__n, __${c}__nn, __${c}__nd, __${c}__min, __${c}__max, __${c}__len"
      )
      .mkString(", ")
    agg
      .select(expr(
        s"stack(${cols.size}, $fields) AS (col_name, n_rows, n_nonnull, n_distinct, min_str, max_str, total_len)"
      ))
      .withColumn("n_null", col("n_rows") - col("n_nonnull"))
      .withColumn(
        "avg_len",
        // single division of two exact longs — engine-bit-stable
        col("total_len").cast("double") / col("n_nonnull").cast("double"),
      )
      .select("col_name", "n_rows", "n_null", "n_distinct", "min_str", "max_str", "avg_len")
  }

  /** Exact profile: one row per requested column. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(statCols)
    unpivot(df.agg(aggs.head, aggs.tail: _*), cols)
  }

  /** Single-pass profile with HLL distinct estimates (default rsd
    * 5%): the 100 TB shape — no expand multiplication, one partial
    * agg per partition.
    */
  def approxProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(approxStatCols)
    unpivot(df.agg(aggs.head, aggs.tail: _*), cols)
  }

  /** Exact grouped quantiles (linear interpolation — the
    * quantile_cont definition; Spark's `percentile` and DuckDB's
    * `quantile_cont` produce bit-identical doubles, verified on
    * interpolated points). Exact percentile buffers each group's
    * values, so this is for bounded-cardinality groupings (per
    * symbol/type/label); for 100 TB-wide groups use
    * [[approxQuantiles]], whose KLL-style sketch is mergeable
    * map-side and O(1/accuracy) per group.
    */
  def quantiles(
      df: DataFrame,
      groupCols: Seq[String],
      valCol: String,
      qs: Seq[Double],
  ): DataFrame = {
    // ONE array-typed percentile aggregate, not one per quantile: the
    // exact Percentile is a TypedImperativeAggregate whose buffer is a
    // per-group value→count map sorted at eval — k scalar calls build
    // and sort k identical buffers (measured 2.9 s warm for 4
    // quantiles over 10M rows; the array form shares one buffer/sort).
    // Values are bit-identical (same counts map, same interpolation).
    val arr = expr(s"percentile($valCol, array(${qs.mkString(", ")}))").as("__qs")
    unpack(df.groupBy(groupCols.map(col): _*).agg(arr, count(col(valCol)).as("n")), qs)
  }

  /** approx_percentile twin: same output shape, sketch-based. */
  def approxQuantiles(
      df: DataFrame,
      groupCols: Seq[String],
      valCol: String,
      qs: Seq[Double],
      accuracy: Int = 10000,
  ): DataFrame = {
    // same single-buffer discipline: one QuantileSummaries sketch per
    // group serves every requested quantile
    val arr = expr(s"approx_percentile($valCol, array(${qs.mkString(", ")}), $accuracy)")
      .as("__qs")
    unpack(df.groupBy(groupCols.map(col): _*).agg(arr, count(col(valCol)).as("n")), qs)
  }

  private def unpack(agged: DataFrame, qs: Seq[Double]): DataFrame = {
    val cols = agged.columns.filterNot(c => c == "__qs" || c == "n").map(col) ++
      qs.zipWithIndex.map { case (q, i) => element_at(col("__qs"), i + 1).as(qName(q)) } :+
      col("n")
    agged.select(cols: _*)
  }

  private def qName(q: Double): String =
    "p" + BigDecimal(q * 100).underlying.stripTrailingZeros.toPlainString.replace(".", "_")
}
