package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Checkpoint

/** Purged k-fold cross-validation splits with embargo (AFML ch.7 —
  * beyond the reference's labeling surface, the model-selection step
  * every labeled-event pipeline feeds): financial labels are built
  * from FORWARD intervals [t0, t1], so a plain k-fold leaks — a
  * training event whose interval overlaps the test fold's span shares
  * information with test labels. Purged CV drops those (purging), and
  * additionally drops training events starting within an embargo
  * period after the test span (serial-correlation leakage).
  *
  * Semantics (pooled across symbols, like the AFML formulation):
  *  - events are ranked by (ts, event_id); fold of the event at
  *    0-based rank r is `r·k / n` (integer division) — index-
  *    contiguous folds whose sizes differ by at most one.
  *  - fold f's test span = [min ts, max t1] over its events.
  *  - for each fold, every event gets a role:
  *      test     — the event is in the fold;
  *      purged   — [ts, t1] overlaps the test span;
  *      embargo  — starts within `embargo` after the test span's end;
  *      train    — everything else.
  *
  * Scale design: the ONLY global structure is the rank, computed with
  * a two-phase distributed rank — range-repartition on (ts, id), a
  * per-partition `row_number` window (parallel across partitions),
  * and partition-count prefix offsets joined back from a
  * numPartitions-row broadcast. No single-task global window, no
  * driver-side row data; the span table is k rows, broadcast into a
  * map-side role projection. The range exchange is the one shuffle.
  * The barrier between the two rank phases is [[Checkpoint.tableGated]]
  * so the nondeterministic range-sampled partitioning is evaluated
  * exactly once.
  */
object CvSplits {

  /** @param events one row per labeled event: `idCol` (unique long),
    *   `tsCol` (event start), `t1Col` (label interval end, >= ts)
    * @param embargo SQL interval literal body, e.g. "1 hour"
    * @return one row per (fold, event): fold, event_id, ts, t1, role
    */
  def purgedKFold(
      events: DataFrame,
      k: Int = 5,
      embargo: String = "0 seconds",
      idCol: String = "event_id",
      tsCol: String = "ts",
      t1Col: String = "t1",
  ): DataFrame = {
    val (folded, spans) = foldedEvents(events, k, idCol, tsCol, t1Col)
    folded
      .crossJoin(broadcast(spans))
      .withColumn(
        "role",
        when(col("__fold") === col("fold"), lit("test"))
          .when(col("ts") <= col("__test_end") && col("t1") >= col("__test_start"), lit("purged"))
          .when(
            col("ts") > col("__test_end") &&
              col("ts") <= col("__test_end") + expr(s"INTERVAL $embargo"),
            lit("embargo"),
          )
          .otherwise(lit("train")),
      )
      .select(col("fold"), col("event_id"), col("ts"), col("t1"), col("role"))
  }

  /** Walk-forward (expanding-window) CV with purging: for each fold
    * f >= 1, test = fold f and the candidate training set is every
    * EARLIER fold's events — the backtest-shaped split (train strictly
    * in the past). A candidate whose interval [ts, t1] reaches into
    * the test span (t1 >= test_start; its ts is <= test_start by rank
    * contiguity) is purged. Later folds are not part of step f at all,
    * so no embargo arm exists. Output: (fold, event_id, ts, t1, role
    * in test/purged/train) for folds 1..k-1.
    */
  def walkForward(
      events: DataFrame,
      k: Int = 5,
      idCol: String = "event_id",
      tsCol: String = "ts",
      t1Col: String = "t1",
  ): DataFrame = {
    val (folded, spans) = foldedEvents(events, k, idCol, tsCol, t1Col)
    folded
      .crossJoin(broadcast(spans.where(col("fold") >= 1)))
      .where(col("__fold") <= col("fold"))
      .withColumn(
        "role",
        when(col("__fold") === col("fold"), lit("test"))
          .when(col("t1") >= col("__test_start"), lit("purged"))
          .otherwise(lit("train")),
      )
      .select(col("fold"), col("event_id"), col("ts"), col("t1"), col("role"))
  }

  /** Combinatorial purged CV (AFML ch.12 CPCV): every size-p subset of
    * the k index-contiguous groups serves as a test set once —
    * C(k, p) splits instead of k, the split family backtest-path
    * construction samples from. Per split: events of the p test
    * groups are `test`; a candidate is `purged` when its [ts, t1]
    * overlaps ANY of the split's p test spans, `embargo` when it
    * starts within `embargo` after any test span's end, else `train`.
    *
    * Scale shape: identical to [[purgedKFold]] — the rank exchange is
    * the only data shuffle; the C(k,p)·p split-span table collapses to
    * C(k,p) rows of p-element span arrays and broadcasts into a
    * map-side role projection (the p-element `exists` probes are
    * per-row constant work). Output grows C(k,p)× the event count by
    * construction — that is the CPCV contract, not a plan defect.
    *
    * `split_id` = lexicographic index of the test-fold combination
    * (for p = 2: combos ordered by (f1, f2)).
    */
  def combinatorial(
      events: DataFrame,
      k: Int = 6,
      p: Int = 2,
      embargo: String = "0 seconds",
      idCol: String = "event_id",
      tsCol: String = "ts",
      t1Col: String = "t1",
  ): DataFrame = {
    require(p >= 1 && p < k, "combinatorial CV needs 1 <= p < k")
    val (folded, spans) = foldedEvents(events, k, idCol, tsCol, t1Col)
    val spark = events.sparkSession
    import spark.implicits._
    val combos = (0 until k).combinations(p).toSeq.zipWithIndex
    val comboDf = combos
      .flatMap { case (folds, id) => folds.map(f => (id.toLong, f.toLong)) }
      .toDF("split_id", "__tf")
    val splitSpans = comboDf
      .join(spans, col("__tf") === col("fold"))
      .groupBy(col("split_id"))
      .agg(
        collect_list(
          struct(col("fold").as("f"), col("__test_start").as("s"), col("__test_end").as("e"))
        ).as("__spans")
      )
    folded
      .crossJoin(broadcast(splitSpans))
      .withColumn(
        "role",
        when(exists(col("__spans"), x => x("f") === col("__fold")), lit("test"))
          .when(
            exists(col("__spans"), x => col("ts") <= x("e") && col("t1") >= x("s")),
            lit("purged"),
          )
          .when(
            exists(
              col("__spans"),
              x => col("ts") > x("e") && col("ts") <= x("e") + expr(s"INTERVAL $embargo"),
            ),
            lit("embargo"),
          )
          .otherwise(lit("train")),
      )
      .select(col("split_id"), col("event_id"), col("ts"), col("t1"), col("role"))
  }

  /** Shared core: exact two-phase distributed rank -> index-contiguous
    * fold per event (`__fold`), plus the k-row fold-span table
    * (fold, __test_start, __test_end).
    */
  private def foldedEvents(
      events: DataFrame,
      k: Int,
      idCol: String,
      tsCol: String,
      t1Col: String,
  ): (DataFrame, DataFrame) = {
    require(k >= 2, "k-fold needs k >= 2")
    val spark = events.sparkSession
    val prep = events.select(
      col(idCol).cast("long").as("event_id"),
      col(tsCol).cast("timestamp").as("ts"),
      col(t1Col).cast("timestamp").as("t1"),
    )

    // phase 1: range-partition on the rank order and pin the
    // partitioning behind a barrier (spark_partition_id must agree
    // between the count pass and the rank pass)
    val nParts = spark.sparkContext.defaultParallelism
    val ranged = Checkpoint.tableGated(
      prep
        .repartitionByRange(nParts, col("ts"), col("event_id"))
        .withColumn("__pid", spark_partition_id()),
      "cv_ranked",
    )

    // phase 2: bounded (numPartitions-row) per-partition counts →
    // prefix offsets; global rank = offset + partition-local row_number
    val counts = ranged
      .groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val n = counts.map(_._2).sum
    require(n > 0, "purgedKFold needs at least one event")
    val offsets = counts
      .scanLeft((0, 0L, 0L)) { case ((_, off, c), (pid, cnt)) => (pid, off + c, cnt) }
      .tail
      .map { case (pid, off, _) => (pid, off) }
    val offDf = broadcast(
      spark.createDataFrame(offsets.toSeq).toDF("__pid", "__off")
    )
    val wPart = Window.partitionBy(col("__pid")).orderBy(col("ts"), col("event_id"))
    val folded = ranged
      .join(offDf, "__pid")
      .withColumn("__rank", col("__off") + row_number().over(wPart) - 1)
      // 0-based rank r -> fold r*k/n: contiguous, sizes differ by <= 1
      // (`div` = integer division; `/` on longs would plan a double)
      .withColumn("__fold", expr(s"__rank * $k div ${n}L"))
      .select(col("event_id"), col("ts"), col("t1"), col("__fold"))

    // k-row span table, broadcast into a map-side role projection
    val spans = folded
      .groupBy(col("__fold").as("fold"))
      .agg(min(col("ts")).as("__test_start"), max(col("t1")).as("__test_end"))
    (folded, spans)
  }
}
