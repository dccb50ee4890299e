package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

import graft.operators.VectorIndex

/** Streaming twin of [[graft.operators.VectorIndex]] ingest: new
  * embedding batches arrive on a stream and join the frozen-centroid
  * store continuously.
  *
  * Two entry points, matching the two deployment shapes:
  *
  *  - [[assigned]] — a STATELESS streaming transform: per-row
  *    nearest-centroid assignment with the store's frozen centroids
  *    inlined as a literal (collected once at plan time, bounded by
  *    [[maxInlineCells]]). No aggregation, no state, any sink/output
  *    mode; the argmax replays the batch `max_by(cent_id,
  *    struct(cs, -cent_id))` ordering comparison-for-comparison, so
  *    a vector gets the IDENTICAL cell in both modes (pinned).
  *  - [[ingest]] — the store writer: `foreachBatch` delegating each
  *    micro-batch to [[VectorIndex.appendIndexIdempotent]], i.e. the
  *    exact batch assignment path (broadcast argmax + cell-partitioned
  *    append) behind a batchId-keyed staged commit. `foreachBatch` is
  *    at-least-once by Spark's contract — a micro-batch whose store
  *    write succeeded but whose checkpoint commit did not is
  *    re-executed on restart — so the append is made idempotent on
  *    `batchId`: replayed batches are skipped (committed) or cleaned
  *    and redone (mid-promote crash), giving exactly-once store
  *    contents end to end. The streamed store is content-identical to
  *    batch appends of the same rows.
  *
  * Ordering contract: assignment is per-row (no cross-row state), so
  * ANY arrival order produces the same store contents — unlike the
  * bar/CSW streaming operators there is no ordered-arrival caveat.
  * Ids must be globally unique across the stream's lifetime (the
  * [[VectorIndex]] ingest invariant).
  */
object StreamingVectorIndex {

  /** Inline-literal cap for [[assigned]]: 4096 cells × 64 dims ≈
    * 2 MB of plan literals — the same bound as
    * [[graft.operators.Similarity.directAssignMax]]. Larger indexes
    * should ingest via [[ingest]] (whose broadcast join has no such
    * cap) and run queries batch-side.
    */
  val maxInlineCells: Int = graft.operators.VectorIndex.maxInlineCells

  /** (id, nv, cell) for a streaming embedding frame, assigned
    * against the store's frozen centroids. Stateless — usable in
    * append mode with any downstream sink, or composed with further
    * per-row logic (e.g. an online near-dup flag against a static
    * sample).
    */
  def assigned(
      spark: SparkSession,
      dir: String,
      stream: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): DataFrame = {
    val cents = VectorIndex.collectCentroidsInline(
      spark.read
        .parquet(s"$dir/centroids")
        .orderBy(col("cent_id"))
        .select(col("cent_id"), col("cv"))
    )
    require(
      cents.nonEmpty,
      s"store centroids exceed the $maxInlineCells-cell / " +
        s"${VectorIndex.maxInlineBytes}-byte inline cap — use ingest()/appendIndex",
    )
    val (ids, mat, dim) = cents.get
    // the same inline argmax the batch assignment uses below its own
    // inline cap — identical cells by construction
    VectorIndex
      .normalized(stream, idCol, vecCol)
      .select(
        col("id"),
        col("nv"),
        VectorIndex.inlineCellExpr(ids, mat, dim, col("nv")).as("cell"),
      )
  }

  /** Continuous store ingest: every micro-batch runs
    * [[VectorIndex.appendIndexIdempotent]] keyed by the micro-batch
    * id (same assignment tree as batch ingest, same cell-partitioned
    * layout, exactly-once under crash replay). Start with any
    * trigger; `Trigger.AvailableNow` drains a backlog and stops.
    */
  def ingest(
      spark: SparkSession,
      dir: String,
      stream: DataFrame,
      checkpointDir: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        VectorIndex.appendIndexIdempotent(spark, dir, batch, batchId, idCol, vecCol)
      }

  /** [[ingest]] with the maintenance policy wired in (r12 verdict
    * task #6): after every `checkEvery`-th micro-batch, run
    * [[VectorIndex.maintainIndex]] — its own census decides; when no
    * cell exceeds `splitFactor` × the mean cell size it is a no-op
    * whose only cost is one scan of the store's `cell` partition
    * column (the size signal that directly predicts probe-cost
    * degradation: §6l measured a drifted append stream degrading the
    * fixed-nProbe probe to a 69%-of-corpus scan before splitting).
    * Raise `checkEvery` when micro-batches are small relative to the
    * store; the policy is deliberately NOT edge-triggered on the
    * batch alone — drift accumulates across batches.
    *
    * Mid-stream maintenance preserves the ingest contract: appends
    * between maintenance events assign against the CURRENT centroid
    * table (finer after each split), every stored id stays unique
    * (the empty-parent partition drop is exercised under streaming in
    * StreamingVectorIndexSpec), and an exhaustive probe
    * (nProbe ≥ cells) remains exactly brute force at any cell layout.
    *
    * `onMaintain` observes each non-empty maintenance report
    * (cell, n, n_children) — metrics hook, not control flow.
    */
  def ingestWithMaintenance(
      spark: SparkSession,
      dir: String,
      stream: DataFrame,
      checkpointDir: String,
      splitFactor: Double = 4.0,
      checkEvery: Int = 1,
      kmeansIters: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      onMaintain: DataFrame => Unit = _ => (),
  ): DataStreamWriter[Row] = {
    require(checkEvery >= 1, "checkEvery >= 1")
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        VectorIndex.appendIndexIdempotent(spark, dir, batch, batchId, idCol, vecCol)
        // maintenance after a replayed-but-committed append is safe:
        // maintainIndex's census re-decides from the store, and a
        // balanced store makes it a no-op (documented non-transactional)
        if (batchId % checkEvery == 0) {
          val report = VectorIndex.maintainIndex(spark, dir, splitFactor, kmeansIters)
          if (!report.isEmpty) onMaintain(report)
        }
      }
  }
}
