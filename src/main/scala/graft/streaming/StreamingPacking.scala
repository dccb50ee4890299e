package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.{Packing, Sampling}

/** Streaming sequence packing — the ingest-time twin of
  * graft.operators.Packing: documents are appended to their shard's
  * open sequence as they arrive, and each document's (shard, seq_idx)
  * assignment is FINAL at arrival (close-before-overflow never
  * reassigns earlier docs), so assignments emit immediately in append
  * mode with no watermark machinery at all. State per shard is two
  * longs (open-sequence fill + index) — O(1) regardless of stream
  * length.
  *
  * Ordering contract: batch packs in doc_id order; a stream packs in
  * arrival order (doc_id-sorted within each micro-batch). When the
  * stream delivers docs in id order the two are identical (pinned in
  * the spec); under disorder the packing is still valid (budget
  * respected, sequences dense) — it is a different, equally legal
  * first-fit order.
  */
object StreamingPacking {

  final case class Doc(doc_id: Long, n_tokens: Long, shard: Int)

  final case class PackState(fill: Long, seq: Long)

  /** @param docs streaming frame with doc_id and `tokCol` columns */
  def packSequences(
      docs: DataFrame,
      maxTokens: Long,
      nShards: Int,
      tokCol: String = "n_tokens",
      salt: String = "graft",
  ): Dataset[Packing.PackedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(
        col("doc_id").cast("long"),
        col(tokCol).cast("long").as("n_tokens"),
        (Sampling.hashBucket(col("doc_id"), salt) % nShards).cast("int").as("shard"),
      )
      .as[Doc]
      .groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        processShard(maxTokens)
      )
  }

  private def processShard(maxTokens: Long)(
      shard: Int,
      rows: Iterator[Doc],
      state: GroupState[PackState],
  ): Iterator[Packing.PackedDoc] = {
    var st = state.getOption.getOrElse(PackState(0L, 0L))
    val out = rows.toSeq.sortBy(_.doc_id).map { d =>
      if (st.fill > 0L && st.fill + d.n_tokens > maxTokens)
        st = PackState(0L, st.seq + 1L)
      st = PackState(st.fill + d.n_tokens, st.seq)
      Packing.PackedDoc(d.doc_id, d.n_tokens, shard, st.seq)
    }
    state.update(st)
    out.iterator
  }
}
