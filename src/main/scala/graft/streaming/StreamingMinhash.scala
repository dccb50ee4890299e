package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup
import graft.operators.TextAnalysis.normText
import graft.operators.Rolling.windowMicros

/** Streaming MinHash+LSH near-duplicate detection — the streaming
  * twin of `Dedup.minhashLsh` (batch is the normal dedup deployment;
  * this covers ingest pipelines that must flag near-dups on arrival).
  *
  * Per-row work (normalize → shingle-hash → minhash signature → band
  * hashes) is the SAME native Catalyst expressions as batch, so a doc
  * gets the identical signature in both modes. The pairing step is a
  * `flatMapGroupsWithState` keyed by band hash: each band bucket
  * keeps the (id, hashed-shingle-set) of docs seen within the
  * watermark horizon and pairs each arrival against them with the
  * exact-Jaccard verification batch uses.
  *
  * State is bounded by the watermark: entries older than the horizon
  * are pruned on every invocation and empty buckets are removed via
  * event-time timeout — at 100 TB/day ingest the state is
  * O(docs-per-horizon × bands), not O(corpus). Near-dups separated by
  * more than the horizon are missed (the standard streaming-dedup
  * recall contract, same as StreamingDedup).
  *
  * Exactly-once pair emission: a colliding pair would meet in every
  * band where its hashes agree, so each doc carries its full band
  * vector and a pair is emitted only from its FIRST agreeing band —
  * no consumer-side dedup needed, and the emitted set equals
  * `Dedup.minhashLsh` on the same corpus (pinned in
  * StreamingMinhashSpec).
  */
object StreamingMinhash {

  /** One (band-bucket, doc) row: the grouping value, its index, the
    * doc's full band vector, hashed shingle set, and event micros.
    */
  final case class BandedDoc(
      band: String,
      bidx: Int,
      allBands: Seq[String],
      id: Long,
      hsl: Seq[Long],
      ts: java.sql.Timestamp,
      em: Long,
  )

  final case class NearDupPair(id_a: Long, id_b: Long, jaccard: Double, em: Long)

  /** One doc held in a band bucket's state (public: the state
    * encoder's generated code needs the constructor).
    */
  final case class Entry(id: Long, hsl: Array[Long], bands: Array[String], em: Long)

  /** Near-dup pairs over a STREAMING doc frame, emitted append-mode
    * when the second doc of a pair arrives within `watermark` of the
    * first. `em` on the output row is the later doc's event micros.
    */
  def pairsWithinWatermark(
      docs: DataFrame,
      tsCol: String,
      watermark: String = "1 hour",
      threshold: Double = 0.5,
      nHashes: Int = 16,
      bands: Int = 4,
      idCol: String = "doc_id",
      textCol: String = "text",
  ): Dataset[NearDupPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val horizon = windowMicros(watermark)

    val banded = docs
      .withColumn(
        "hsl",
        graft.functions.TextExprs.shingleHashes(normText(col(textCol)), 5),
      )
      .withColumn(
        "sig",
        graft.functions.TextExprs.minhashSig(
          col("hsl"),
          nHashes,
          Dedup.MinhashP,
          (0 until nHashes).map(Dedup.minhashA),
          (0 until nHashes).map(Dedup.minhashB),
        ),
      )
      .withColumn("allBands", Dedup.bandHashes(col("sig"), nHashes, bands))
      .select(
        posexplode(col("allBands")).as(Seq("bidx", "band")),
        col("allBands"),
        col(idCol).cast("long").as("id"),
        col("hsl"),
        col(tsCol).as("ts"),
        unix_micros(col(tsCol)).as("em"),
      )
      // watermark AFTER the projection: the event-time tag must be on
      // a column that survives into the stateful operator
      .withWatermark("ts", watermark)
      .as[BandedDoc]

    banded
      .groupByKey(_.band)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        pairBucket(threshold, horizon)
      )
  }

  /** Jaccard over hashed-shingle SETS — the Scala form of batch's
    * size(array_intersect)/size(array_union) (both dedup), so the
    * emitted double is bit-identical to `Dedup.lshJaccardPairs`.
    */
  private def jaccard(a: Array[Long], b: Array[Long]): Double = {
    val sa = a.toSet
    val sb = b.toSet
    sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
  }

  /** The emission-ownership rule: this bucket emits the pair iff the
    * arriving row's (band value, band index) IS the first index where
    * the two docs' band vectors agree — exactly one row of exactly
    * one bucket satisfies it per colliding pair, even if a doc
    * repeats the same band value at several indices.
    */
  private def ownsEmission(key: String, bidx: Int, a: Array[String], b: Seq[String]): Boolean = {
    var i = 0
    while (i < a.length) {
      if (a(i) == b(i)) return a(i) == key && i == bidx
      i += 1
    }
    false
  }

  private def pairBucket(threshold: Double, horizon: Long)(
      key: String,
      rows: Iterator[BandedDoc],
      state: GroupState[List[Entry]],
  ): Iterator[NearDupPair] = {
    val prior = state.getOption.getOrElse(Nil)
    if (state.hasTimedOut) {
      // watermark passed every entry's horizon: drop the bucket
      state.remove()
      Iterator.empty
    } else {
      val wm = state.getCurrentWatermarkMs() * 1000L
      var entries = prior.filter(_.em >= wm - horizon)
      val out = List.newBuilder[NearDupPair]
      rows.foreach { r =>
        val hsl = r.hsl.toArray
        val bandVec = r.allBands.toArray
        entries.foreach { e =>
          // pair within the horizon in BOTH directions (late rows may
          // arrive behind an already-stored newer doc)
          if (e.id != r.id && math.abs(e.em - r.em) <= horizon && ownsEmission(key, r.bidx, e.bands, r.allBands)) {
            val j = jaccard(e.hsl, hsl)
            if (j >= threshold)
              out += NearDupPair(math.min(e.id, r.id), math.max(e.id, r.id), j, math.max(e.em, r.em))
          }
        }
        // one state entry per doc per bucket, even when the doc
        // repeats this band value at several indices
        if (!entries.exists(_.id == r.id)) entries = Entry(r.id, hsl, bandVec, r.em) :: entries
      }
      state.update(entries)
      // timeout once the watermark passes the newest entry + horizon
      val maxEm = entries.iterator.map(_.em).max
      state.setTimeoutTimestamp(maxEm / 1000L + horizon / 1000L + 1L)
      out.result().iterator
    }
  }
}
