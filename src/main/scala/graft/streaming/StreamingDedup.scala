package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Streaming exact deduplication for document ingest pipelines.
  *
  * Batch dedup (graft.operators.Dedup.exact) groups the whole corpus;
  * a streaming ingest instead wants "emit each document once, drop
  * later copies". State cannot grow with the corpus at 100 TB, so
  * duplicate tracking is bounded by the event-time watermark:
  * `dropDuplicatesWithinWatermark` keeps a fingerprint in state only
  * until the watermark passes its event time — duplicates separated
  * by more than `watermark` are both emitted (a documented recall
  * bound, the standard streaming-dedup contract), everything closer
  * is exactly-once per fingerprint.
  */
object StreamingDedup {

  /** Emits the first document per normalized-content fingerprint
    * within the watermark horizon. Input must be a streaming frame
    * with an event-time column `tsCol`.
    */
  def exactWithinWatermark(
      docs: DataFrame,
      tsCol: String,
      watermark: String = "1 hour",
      textCol: String = "text",
  ): DataFrame =
    docs
      .withColumn("fingerprint", TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fingerprint")
}
