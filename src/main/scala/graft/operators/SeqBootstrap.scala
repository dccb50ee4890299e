package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequential bootstrap (AFML ch.4.5): draw a bootstrap sample of
  * labeled events where each draw's probability is proportional to
  * the candidate's average uniqueness GIVEN the events already
  * drawn — overlapping labels get progressively down-sampled, so the
  * resample is closer to IID than a naive bootstrap.
  *
  * Determinism: each draw's uniform comes from an md5 hash of the
  * draw index (the [[Sampling]] reproducibility idiom), so the whole
  * sample is a pure function of (events, k, bucket, salt) — no RNG
  * state, reproducible across runs and partitionings.
  *
  * Scale split (the [[Hrp]]/[[BacktestStats.pbo]] pattern): event
  * spans are bucketized distributedly (one projection, no shuffle —
  * integer bucket bounds from the raw t0/t1); the inherently
  * SEQUENTIAL draw loop — each draw depends on all prior draws —
  * collects only (event_id, symbol, b0, b1) rows behind an explicit
  * `maxEvents` gate and runs O(k · n · span/bucket) on the driver.
  * The per-bucket concurrency counts live in one hash map keyed by
  * (symbol, bucket): overlap is a same-symbol phenomenon.
  *
  * Output: draw (0-based), event_id, u (the chosen event's average
  * uniqueness at draw time).
  */
object SeqBootstrap {

  def sample(
      events: DataFrame,
      k: Int = 0,
      bucketUs: Long = 600000000L, // 10-minute concurrency buckets
      maxEvents: Int = 100000,
      salt: String = "seqboot",
  ): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val bUs = bucketUs
    require(bUs > 0, "bucketUs must be positive")
    val ev = events
      .select(
        col("event_id").cast("long"),
        col("symbol").cast("string"),
        (unix_micros(col("t0")) / bUs).cast("long").as("b0"),
        (unix_micros(col("t1")) / bUs).cast("long").as("b1"),
      )
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    require(
      ev.length <= maxEvents,
      s"sequential bootstrap is gated at $maxEvents driver-side events (got ${ev.length})",
    )
    val n = ev.length
    val draws = if (k > 0) k else n
    val out = new Array[(Long, Long, Double)](if (n == 0) 0 else draws)
    if (n > 0) {
      val conc = scala.collection.mutable.HashMap.empty[(String, Long), Int]
      val digest = java.security.MessageDigest.getInstance("MD5")
      var d = 0
      while (d < draws) {
        // average uniqueness of each candidate under current counts
        val u = new Array[Double](n)
        var tot = 0.0
        var i = 0
        while (i < n) {
          val (_, sym, b0, b1) = ev(i)
          var s = 0.0
          var b = b0
          while (b <= b1) { s += 1.0 / (1.0 + conc.getOrElse((sym, b), 0)); b += 1L }
          u(i) = s / (b1 - b0 + 1).toDouble
          tot += u(i)
          i += 1
        }
        val hex = digest
          .digest(s"$salt:$d".getBytes("UTF-8"))
          .take(4).map(x => f"${x & 0xff}%02x").mkString
        val uni = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 4294967296.0
        val target = uni * tot
        var acc = 0.0
        var pick = 0
        i = 0
        while (i < n && { acc += u(i); acc < target }) { pick = i + 1; i += 1 }
        if (pick >= n) pick = n - 1 // guard the acc==tot edge
        val (eid, sym, b0, b1) = ev(pick)
        var b = b0
        while (b <= b1) { conc((sym, b)) = conc.getOrElse((sym, b), 0) + 1; b += 1L }
        out(d) = (d.toLong, eid, u(pick))
        d += 1
      }
    }
    out.toSeq.toDF("draw", "event_id", "u")
  }
}
