package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.CvSplits

/** Purged k-fold CV: hand-pinned roles on a small case, leakage
  * invariants on real data, and the two-phase distributed rank pinned
  * against the naive single-partition global window.
  */
class CvSplitsSpec extends SparkSpec {

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2021-01-01 00:$m%02d:00")

  test("purged k-fold: hand-computed roles, embargo, fold balance") {
    import spark.implicits._
    // 6 events, 1 minute apart, each with a 90-second label interval;
    // k=3 -> folds {0,1} {2,3} {4,5} by rank
    val ev = (0 until 6)
      .map(i => (i.toLong, ts(i), new Timestamp(ts(i).getTime + 90000L)))
      .toDF("event_id", "ts", "t1")
    val out = CvSplits
      .purgedKFold(ev, k = 3, embargo = "2 minutes")
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getString(4)))
      .toMap
    assert(out.size == 18)
    // fold 1 tests events 2,3 (span [t2, t3+90s])
    assert(out((1L, 2L)) == "test" && out((1L, 3L)) == "test")
    // event 1: t1 = t1+90s = 00:02:30 >= test_start 00:02 -> purged
    assert(out((1L, 1L)) == "purged")
    // event 0: t1 = 00:01:30 < 00:02 -> train
    assert(out((1L, 0L)) == "train")
    // event 4 starts at 00:04 <= test_end 00:04:30 -> purged (overlap
    // wins); event 5 at 00:05 is within the 2min embargo after 00:04:30
    assert(out((1L, 4L)) == "purged" && out((1L, 5L)) == "embargo")
    // fold 0 (span [00:00, 00:02:30]): event 2 starts exactly at
    // 00:02 <= test_end -> purged; event 3 at 00:03 within embargo
    assert(out((0L, 2L)) == "purged" && out((0L, 3L)) == "embargo")
    assert(out((0L, 5L)) == "train")
  }

  test("walk-forward CV: hand-computed roles, strictly-past training") {
    import spark.implicits._
    val ev = (0 until 6)
      .map(i => (i.toLong, ts(i), new Timestamp(ts(i).getTime + 90000L)))
      .toDF("event_id", "ts", "t1")
    val rows = CvSplits
      .walkForward(ev, k = 3)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getString(4)))
    val out = rows.toMap
    // fold 1: test {2,3}; candidates {0,1}; fold 2: test {4,5},
    // candidates {0..3}; fold 0 and later-fold events never appear
    assert(rows.length == 10)
    assert(out((1L, 2L)) == "test" && out((1L, 3L)) == "test")
    assert(out((1L, 1L)) == "purged") // t1 00:02:30 >= test_start 00:02
    assert(out((1L, 0L)) == "train")
    assert(!out.contains((1L, 4L)) && !out.contains((0L, 0L)))
    assert(out((2L, 4L)) == "test" && out((2L, 5L)) == "test")
    assert(out((2L, 3L)) == "purged") // t1 00:04:30 >= test_start 00:04
    assert(out((2L, 0L)) == "train" && out((2L, 1L)) == "train" && out((2L, 2L)) == "train")
  }

  test("combinatorial CPCV: hand-computed roles across all C(3,2) splits") {
    import spark.implicits._
    val ev = (0 until 6)
      .map(i => (i.toLong, ts(i), new Timestamp(ts(i).getTime + 90000L)))
      .toDF("event_id", "ts", "t1")
    val out = CvSplits
      .combinatorial(ev, k = 3, p = 2)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getString(4)))
      .toMap
    // folds {0,1},{2,3},{4,5}; t1 = ts + 90s
    assert(out.size == 18) // 3 splits x 6 events
    // split 0 = test folds (0,1): events 0-3 test; 4 overlaps fold-1
    // span end 00:04:30 -> purged; 5 starts after -> train
    (0L to 3L).foreach(e => assert(out((0L, e)) == "test"))
    assert(out((0L, 4L)) == "purged" && out((0L, 5L)) == "train")
    // split 1 = (0,2): 2 overlaps fold-0 end, 3 reaches fold-2 start
    Seq(0L, 1L, 4L, 5L).foreach(e => assert(out((1L, e)) == "test"))
    assert(out((1L, 2L)) == "purged" && out((1L, 3L)) == "purged")
    // split 2 = (1,2): 1's t1 00:02:30 reaches fold-1 start; 0 trains
    (2L to 5L).foreach(e => assert(out((2L, e)) == "test"))
    assert(out((2L, 1L)) == "purged" && out((2L, 0L)) == "train")
  }

  test("walk-forward and CPCV leakage invariants on real events") {
    val trades = sources.TradeData.fromEvents(spark, "/root/testdata/sf0.001")
    val ev = trades
      .where(col("trade_id") % 10 === 0)
      .select(
        col("trade_id").as("event_id"),
        col("ts"),
        (col("ts") + expr("INTERVAL 2 HOURS")).as("t1"),
      )
    // walk-forward: training data strictly precedes the test span,
    // and no train interval reaches into it
    val wf = CvSplits.walkForward(ev, k = 5).cache()
    try {
      val spans = wf.where(col("role") === "test")
        .groupBy(col("fold").as("f")).agg(min(col("ts")).as("test_start"))
      val bad = wf.join(spans, col("fold") === col("f"))
        .where(col("role") === "train" &&
          (col("ts") >= col("test_start") || col("t1") >= col("test_start")))
      assert(bad.count() == 0)
      // later-fold events never appear in step f
      val rank = wf.where(col("role") === "test")
        .groupBy(col("fold").as("f")).agg(max(col("ts")).as("test_last"))
      assert(wf.count() > 0 && wf.join(rank, col("fold") === col("f"))
        .where(col("role") =!= "test" && col("ts") > col("test_last")).count() == 0)
    } finally wf.unpersist()
    // CPCV: every (split, event) exactly once, and for EACH of a
    // split's two test-fold spans no train event overlaps it or
    // starts inside its embargo window
    val nEv = ev.count()
    val cp = CvSplits.combinatorial(ev, k = 5, p = 2, embargo = "1 hour").cache()
    try {
      assert(cp.count() == nEv * 10) // C(5,2) splits x all events
      assert(cp.groupBy("split_id", "event_id").count()
        .where(col("count") =!= 1).count() == 0)
      // fold spans from the k-fold table (same rank core)
      val foldSpans = CvSplits.purgedKFold(ev, k = 5)
        .where(col("role") === "test")
        .groupBy("fold")
        .agg(min(col("ts")).as("s"), max(col("t1")).as("e"))
        .collect()
        .map(r => r.getLong(0) -> (r.getTimestamp(1), r.getTimestamp(2)))
        .toMap
      val combos = (0 until 5).combinations(2).toSeq.zipWithIndex
      for ((folds, id) <- combos; f <- folds) {
        val (s, e) = foldSpans(f.toLong)
        val emb = new Timestamp(e.getTime + 3600000L)
        val leak = cp.where(
          col("split_id") === id.toLong && col("role") === "train" &&
            ((col("ts") <= e && col("t1") >= s) ||
              (col("ts") > e && col("ts") <= emb))
        )
        assert(leak.count() == 0, s"split $id fold $f leaks")
      }
    } finally cp.unpersist()
  }

  test("leakage invariants and exact rank on real events") {
    val trades = sources.TradeData.fromEvents(spark, "/root/testdata/sf0.001")
    val ev = trades
      .where(col("trade_id") % 10 === 0)
      .select(
        col("trade_id").as("event_id"),
        col("ts"),
        (col("ts") + expr("INTERVAL 2 HOURS")).as("t1"),
      )
    val nEv = ev.count()
    val out = CvSplits.purgedKFold(ev, k = 5, embargo = "1 hour").cache()
    try {
      // every (fold, event) pair present exactly once
      assert(out.count() == nEv * 5)
      assert(out.groupBy("fold").count().count() == 5)
      // fold sizes differ by at most one
      val sizes = out.where(col("role") === "test").groupBy("fold").count()
        .collect().map(_.getLong(1))
      assert(sizes.length == 5 && sizes.max - sizes.min <= 1 && sizes.sum == nEv)
      // no train event overlaps its fold's test span or embargo window
      val spans = out.where(col("role") === "test")
        .groupBy(col("fold").as("f")).agg(
          min(col("ts")).as("test_start"), max(col("t1")).as("test_end"))
      val leaks = out.join(spans, col("fold") === col("f"))
        .where(
          col("role") === "train" && (
            (col("ts") <= col("test_end") && col("t1") >= col("test_start")) ||
              (col("ts") > col("test_end") &&
                col("ts") <= col("test_end") + expr("INTERVAL 1 HOUR"))
          )
        )
      assert(leaks.count() == 0)
      // two-phase distributed rank == naive global-window fold
      val naive = ev
        .withColumn("__fold", expr(s"(row_number() over (order by ts, event_id) - 1) * 5 div ${nEv}L"))
        .select(col("event_id"), col("__fold"))
      val engine = out.where(col("role") === "test")
        .select(col("event_id"), col("fold"))
      assert(engine.join(naive, "event_id").where(col("fold") =!= col("__fold")).count() == 0)
    } finally out.unpersist()
  }
}
