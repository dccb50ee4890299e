package graft

/** ANSI-mode contract pin (r14 verdict #5). The engine historically
  * leaned on non-ANSI semantics (NULL-on-overflow was the r13 Hrp NPE
  * class); the full sf0.01 Verify sweep + DuckDB selfcheck now passes
  * under `spark.sql.ansi.enabled=true` (r15: 0 of 132 failed, oracle
  * 125/125 — SURVEY §6u), so the contract is BOTH modes, and this
  * spec keeps it tested: the queries whose arithmetic is most
  * overflow/cast-exposed run under an ANSI session and must return
  * exactly the non-ANSI rows. A future operator that silently relies
  * on NULL-on-overflow (or on a lenient cast) throws here instead of
  * corrupting results at scale.
  */
class AnsiModeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // the overflow/cast-risk set: Hrp's activeness predicate (the r13
  // NPE class), integer-cents bar/microstructure arithmetic, VPIN's
  // cumulative buckets, the bigint-window QC counters, and the LSH
  // band hashing (hash mixing = wraparound arithmetic by design —
  // must be written in wraparound-safe ops, not +/- on longs)
  private val risky = Seq(
    "hrp_invariants", "q1_agg", "microstructure", "vpin",
    "tick_qc_daily", "dedup_minhash", "bet_size", "frac_diff")

  test("ANSI mode returns exactly the non-ANSI rows on the overflow-risk set") {
    val ansi = spark.newSession()
    ansi.conf.set("spark.sql.ansi.enabled", "true")
    assert(ansi.conf.get("spark.sql.ansi.enabled") == "true")
    for (name <- risky) {
      val fn = SparkEntry.queries(name)
      val expected = fn(spark, sfDir).collect().map(_.mkString("|")).sorted.toSeq
      val got = fn(ansi, sfDir).collect().map(_.mkString("|")).sorted.toSeq
      assert(got == expected, s"$name diverges under ANSI mode")
      assert(got.nonEmpty, s"$name returned no rows")
    }
  }
}
