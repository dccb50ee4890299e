package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training-data
  * pipelines: train/val/test assignment, Bernoulli-by-hash sampling,
  * and exact-fraction stratified sampling.
  *
  * Everything is keyed on a content/id hash, never on RNG or row
  * position, so results are reproducible run-to-run, cluster-size-
  * independent, and stable under repartitioning — the property a
  * 100 TB pipeline needs so that re-running a stage (or adding
  * executors) cannot silently reshuffle which documents are "test".
  * Split/sample assignment is pure map-side (codegen'd md5 + arith,
  * no shuffle); only the exact-fraction stratified variant shuffles
  * (one exchange on the stratum key for its window rank).
  */
object Sampling {

  val Buckets = 10000

  /** Stable bucket in [0, Buckets): first 8 md5 hex chars of
    * "key:salt" (same construction as the LSH plane derivation —
    * engine-portable, DuckDB computes the identical value).
    */
  def hashBucket(key: Column, salt: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(":" + salt))), 1, 8), 16, 10)
      .cast("long") % Buckets

  /** Adds a `split` label column by cumulative-weight boundaries over
    * the hash bucket, e.g. Seq("train" -> 0.9, "val" -> 0.05,
    * "test" -> 0.05). Weights are normalized; boundaries land on
    * whole buckets (resolution 1/Buckets). Map-side, no shuffle.
    */
  def hashSplit(
      df: DataFrame,
      keyCol: String,
      splits: Seq[(String, Double)],
      salt: String = "graft",
  ): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0) && splits.map(_._2).sum > 0)
    val total = splits.map(_._2).sum
    val bounds = splits
      .scanLeft(0L) { case (acc, (_, w)) => acc + math.round(w / total * Buckets) }
      .tail
    val b = hashBucket(col(keyCol), salt)
    // last boundary gets any rounding remainder: bucket < Buckets always
    val labeled = splits.map(_._1).zip(bounds.dropRight(1)).foldRight(
      lit(splits.last._1): Column
    ) { case ((name, bound), rest) => when(b < bound, name).otherwise(rest) }
    df.withColumn("split", labeled)
  }

  /** Bernoulli-by-hash sample: keeps rows whose bucket falls below
    * frac·Buckets. Map-side; expectation-exact per stratum of the
    * hash, not count-exact.
    */
  def hashSample(df: DataFrame, keyCol: String, frac: Double, salt: String = "graft"): DataFrame =
    df.where(hashBucket(col(keyCol), salt) < math.round(frac * Buckets))

  /** Resample a multi-source corpus toward a target domain mixture
    * (integer weights per source), keeping the maximum feasible
    * volume: T = min_s floor(count_s · Σw / w_s) rows total, each
    * source Bernoulli-hash-sampled at rate w_s·T / (Σw·count_s).
    * The per-source keep threshold is EXACT integer arithmetic on the
    * hash-bucket space (floor division, both engines), so membership
    * is reproducible and engine-exact; realized counts are
    * expectation-exact like [[hashSample]].
    *
    * Scale shape: one tiny count aggregation (one row per source)
    * joined back via BROADCAST; the keep decision is map-side hash
    * arithmetic on the full corpus — no corpus shuffle at all.
    */
  def mixToTarget(
      df: DataFrame,
      sourceCol: String,
      keyCol: String,
      weights: Seq[(String, Long)],
      salt: String = "graft",
  ): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "positive integer weights")
    val wsum = weights.map(_._2).sum
    val spark = df.sparkSession
    import spark.implicits._
    val w = weights.toDF("__src", "__w")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("__cnt"))
    val joined = counts.join(w, counts(sourceCol) === w("__src"), "inner")
    val t = joined.agg(min(expr(s"__cnt * $wsum div __w")).as("__t"))
    val thr = joined
      .crossJoin(broadcast(t))
      .select(
        col("__src"),
        expr(s"$Buckets * __w * __t div ($wsum * __cnt)").as("__thr"),
      )
    df.join(broadcast(thr), df(sourceCol) === thr("__src"), "inner")
      .where(hashBucket(col(keyCol), salt) < col("__thr"))
      .drop("__src", "__thr")
  }

  /** Exact-count stratified sample: within each stratum, ranks rows
    * by (hash, key) — a deterministic pseudo-random order — and keeps
    * the first ceil(frac · stratumSize). One exchange on the strata
    * key; the rank and the stratum count come from the same window,
    * so the plan is a single sort + two window functions. At scale,
    * strata are typically few and large — the window sort dominates;
    * skewed strata split fine because rank needs no global order
    * beyond the stratum.
    */
  def stratifiedSample(
      df: DataFrame,
      strata: Seq[String],
      frac: Double,
      keyCol: String,
      salt: String = "graft",
  ): DataFrame = {
    require(frac >= 0 && frac <= 1)
    val w = Window.partitionBy(strata.map(col): _*)
    val ord = w.orderBy(hashBucket(col(keyCol), salt), col(keyCol))
    df.withColumn("__rk", row_number().over(ord))
      .withColumn("__n", count(lit(1)).over(w))
      .where(col("__rk") <= ceil(col("__n") * frac))
      .drop("__rk", "__n")
  }
}
