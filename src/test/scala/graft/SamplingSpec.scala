package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, s"lang${i % 3}")).toDF("doc_id", "lang")

  test("hashSplit labels every row, with proportions near the weights") {
    val d = docs(5000)
    val out = Sampling
      .hashSplit(d, "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(out.values.sum == 5000)
    assert(math.abs(out("train") - 4000) < 200)
    assert(math.abs(out("val") - 500) < 120 && math.abs(out("test") - 500) < 120)
  }

  test("hashSplit is stable under repartitioning and run-to-run") {
    val d = docs(1000)
    val a = Sampling.hashSplit(d, "doc_id", Seq("a" -> 0.5, "b" -> 0.5))
      .select("doc_id", "split").as[(Long, String)].collect().sortBy(_._1)
    val b = Sampling.hashSplit(d.repartition(7), "doc_id", Seq("a" -> 0.5, "b" -> 0.5))
      .select("doc_id", "split").as[(Long, String)].collect().sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("hashSample keeps a monotone subset: sample(0.3) within sample(0.6)") {
    val d = docs(2000)
    val s3 = Sampling.hashSample(d, "doc_id", 0.3).select("doc_id").as[Long].collect().toSet
    val s6 = Sampling.hashSample(d, "doc_id", 0.6).select("doc_id").as[Long].collect().toSet
    assert(s3.subsetOf(s6))
    assert(math.abs(s3.size - 600) < 120 && math.abs(s6.size - 1200) < 150)
  }

  test("stratifiedSample keeps exactly ceil(frac·n) rows per stratum, deterministically") {
    val d = docs(999) // 333 per lang
    val out = Sampling.stratifiedSample(d, Seq("lang"), 0.1, "doc_id")
    val counts = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts.values.toSet == Set(math.ceil(333 * 0.1).toLong))
    val again = Sampling.stratifiedSample(d.repartition(5), Seq("lang"), 0.1, "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(again.sameElements(out.select("doc_id").as[Long].collect().sorted))
  }

  test("split assignment is independent of the salt only via the hash (different salts differ)") {
    val d = docs(1000)
    val a = Sampling.hashSplit(d, "doc_id", Seq("x" -> 0.5, "y" -> 0.5), salt = "s1")
      .where(col("split") === "x").select("doc_id").as[Long].collect().toSet
    val b = Sampling.hashSplit(d, "doc_id", Seq("x" -> 0.5, "y" -> 0.5), salt = "s2")
      .where(col("split") === "x").select("doc_id").as[Long].collect().toSet
    assert(a != b)
  }
}
