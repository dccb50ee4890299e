package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProductExpr, HashStringsExpr, MinHashSigExpr, ShingleHashExpr, SimHashExpr}
import graft.operators.Dedup

/** SQL surface for graft's native expressions.
  *
  * Two registration paths:
  *  - config-based: `spark.sql.extensions=graft.GraftExtensions`
  *    (cluster-wide, survives session cloning), or
  *  - imperative: `GraftExtensions.register(spark)` on a live session.
  *
  * Exposed functions:
  *  - graft_dot(a, b)              -> double (f64 dot product)
  *  - graft_shingle_hashes(s, k)   -> array<long> distinct k-shingle hashes
  *  - graft_hash_strings(arr)      -> array<long> distinct md5-prefix hashes
  *  - graft_minhash_sig(hsl, n)    -> array<long> minhash signature
  *  - graft_simhash(tokens, bits)  -> long simhash fingerprint
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}

object GraftExtensions {

  private def litInt(e: Expression, what: String): Int = e.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      "graft_dot",
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (es: Seq[Expression]) => DotProductExpr(es(0), es(1)),
    ),
    (
      "graft_shingle_hashes",
      new ExpressionInfo(classOf[ShingleHashExpr].getName, "graft_shingle_hashes"),
      (es: Seq[Expression]) => ShingleHashExpr(es(0), litInt(es(1), "k")),
    ),
    (
      "graft_hash_strings",
      new ExpressionInfo(classOf[HashStringsExpr].getName, "graft_hash_strings"),
      (es: Seq[Expression]) => HashStringsExpr(es(0)),
    ),
    (
      "graft_minhash_sig",
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "graft_minhash_sig"),
      (es: Seq[Expression]) => {
        val n = litInt(es(1), "nHashes")
        MinHashSigExpr(
          es(0),
          n,
          Dedup.MinhashP,
          (0 until n).map(Dedup.minhashA),
          (0 until n).map(Dedup.minhashB),
        )
      },
    ),
    (
      "graft_simhash",
      new ExpressionInfo(classOf[SimHashExpr].getName, "graft_simhash"),
      (es: Seq[Expression]) => SimHashExpr(es(0), litInt(es(1), "bits")),
    ),
  )

  /** Registers the functions on an already-running session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
}
