package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level BPE as native expressions: the merge ranks ride the
  * serialized plan to every task (they ARE the model — ≤ a few
  * thousand string pairs), so tokenization is map-side with zero
  * shuffles and no model join. Per-task word→tokens memo: real
  * corpora repeat words, so most lookups skip the merge loop
  * entirely. CodegenFallback is fine — the merge loop dominates, and
  * it is per-ROW interpretation, not per-element lambda dispatch.
  */
case class BpeCountExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = IntegerType

  @transient private lazy val ranks: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  @transient private lazy val memo =
    scala.collection.mutable.HashMap.empty[String, List[String]]

  override def nullSafeEval(input: Any): Any =
    graft.operators.BpeCore.countText(input.asInstanceOf[UTF8String].toString, ranks, memo)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** The full BPE token stream (document order) — the tokenizer-true
  * input for the bigram perplexity model, whose vocab is bounded by
  * 256 + merges.length by construction.
  */
case class BpeTokensExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val ranks: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  @transient private lazy val memo =
    scala.collection.mutable.HashMap.empty[String, List[String]]

  override def nullSafeEval(input: Any): Any = {
    val toks = graft.operators.BpeCore
      .tokensText(input.asInstanceOf[UTF8String].toString, ranks, memo)
    new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object BpeExprs {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{toColumn, toExpression}

  def bpeCount(text: Column, merges: Seq[(String, String)]): Column =
    toColumn(BpeCountExpr(toExpression(text), merges))

  def bpeTokens(text: Column, merges: Seq[(String, String)]): Column =
    toColumn(BpeTokensExpr(toExpression(text), merges))
}
