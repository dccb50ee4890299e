package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level BPE token count as a native expression: the merge
  * ranks ride the serialized plan to every task (they ARE the model —
  * ≤ a few thousand string pairs), so counting is map-side with zero
  * shuffles and no model join. Per-task word→count memo: real corpora
  * repeat words, so most lookups skip the merge loop entirely.
  * CodegenFallback is fine — the merge loop dominates, and it is
  * per-ROW interpretation, not per-element lambda dispatch.
  */
case class BpeCountExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = IntegerType

  @transient private lazy val ranks: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  @transient private lazy val memo =
    scala.collection.mutable.HashMap.empty[String, Int]

  override def nullSafeEval(input: Any): Any =
    graft.operators.BpeCore.countText(input.asInstanceOf[UTF8String].toString, ranks, memo)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object BpeExprs {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{toColumn, toExpression}

  def bpeCount(text: Column, merges: Seq[(String, String)]): Column =
    toColumn(BpeCountExpr(toExpression(text), merges))
}
