package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.DataType

/** First/last-by-(ord1, ord2) as a DECLARATIVE aggregate with a flat
  * primitive buffer — the codegen-resident replacement for
  * `min_by(value, struct(ts, trade_id))` in the bar aggregations.
  *
  * Why: Spark's min_by/max_by over a STRUCT ordering key cannot run
  * in HashAggregateExec (struct agg-buffer fields are not mutable
  * UnsafeRow types), so ONE such column demotes the entire
  * aggregation — high/low/vwap/count included — to
  * ObjectHashAggregate's row-based path; measured ~3.5 µs/row vs
  * ~0.3 µs/row codegen'd (the whole bar family paid it). This
  * expression keeps the lexicographic (ord1, ord2) tiebreak semantics
  * with three scalar buffer slots and CASE-expression updates, all
  * inside whole-stage codegen.
  *
  * Null contract: rows where ord1 or ord2 is null are ignored (the
  * trading pipelines order by (ts, trade_id), both non-null by
  * construction); a group with no qualifying row evaluates to null.
  * `value` may be null and is carried as the winning row's value.
  */
private[graft] case class OrderedHead(
    valueExpr: Expression,
    ord1: Expression,
    ord2: Expression,
    isMin: Boolean,
) extends DeclarativeAggregate
    with TernaryLike[Expression] {

  override def first: Expression = valueExpr
  override def second: Expression = ord1
  override def third: Expression = ord2
  override def nullable: Boolean = true
  override def dataType: DataType = valueExpr.dataType
  override def prettyName: String = if (isMin) "ordered_first" else "ordered_last"

  private lazy val v = AttributeReference("v", valueExpr.dataType)()
  private lazy val o1 = AttributeReference("o1", ord1.dataType)()
  private lazy val o2 = AttributeReference("o2", ord2.dataType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(v, o1, o2)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(null, valueExpr.dataType),
    Literal.create(null, ord1.dataType),
    Literal.create(null, ord2.dataType),
  )

  private def beats(
      newO1: Expression,
      newO2: Expression,
      curO1: Expression,
      curO2: Expression,
  ): Expression = {
    val cmp =
      if (isMin)
        Or(LessThan(newO1, curO1), And(EqualTo(newO1, curO1), LessThan(newO2, curO2)))
      else
        Or(GreaterThan(newO1, curO1), And(EqualTo(newO1, curO1), GreaterThan(newO2, curO2)))
    And(
      And(IsNotNull(newO1), IsNotNull(newO2)),
      Or(IsNull(curO1), cmp),
    )
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val take = beats(ord1, ord2, o1, o2)
    Seq(If(take, valueExpr, v), If(take, ord1, o1), If(take, ord2, o2))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val take = beats(o1.right, o2.right, o1.left, o2.left)
    Seq(If(take, v.right, v.left), If(take, o1.right, o1.left), If(take, o2.right, o2.left))
  }

  override lazy val evaluateExpression: Expression = v

  override protected def withNewChildrenInternal(
      newFirst: Expression,
      newSecond: Expression,
      newThird: Expression,
  ): Expression = copy(valueExpr = newFirst, ord1 = newSecond, ord2 = newThird)
}

object OrderedAgg {

  /** value of the row with the smallest (ord1, ord2) in the group. */
  def firstByOrd(value: Column, ord1: Column, ord2: Column): Column =
    ColumnBridge.toColumn(
      OrderedHead(
        ColumnBridge.toExpression(value),
        ColumnBridge.toExpression(ord1),
        ColumnBridge.toExpression(ord2),
        isMin = true,
      ).toAggregateExpression())

  /** value of the row with the largest (ord1, ord2) in the group. */
  def lastByOrd(value: Column, ord1: Column, ord2: Column): Column =
    ColumnBridge.toColumn(
      OrderedHead(
        ColumnBridge.toExpression(value),
        ColumnBridge.toExpression(ord1),
        ColumnBridge.toExpression(ord2),
        isMin = false,
      ).toAggregateExpression())
}
