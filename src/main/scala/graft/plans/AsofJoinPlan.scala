package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow
}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Native as-of join: LogicalPlan + Strategy + physical merge scan.
  *
  * The declarative formulation (graft.operators.AsofJoin: tag+union+
  * window) doubles the row count through one exchange; this operator
  * instead co-partitions both sides on the `by` keys, sorts each side
  * once by (by, key) — both requirements expressed to EnsureRequirements,
  * so Catalyst plans the exchanges/sorts and can elide them when the
  * input is already partitioned (e.g. read from a date/symbol
  * TradeStore) — and resolves matches with a streaming two-pointer
  * merge per partition: O(1) state, no row duplication, no window
  * buffering.
  *
  * Semantics identical to AsofJoin.asof (inclusive backward/forward;
  * at equal keys backward takes the last right row, forward the
  * first). Null left keys match nothing.
  */
case class AsofJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftBy: Seq[Expression],
    rightBy: Seq[Expression],
    leftOn: Expression,
    rightOn: Expression,
    rightValues: Seq[Attribute],
    forward: Boolean,
) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ rightValues.map(_.withNullability(true))
  override lazy val resolved: Boolean = childrenResolved
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsofJoinPlan =
    copy(left = l, right = r)
}

object AsofJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lBy, rBy, lOn, rOn, rVals, fwd) =>
      AsofJoinExec(planLater(l), planLater(r), lBy, rBy, lOn, rOn, rVals, fwd) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftBy: Seq[Expression],
    rightBy: Seq[Expression],
    leftOn: Expression,
    rightOn: Expression,
    rightValues: Seq[Attribute],
    forward: Boolean,
) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ rightValues.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    if (leftBy.isEmpty) AllTuples :: AllTuples :: Nil
    else ClusteredDistribution(leftBy) :: ClusteredDistribution(rightBy) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftBy :+ leftOn).map(SortOrder(_, Ascending)),
    (rightBy :+ rightOn).map(SortOrder(_, Ascending)),
  )

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOutput = left.output
    val rightOutput = right.output
    val lBy = leftBy
    val rBy = rightBy
    val lOn = leftOn
    val rOn = rightOn
    val rVals = rightValues
    val fwd = forward
    val keyTypes = (lBy :+ lOn).map(_.dataType)
    val numRightVals = rVals.length
    val outputAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIt, rIt0) =>
      val lKeyProj = UnsafeProjection.create(lBy :+ lOn, leftOutput)
      val rKeyProj = UnsafeProjection.create(rBy :+ rOn, rightOutput)
      val lGroupProj = UnsafeProjection.create(lBy, leftOutput)
      val rGroupProj = UnsafeProjection.create(rBy, rightOutput)
      val rValProj = UnsafeProjection.create(rVals, rightOutput)
      val resultProj = UnsafeProjection.create(outputAttrs, outputAttrs)
      val ordering =
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .createNaturalAscendingOrdering(keyTypes)
      val nullRight = new GenericInternalRow(numRightVals)
      val joined = new JoinedRow

      val rIt = rIt0.buffered
      // backward state: latest right row seen with (group,key) <= current left
      var lastGroup: UnsafeRow = null
      var lastVal: UnsafeRow = null

      lIt.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lGroup = lGroupProj(lRow)
        if (!fwd) {
          while (rIt.hasNext && ordering.compare(rKeyProj(rIt.head), lKey) <= 0) {
            val r = rIt.next()
            // rows with null right keys are consumed but never match
            val rk = rKeyProj(r)
            if (!rk.isNullAt(keyTypes.length - 1)) {
              lastGroup = rGroupProj(r).copy()
              lastVal = rValProj(r).copy()
            }
          }
          // null left key sorts first -> never advances, never matches
          val matched =
            lastGroup != null && lastGroup == lGroup && !lKey.isNullAt(keyTypes.length - 1)
          resultProj(joined(lRow, if (matched) lastVal else nullRight))
        } else {
          while (rIt.hasNext && ordering.compare(rKeyProj(rIt.head), lKey) < 0)
            rIt.next()
          val matched = rIt.hasNext && {
            val h = rIt.head
            rGroupProj(h) == lGroup && !lKey.isNullAt(keyTypes.length - 1)
          }
          resultProj(joined(lRow, if (matched) rValProj(rIt.head) else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsofJoinExec =
    copy(left = l, right = r)
}
