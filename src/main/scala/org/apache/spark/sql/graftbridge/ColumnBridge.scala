package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the classic Column <-> Expression converters, which are
  * private[sql] in Spark 4 (the public Column wraps a ColumnNode).
  * Standard extension-library pattern: a tiny shim inside the sql
  * package namespace, keeping all real logic in graft.*.
  */
object ColumnBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a (resolved) logical plan — classic.Dataset.ofRows
    * is private[sql].
    */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
  ): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset
      .ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** DataFrame over an RDD of InternalRows —
    * SparkSession.internalCreateDataFrame is private[sql]. For
    * mapPartitions passes that must not pay the external-Row encoder
    * (boxing every column of every row; the measured frac_diff GC
    * bound at 100M rows).
    */
  def ofInternalRows(
      spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType,
  ): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
