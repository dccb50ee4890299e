package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for embedding arithmetic.
  *
  * The higher-order-function formulation (aggregate over zip_with)
  * is semantically identical but interpreted — ~µs per element-lambda
  * call. This expression generates a tight Java loop (whole-stage
  * codegen), ~ns per element, the difference between similarity
  * joins being bound by compute or by expression-interpreter
  * overhead at 100 TB.
  *
  * Accumulation is left-to-right in f64, exactly matching both the
  * HOF formulation and the DuckDB oracle's list_reduce — scores stay
  * bit-identical.
  */
case class DotProductExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"dot product needs array<float|double>, got $t")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(
      ctx,
      ev,
      (x, y) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += (double) $x.$lGet($i) * (double) $y.$rGet($i);
           |}
           |${ev.value} = $s;
           |""".stripMargin
      },
    )
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Squared L2 distance Σ (x_i − y_i)², accumulated left-to-right in
  * f64 (each element cast to double BEFORE the subtraction, matching
  * the oracle's CAST-per-element list_reduce — bit-identical).
  */
case class L2SqExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"l2sq needs array<float|double>, got $t")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = (if (lf) x.getFloat(i).toDouble else x.getDouble(i)) -
        (if (rf) y.getFloat(i).toDouble else y.getDouble(i))
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(
      ctx,
      ev,
      (x, y) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val d = ctx.freshName("d")
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $d = (double) $x.$lGet($i) - (double) $y.$rGet($i);
           |  $s += $d * $d;
           |}
           |${ev.value} = $s;
           |""".stripMargin
      },
    )
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** PQ asymmetric-distance lookup: Σ_s table[s·k + codes_s] — the ADC
  * score of a code word against a query's flattened (sub × code)
  * partial-distance table. Left-to-right f64 sum, codegen'd: the hot
  * expression of PQ search (one add + one indexed load per subspace
  * instead of subDim multiplies).
  */
case class PqAdcExpr(left: Expression, right: Expression, k: Int) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val table = b.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    val m = codes.numElements()
    while (i < m) {
      s += table.getDouble(i * k + codes.getInt(i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (codes, table) => {
        val i = ctx.freshName("i")
        val m = ctx.freshName("m")
        val s = ctx.freshName("s")
        s"""
           |int $m = $codes.numElements();
           |double $s = 0.0;
           |for (int $i = 0; $i < $m; $i++) {
           |  $s += $table.getDouble($i * $k + $codes.getInt($i));
           |}
           |${ev.value} = $s;
           |""".stripMargin
      },
    )

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorExprs {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{toColumn, toExpression}

  /** Codegen'd left-to-right f64 dot product of two array columns. */
  def dotNative(a: Column, b: Column): Column =
    toColumn(DotProductExpr(toExpression(a), toExpression(b)))

  /** Codegen'd left-to-right f64 squared L2 distance. */
  def l2sqNative(a: Column, b: Column): Column =
    toColumn(L2SqExpr(toExpression(a), toExpression(b)))

  /** Codegen'd PQ ADC lookup sum (codes: array<int>, flattened table:
    * array<double> of size m·k).
    */
  def pqAdcNative(codes: Column, table: Column, k: Int): Column =
    toColumn(PqAdcExpr(toExpression(codes), toExpression(table), k))
}
