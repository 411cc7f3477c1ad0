package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Squared L2 distance of two FLOAT[]/DOUBLE[] vectors in one
  * compiled loop — the [[VecDot]] treatment applied to the
  * PQ/k-means kernel: arithmetic identical on well-formed inputs to
  * `aggregate(zip_with(a, b, (x, y) -> (double(x) - double(y)) *
  * (double(x) - double(y))), 0D, +)` (same promotion, same sequential
  * IEEE addition order, so every `list_sum(list_transform(...))`
  * DuckDB twin still matches bit for bit); ill-formed inputs fail
  * loudly like [[VecDot.compute]].
  */
case class VecL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_l2 expects two array<float>/array<double> inputs, " +
          s"got ${l.sql} and ${r.sql}")
    }

  private lazy val leftIsDouble: Boolean = left.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  private lazy val rightIsDouble: Boolean = right.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    VecL2.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsDouble, rightIsDouble)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecL2$$.MODULE$$" +
        s".compute($a, $b, $leftIsDouble, $rightIsDouble);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecL2 = copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_l2"
}

object VecL2 {
  def l2(a: Column, b: Column): Column =
    GraftSqlBridge.column(VecL2(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Shared by the interpreted path and the generated code; the
    * fail-loudly contract is [[VecDot.compute]]'s.
    */
  def compute(a: ArrayData, b: ArrayData,
      aDouble: Boolean, bDouble: Boolean): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"vec_l2: length mismatch ($n vs ${b.numElements()}) — " +
          "the zip_with fold this kernel replaces would return NULL")
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"vec_l2: null element at index $i — the zip_with fold " +
            "this kernel replaces would return NULL")
      val x = if (aDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bDouble) b.getDouble(i) else b.getFloat(i).toDouble
      val d = x - y
      acc += d * d
      i += 1
    }
    acc
  }
}
