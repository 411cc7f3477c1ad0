package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Inner product of two FLOAT[]/DOUBLE[] vectors in one compiled loop.
  *
  * On well-formed inputs (equal lengths, no null elements — what the
  * [[graft.tables.Tables.embeddings]] loader guarantees), arithmetic
  * is identical to the higher-order
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0D, +)`
  * fold (same element promotion, same sequential IEEE addition order —
  * so every DuckDB `list_sum(list_transform(list_zip(...)))` oracle
  * still matches bit for bit), but without materializing the zipped
  * intermediate array or running two interpreted lambdas per element.
  * Ill-formed inputs fail loudly (see [[VecDot.compute]]) where the
  * HOF fold would have returned NULL. This is the hot kernel of the
  * similarity-search family: a brute pass over N candidates for |Q|
  * anchors runs |Q|·N of these folds, and at 100 TB the constant
  * factor IS the bill.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects two array<float>/array<double> inputs, " +
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
    VecDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsDouble, rightIsDouble)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecDot$$.MODULE$$" +
        s".compute($a, $b, $leftIsDouble, $rightIsDouble);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecDot = copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

object VecDot {
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(VecDot(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Shared by the interpreted path and the generated code.
    *
    * Ill-formed inputs FAIL LOUDLY (the RangeJoin-cap discipline)
    * instead of silently diverging from the HOF fold: `zip_with` pads
    * a length mismatch with nulls and a null element poisons the
    * whole fold to NULL — a truncated or element-null "dot product"
    * here would instead be a finite wrong similarity flowing into
    * every ANN result, so both cases throw with the cause named.
    */
  def compute(a: ArrayData, b: ArrayData,
      aDouble: Boolean, bDouble: Boolean): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"vec_dot: length mismatch ($n vs ${b.numElements()}) — " +
          "the zip_with fold this kernel replaces would return NULL")
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"vec_dot: null element at index $i — the zip_with fold " +
            "this kernel replaces would return NULL")
      val x = if (aDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bDouble) b.getDouble(i) else b.getFloat(i).toDouble
      acc += x * y
      i += 1
    }
    acc
  }
}
