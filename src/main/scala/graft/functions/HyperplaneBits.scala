package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** 64-bit random-hyperplane signature of a FLOAT[] embedding in one
  * array pass.
  *
  * Semantically identical to 64 separate
  * `aggregate(zip_with(emb, signs_j, (x, s) -> double(x) * s), 0D, +)`
  * folds (same sequential IEEE addition order, so the DuckDB oracle
  * still matches bit for bit), but one compiled loop instead of 64
  * interpreted lambda folds per row — the hot inner product of the
  * embedding LSH path.
  */
case class HyperplaneBits(child: Expression)
    extends UnaryExpression {

  // explicit type check: SQL callers passing anything but a float or
  // double array (array literals default to array<double>) get an
  // analysis error instead of a runtime ClassCastException or a
  // silent 4-byte misread of 8-byte values
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hyperplane_bits expects array<float> or array<double>, " +
          s"got ${other.sql}")
    }

  private lazy val isDoubleArray: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    HyperplaneBits.compute(input.asInstanceOf[ArrayData], isDoubleArray)

  /** Static-invoke codegen: the generated loop calls one compiled
    * method — no InternalRow boxing and no CodegenFallback barrier, so
    * the expression stays inside whole-stage codegen.
    */
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HyperplaneBits$$.MODULE$$" +
        s".compute($c, $isDoubleArray);")

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneBits = copy(child = newChild)

  override def prettyName: String = "hyperplane_bits"
}

object HyperplaneBits {
  def bits(c: Column): Column =
    GraftSqlBridge.column(HyperplaneBits(GraftSqlBridge.expression(c)))

  /** Shared by the interpreted path and the generated code. */
  def compute(arr: ArrayData, isDouble: Boolean): Long = {
    val n = math.min(arr.numElements(), Hyperplanes.Dim)
    var fp = 0L
    var j = 0
    while (j < Hyperplanes.Planes) {
      val s = Hyperplanes.signs(j)
      var acc = 0.0
      var k = 0
      while (k < n) {
        val x = if (isDouble) arr.getDouble(k) else arr.getFloat(k).toDouble
        acc += x * s(k)
        k += 1
      }
      if (acc > 0) fp |= 1L << j
      j += 1
    }
    fp
  }
}
