package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product over two numeric arrays, accumulating in
  * double with a left-to-right fold — semantically identical to
  * `aggregate(zip_with(a, b, (x,y) => x.cast(double)*y.cast(double)),
  * 0.0, _+_)` (see [[VectorFunctions.dot]]) but compiled to a tight
  * primitive loop instead of per-element lambda dispatch over boxed
  * rows. On the brute-force similarity path (|pairs| × dim element
  * ops) this is the hot spot: the HOF form spends most of its time in
  * GenericArrayData boxing, ~5-10× slower than this loop.
  *
  * The fold order (ascending index, double accumulator starting at
  * 0.0) is part of the CONTRACT — the DuckDB oracles replicate it
  * bit-exactly. Do not vectorize into pairwise/tree sums.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def elemGetter(t: DataType): String = t match {
    case ArrayType(FloatType, _) => "getFloat"
    case _ => "getDouble"
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val leftFloat = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val rightFloat = right.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gx = elemGetter(left.dataType)
    val gy = elemGetter(right.dataType)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.$gx($i) * (double) $b.$gy($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Column wrapper: `VecDot(a, b)`. */
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(VecDot(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
