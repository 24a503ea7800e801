package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd element-wise subtraction of two numeric array columns
  * (float or double elements), producing array<double> — the residual
  * v − centroid(cell) of the residual-IVF-PQ family
  * ([[graft.operators.VectorOps.residuals]]).
  *
  * Exists for the same reason as [[DotProduct]]: the `zip_with` lambda
  * evaluates INTERPRETED, outside whole-stage codegen, and the residual
  * encode runs it once per corpus row (dim interpreted dispatches each)
  * right before the ks·m codegen'd argmin distances — a seam in an
  * otherwise compiled projection. This compiles to a primitive loop
  * filling a double[]. Values are bit-identical to
  * `zip_with(a, b, (x, c) => x.cast("double") - c)` on the equal-length,
  * null-free inputs the operators feed it.
  *
  * Null semantics follow [[DotProduct]]'s poison contract (simpler and
  * stricter than zip_with's element-null padding, which the residual
  * paths never exercise): a null array, arrays of different lengths, or
  * a null ELEMENT all yield a null result.
  */
case class VectorSubtract(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_sub requires array<float|double> inputs, " +
          s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def mayHaveNullElements: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val leftIsFloat = elemType(left) == FloatType
    val rightIsFloat = elemType(right) == FloatType
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (mayHaveNullElements && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xv = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      out(i) = xv - yv
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet =
      if (elemType(left) == FloatType) (v: String, i: String) => s"(double) $v.getFloat($i)"
      else (v: String, i: String) => s"$v.getDouble($i)"
    val rGet =
      if (elemType(right) == FloatType) (v: String, i: String) => s"(double) $v.getFloat($i)"
      else (v: String, i: String) => s"$v.getDouble($i)"
    val unsafeArray = "org.apache.spark.sql.catalyst.expressions.UnsafeArrayData"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val arr = ctx.freshName("arr")
      val nullElemCheck =
        if (mayHaveNullElements)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double[] $arr = new double[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullElemCheck
         |    $arr[$i] = ${lGet(a, i)} - ${rGet(b, i)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $unsafeArray.fromPrimitiveArray($arr); }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorSubtract =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_sub"
}
