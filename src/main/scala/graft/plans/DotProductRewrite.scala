package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import graft.functions.DotProduct

/** Optimizer rule: rewrite the higher-order-function dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * into the codegen'd [[DotProduct]] expression. The HOF pattern evaluates
  * its lambdas interpreted (outside whole-stage codegen); the rewrite is
  * sound because [[DotProduct]] reproduces the fold's null semantics
  * exactly — null array, length mismatch (zip_with pads with null, which
  * poisons the fold), or null element all yield null — and accumulates in
  * the same ascending order. Casts to double inside the multiply lambda
  * are accepted (they are how the Column API writes `x * y` over
  * float/double elements) and anything else is left untouched.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def stripDoubleCast(e: Expression): Expression = e match {
    case c: Cast if c.dataType == DoubleType => c.child
    case other => other
  }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean =
    stripDoubleCast(e) match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case _ => false
    }

  private def supportedArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  private def isDotPattern(zw: ZipWith, merge: LambdaFunction,
                           finish: LambdaFunction): Boolean =
    (zw.function, merge, finish) match {
      case (LambdaFunction(mul, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _),
            LambdaFunction(add, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(f: NamedLambdaVariable), _)) =>
        val mulOk = mul match {
          case m: Multiply => isVar(m.left, x) && isVar(m.right, y)
          case _ => false
        }
        val addOk = add match {
          case a: Add => isVar(a.left, acc) && isVar(a.right, v)
          case _ => false
        }
        mulOk && addOk && isVar(fin, f)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(zw: ZipWith, Literal(zero: Double, DoubleType),
                        merge: LambdaFunction, finish: LambdaFunction)
        if zero == 0.0 && supportedArray(zw.left) && supportedArray(zw.right) &&
          isDotPattern(zw, merge, finish) =>
      DotProduct(zw.left, zw.right)
  }
}
