package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule (SURVEY §2.10 ladder step c): rewrite the portable
  * higher-order-function dot product
  *
  *   aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  *             0.0, (acc, v) -> acc + v)
  *
  * to the native plans.DotProduct kernel. Users (and SQL clients) write
  * the engine-portable fold; the optimizer swaps in the fused loop. Safe
  * because DotProduct mirrors the fold exactly — same in-order IEEE sum,
  * same null propagation on null arrays / null elements / length
  * mismatch (pinned by VectorMathSpec bit-identity).
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def stripDoubleCast(e: Expression): Expression = e match {
    case c: Cast if c.dataType == DoubleType => c.child
    case other => other
  }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  private def numericArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(prod, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(accRef, vRef, _),
              Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(finishBody, Seq(fin: NamedLambdaVariable), _))
          if numericArray(a) && numericArray(b) &&
            (stripDoubleCast(prod) match {
              case Multiply(l, r, _) =>
                isVar(stripDoubleCast(l), x) && isVar(stripDoubleCast(r), y)
              case _ => false
            }) &&
            isVar(accRef, acc) && isVar(vRef, v) &&
            isVar(finishBody, fin) =>
        DotProduct(a, b)
    }
}
