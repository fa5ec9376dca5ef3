package org.apache.spark.sql.graftnative

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: fuse the declarative dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, x) -> acc + x)
  *
  * into the codegen'd [[DotProduct]] kernel. Users (and the engine's
  * own HOF-form APIs) write the readable higher-order formulation;
  * plans execute the fused loop — no intermediate array, no
  * interpreted lambdas (CodegenFallback), one pass over the two
  * vector buffers.
  *
  * The rewrite is semantics-preserving on ALL inputs: DotProduct
  * returns NULL on null input, length mismatch, or a null element —
  * exactly what the HOF form yields via zip_with's null padding and
  * null propagation through the sum — and accumulates left-to-right
  * in the same order, so the fused plan is bit-identical even on
  * ragged or null-element arrays.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def sameVars(u1: Expression, u2: Expression,
                       v1: NamedExpression, v2: NamedExpression): Boolean =
    (u1, u2) match {
      case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
        (a.exprId == v1.exprId && b.exprId == v2.exprId) ||
          (a.exprId == v2.exprId && b.exprId == v1.exprId)
      case _ => false
    }

  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b, LambdaFunction(Multiply(m1, m2, _), Seq(x: NamedExpression, y: NamedExpression), _)),
        Literal(0.0, DoubleType),
        LambdaFunction(Add(s1, s2, _), Seq(acc: NamedExpression, e: NamedExpression), _),
        finish)
      if sameVars(m1, m2, x, y) && sameVars(s1, s2, acc, e) &&
        isIdentityFinish(finish) && isDoubleArray(a) && isDoubleArray(b) =>
      DotProduct(a, b)
  }
}
