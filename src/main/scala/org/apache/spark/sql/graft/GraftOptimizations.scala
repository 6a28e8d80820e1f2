package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rewrite (SURVEY §4.3): the documented *semantic* form of
  * the float dot product —
  * `aggregate(zip_with(a, b, (x,y) -> CAST(x AS DOUBLE) * CAST(y AS
  * DOUBLE)), 0D, (acc,v) -> acc+v)` — is replaced by the codegen
  * [[DotProductF32]] loop whenever both inputs are float arrays. Users
  * (and the oracle suite) write the portable HOF; the optimizer
  * supplies the fast path — the same contract Catalyst applies to its
  * own rewrites.
  *
  * Matching is deliberately conservative: any deviation from the
  * canonical shape keeps the original expression. In particular the
  * raw-float multiply `(x,y) -> x*y` is NOT rewritten — its products
  * round to float precision, whereas DotProductF32 multiplies in
  * double, so that rewrite would change results.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** x*y over exactly the two lambda args, allowing only the
    * value-preserving float→double widening cast. Any other cast (e.g.
    * a truncating CAST(x AS INT) re-widened to double) changes the
    * product's value, so stripping it would make the rewrite unsound —
    * those shapes keep the original expression.
    */
  private def isPairwiseMultiply(f: Expression, x: NamedLambdaVariable,
      y: NamedLambdaVariable): Boolean = {
    def strip(e: Expression): Expression = e match {
      case Cast(c, DoubleType, _, _) if c.dataType == FloatType => strip(c)
      case other => other
    }
    f match {
      case Multiply(l, r, _) =>
        (strip(l), strip(r)) match {
          case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
            a.exprId == x.exprId && b.exprId == y.exprId
          case _ => false
        }
      case _ => false
    }
  }

  private def isZeroLiteral(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case Cast(Literal(0, _), DoubleType, _, _) => true
    case _ => false
  }

  /** acc+v (either order) over exactly the two bare merge args.
    *
    * Deliberately no cast-stripping here: the raw-float multiply form
    * `(x,y) -> x*y` produces float-precision products (the analyzer
    * then wraps the merge arg as Cast(v AS DOUBLE)), while
    * DotProductF32 multiplies in double — different rounding, so that
    * shape must NOT rewrite. The canonical rewritten form is the
    * explicit double-cast multiply
    * `(x,y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)`, whose merge args
    * are already double and arrive bare.
    */
  private def isSumMerge(f: Expression, acc: NamedLambdaVariable,
      v: NamedLambdaVariable): Boolean = f match {
    case Add(l, r, _) =>
      val ids = Set(acc.exprId, v.exprId)
      (l, r) match {
        case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
          Set(a.exprId, b.exprId) == ids
        case _ => false
      }
    case _ => false
  }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      body.exprId == arg.exprId
    case _ => false
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(left, right, LambdaFunction(mul, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          zero,
          LambdaFunction(merge, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          finish)
        if isFloatArray(left) && isFloatArray(right) &&
          isPairwiseMultiply(mul, x, y) && isZeroLiteral(zero) &&
          isSumMerge(merge, acc, v) && isIdentity(finish) =>
      DotProductF32(left, right)
  }
}
