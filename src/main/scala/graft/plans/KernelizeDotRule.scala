package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.expressions.DotProduct

/** Auto-kernelization optimizer rule #2 (injected via
  * [[graft.GraftExtensions]]): rewrites the idiomatic SQL dot product
  *
  *   aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS
  *   DOUBLE)), 0D, (s, x) -> s + x)
  *
  * over two float-array columns into the codegen'd [[DotProduct]] kernel.
  * The HOF chain materializes the product array and evaluates both
  * lambdas interpreted (CodegenFallback) — per row that is an allocation
  * plus 2·dim closure dispatches; the kernel is one fused generated loop.
  * This is the exact spelling the engine's own docs recommend for ad-hoc
  * similarity SQL, so users get kernel speed without knowing the kernel
  * exists.
  *
  * Semantics guarded, conservatively:
  *   - both arrays must be array<float> and DETERMINISTIC expressions
  *     (they are duplicated into the size guard);
  *   - the zip lambda must multiply BOTH variables through an explicit
  *     double cast — `x * y` without casts is a FLOAT multiply whose
  *     rounding differs from the kernel's double multiply, and is left
  *     untouched;
  *   - the fold must be a bare `s + x` (either operand order) with a
  *     literal 0.0 zero and an identity finish lambda;
  *   - zip_with PADS ragged arrays with null (⇒ the aggregate returns
  *     null) while the kernel truncates to the shorter length, so the
  *     rewrite wraps the kernel in `if(size(a) = size(b), kernel, null)`
  *     — bit-identical on every input, including nulls (size(null)
  *     comparisons never yield true).
  */
object KernelizeDotProduct extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** The zip lambda body must be CAST(x AS D) * CAST(y AS D) over exactly
    * the two lambda variables, in either order. */
  private def isDoubleMul(body: Expression, x: NamedLambdaVariable,
                          y: NamedLambdaVariable): Boolean = body match {
    case Multiply(Cast(l: NamedLambdaVariable, DoubleType, _, _),
                  Cast(r: NamedLambdaVariable, DoubleType, _, _), _) =>
      (l.exprId == x.exprId && r.exprId == y.exprId) ||
        (l.exprId == y.exprId && r.exprId == x.exprId)
    case _ => false
  }

  /** The fold must be acc + elem (either order) over the two lambda
    * variables; zip_with already produced doubles so no casts appear. */
  private def isPlainSum(body: Expression, acc: NamedLambdaVariable,
                         elem: NamedLambdaVariable): Boolean = body match {
    case Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _) =>
      (l.exprId == acc.exprId && r.exprId == elem.exprId) ||
        (l.exprId == elem.exprId && r.exprId == acc.exprId)
    case _ => false
  }

  private def isIdentity(finish: Expression): Boolean = finish match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(p: NamedLambdaVariable), _) =>
      v.exprId == p.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case agg @ ArrayAggregate(
        ZipWith(a, b, LambdaFunction(mul, Seq(x: NamedLambdaVariable,
          y: NamedLambdaVariable), _)),
        Literal(0.0, DoubleType),
        LambdaFunction(sum, Seq(acc: NamedLambdaVariable,
          elem: NamedLambdaVariable), _),
        finish)
        if isFloatArray(a) && isFloatArray(b) &&
          a.deterministic && b.deterministic &&
          isDoubleMul(mul, x, y) && isPlainSum(sum, acc, elem) &&
          isIdentity(finish) =>
      If(EqualTo(Size(a), Size(b)), DotProduct(a, b),
        Literal(null, DoubleType))
    case other: ArrayAggregate => other
  }
}
