package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.{DotProduct, DotProductD}

/** Optimizer rule: rewrite the idiomatic-but-interpreted higher-order
  * dot product
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v) }}}
  * over two `array<float>` columns into the codegen'd native
  * [[graft.functions.DotProduct]] — and the same shape over two
  * `array<double>` columns into [[graft.functions.DotProductD]] (the
  * k-means/SemDeDup hot loop, which keeps doubles end-to-end for
  * DuckDB `list_inner_product` bit-parity).
  *
  * Why a rule and not just the `graft_dot` function: Spark's
  * higher-order array expressions are CodegenFallback — every row pays
  * interpreted lambda dispatch per ELEMENT — so the declarative form
  * users naturally write is an order of magnitude slower than the
  * fused loop. With this rule injected
  * (`spark.sql.extensions=graft.GraftExtensions`) the pretty form and
  * the fast form are the same thing; un-extended sessions still run
  * the interpreted original, same results.
  *
  * Safety: fires only on the EXACT shape above (double-cast multiply
  * inside zip_with, 0.0 seed, plain add merge, identity finish, both
  * children `array<float>`). Arithmetic of the replacement is
  * bit-identical on the engine's vector contract (equal-width,
  * non-null elements) — float widened to double, ascending-index
  * summation (FunctionsSpec asserts bit-equality). Out-of-contract
  * inputs differ only where the HOF form returns null from padded
  * zip_with (unequal lengths) vs the native common-prefix sum.
  */
object RewriteHofDot extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** The expression is `v` itself, optionally under a cast to double. */
  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nlv: NamedLambdaVariable => nlv.exprId == v.exprId
    case c: Cast if c.dataType == DoubleType => isVar(c.child, v)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(mul: Multiply,
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(add: Add,
            Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
          LambdaFunction(fin, Seq(facc: NamedLambdaVariable), _))
          if (isFloatArray(a) && isFloatArray(b) ||
              isDoubleArray(a) && isDoubleArray(b)) &&
            ((isVar(mul.left, x) && isVar(mul.right, y)) ||
              (isVar(mul.left, y) && isVar(mul.right, x))) &&
            ((isVar(add.left, acc) && isVar(add.right, el)) ||
              (isVar(add.left, el) && isVar(add.right, acc))) &&
            isVar(fin, facc) =>
        if (isFloatArray(a)) DotProduct(a, b) else DotProductD(a, b)
    }
}
