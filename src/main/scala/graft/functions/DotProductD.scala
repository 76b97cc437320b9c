package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the dot product of two
  * `array<double>` columns — the double-width sibling of
  * [[DotProduct]] and the target of [[graft.plans.RewriteHofDot]]'s
  * double-case rewrite of the interpreted higher-order form
  * `aggregate(zip_with(a, b, (x, y) => x * y), 0.0, _ + _)`.
  *
  * The k-means family ([[graft.operators.KMeans]]: p8 fit, d14
  * SemDeDup assignment + within-cluster pair cosines, c17's semantic
  * stage) runs this dot per row per centroid/pair over 64-dim double
  * vectors; the HOF form pays interpreted lambda dispatch per ELEMENT
  * (CodegenFallback), which round-15 profiling measured as the
  * dominant per-task cost of d14.
  *
  * Arithmetic is IDENTICAL to the HOF form on equal-width,
  * non-null-element vectors (the engine's embedding contract): one
  * ascending-index multiply-accumulate pass — IEEE-deterministic, so
  * the rewrite cannot change any oracle hash (FunctionsSpec asserts
  * bit-equality).
  *
  * Null semantics: null if either array is null; mismatched lengths
  * score the common prefix (same deliberate divergence from the
  * padded-zip_with null as [[DotProduct]], out of contract).
  */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<double>, array<double>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot_d"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var d = 0.0; var i = 0
    while (i < n) {
      d += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $d = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $d += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductD =
    copy(left = newLeft, right = newRight)
}
