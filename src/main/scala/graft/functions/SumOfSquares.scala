package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Σ xᵢ² of an `array<float>` column in double — the inner loop of
  * every L2-norm computation (q16 array-math stats, s4 centroid norms).
  *
  * Same rationale as [[CosineSimilarity]]: the `aggregate(transform(x
  * → x²))` higher-order form it supersedes is interpreted (one lambda
  * dispatch per element), while this codegens a tight loop inside the
  * whole-stage. Arithmetic is identical — float widened to double, one
  * ascending-index pass — so `sqrt(graft_sumsq(a))` is bit-equal to the
  * HOF norm and every oracle hash is preserved (FunctionsSpec).
  */
case class SumOfSquares(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got $other")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_sumsq"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0; var i = 0
    while (i < n) { val xi = x.getFloat(i).toDouble; s += xi * xi; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      s"""
         |final int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = (double) $a.getFloat($i);
         |  $s += $x * $x;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SumOfSquares =
    copy(child = newChild)
}
