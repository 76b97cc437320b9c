package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression for coarse-quantizer cell assignment —
  * `graft_nearest_centroid(emb, cents)` returns the index of the
  * squared-L2-nearest centroid (strict <, lowest index on ties — the
  * Lloyd assignment rule), the corpus-wide hot loop of the s6 IVF path
  * ([[graft.operators.Similarity.s6KnnIvf]]).
  *
  * Same parameterized pattern as [[PqEncode]]/[[LshBuckets]]: the
  * centroid matrix (k × dim) arrives as a foldable nested-array
  * literal and is baked into the generated stage via
  * `ctx.addReferenceObj`. Arithmetic identical to the compiled UDF it
  * supersedes (float widened to double, ascending-dim accumulation),
  * asserted cell-for-cell in FunctionsSpec.
  */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        if (right.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a foldable (literal) centroid matrix")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float>, array<array<double>>), got ($l, $r)")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_nearest_centroid"

  /** Centroid matrix, materialized once from the foldable argument. */
  @transient private lazy val cents: Array[Array[Double]] = {
    val ad = right.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(c => ad.getArray(c).toDoubleArray())
  }

  override def nullSafeEval(e: Any, b: Any): Any = {
    val v = e.asInstanceOf[ArrayData]
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      val n = math.min(v.numElements(), ct.length)
      var d = 0.0; var i = 0
      while (i < n) { val t = v.getFloat(i) - ct(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, _) => {
      val ck = ctx.addReferenceObj("ivfCents", cents, "double[][]")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c"); val ct = ctx.freshName("ct")
      val n = ctx.freshName("n"); val d = ctx.freshName("d")
      val i = ctx.freshName("i"); val t = ctx.freshName("t")
      s"""
         |int $best = 0; double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c < $ck.length; $c++) {
         |  final double[] $ct = $ck[$c];
         |  final int $n = java.lang.Math.min($e.numElements(), $ct.length);
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $t = $e.getFloat($i) - $ct[$i];
         |    $d += $t * $t;
         |  }
         |  if ($d < $bestD) { $bestD = $d; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)
}
