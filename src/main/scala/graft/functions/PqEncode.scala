package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression for product-quantization encoding —
  * `graft_pq_encode(emb, books)` maps an `array<float>` embedding to
  * its per-subspace nearest-centroid codes (`array<int>`), the
  * corpus-wide hot loop of the s7 ANN path
  * ([[graft.operators.Similarity.s7KnnPq]]).
  *
  * This is the PARAMETERIZED-expression pattern: the codebook arrives
  * as a foldable nested-array literal (second argument), is
  * materialized ONCE driver-side into a `double[][][]`, and is then
  * baked into the generated code via `ctx.addReferenceObj` — so the
  * per-row loop runs inside whole-stage codegen with zero allocation
  * and no `Seq[Float]` boxing, where the compiled-UDF form it
  * supersedes pays a codegen-boundary row copy plus a WrappedArray per
  * row per side.
  *
  * Arithmetic is IDENTICAL to the UDF form (float widened to double,
  * L2 normalization by DIVISION — not reciprocal multiplication, which
  * rounds differently — zero-norm vectors pass through unnormalized,
  * squared-L2 argmin with strict < and lowest-index ties, ascending
  * element order), so swapping the UDF for this expression cannot
  * change a single code (FunctionsSpec asserts exact equality).
  */
case class PqEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _),
            ArrayType(ArrayType(ArrayType(DoubleType, _), _), _)) =>
        if (right.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a foldable (literal) codebook")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float>, array<array<array<double>>>), got ($l, $r)")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_pq_encode"

  /** Codebook, materialized once from the foldable argument. */
  @transient private lazy val books: Array[Array[Array[Double]]] = {
    val ad = right.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements()) { m =>
      val bm = ad.getArray(m)
      Array.tabulate(bm.numElements())(c => bm.getArray(c).toDoubleArray())
    }
  }

  override def nullSafeEval(e: Any, b: Any): Any = {
    val v = e.asInstanceOf[ArrayData]
    val n = v.numElements()
    var ss = 0.0; var i = 0
    while (i < n) { val x = v.getFloat(i).toDouble; ss += x * x; i += 1 }
    val s = math.sqrt(ss)
    val m0 = books.length
    val sub = if (m0 == 0) 0 else n / m0
    val codes = new Array[Int](m0)
    var m = 0
    while (m < m0) {
      val book = books(m); val off = m * sub
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < book.length) {
        val ct = book(c); var d = 0.0; var j = 0
        while (j < sub) {
          val x = v.getFloat(off + j).toDouble
          val t = (if (s == 0.0) x else x / s) - ct(j)
          d += t * t; j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(m) = best
      m += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, _) => {
      val bk = ctx.addReferenceObj("pqBooks", books, "double[][][]")
      val n = ctx.freshName("n"); val ss = ctx.freshName("ss")
      val s = ctx.freshName("s"); val sub = ctx.freshName("sub")
      val codes = ctx.freshName("codes")
      val i = ctx.freshName("i"); val m = ctx.freshName("m")
      val c = ctx.freshName("c"); val j = ctx.freshName("j")
      val book = ctx.freshName("book"); val ct = ctx.freshName("ct")
      val off = ctx.freshName("off"); val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD"); val d = ctx.freshName("d")
      val x = ctx.freshName("x"); val t = ctx.freshName("t")
      s"""
         |final int $n = $e.numElements();
         |double $ss = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = (double) $e.getFloat($i);
         |  $ss += $x * $x;
         |}
         |final double $s = java.lang.Math.sqrt($ss);
         |final int $sub = ($bk.length == 0) ? 0 : $n / $bk.length;
         |final int[] $codes = new int[$bk.length];
         |for (int $m = 0; $m < $bk.length; $m++) {
         |  final double[][] $book = $bk[$m];
         |  final int $off = $m * $sub;
         |  int $best = 0; double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $book.length; $c++) {
         |    final double[] $ct = $book[$c];
         |    double $d = 0.0;
         |    for (int $j = 0; $j < $sub; $j++) {
         |      final double $x = (double) $e.getFloat($off + $j);
         |      final double $t = (($s == 0.0) ? $x : $x / $s) - $ct[$j];
         |      $d += $t * $t;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  $codes[$m] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}
