package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression for random-hyperplane LSH bucket
  * assignment — `graft_lsh_buckets(emb, planes)` maps an `array<float>`
  * embedding to one sign-bit bucket id per hash table (`array<int>`),
  * the corpus-wide hot loop of the s2 ANN path
  * ([[graft.operators.Similarity.s2KnnLsh]]).
  *
  * Same parameterized-expression pattern as [[PqEncode]]: the
  * hyperplane tensor (tables × planes × dim) arrives as a foldable
  * nested-array literal, is materialized once driver-side, and is baked
  * into the generated stage via `ctx.addReferenceObj` — the per-row
  * work runs inside whole-stage codegen with zero allocation beyond the
  * result array.
  *
  * Arithmetic is IDENTICAL to the compiled closure it supersedes
  * (float widened to double, ascending-dim summation, bucket bit set on
  * dot ≥ 0), so the dispatch can never change a bucket id
  * (FunctionsSpec asserts exact equality).
  */
case class LshBuckets(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _),
            ArrayType(ArrayType(ArrayType(DoubleType, _), _), _)) =>
        if (right.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a foldable (literal) hyperplane tensor")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float>, array<array<array<double>>>), got ($l, $r)")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_lsh_buckets"

  /** Hyperplane tensor, materialized once from the foldable argument. */
  @transient private lazy val planes: Array[Array[Array[Double]]] = {
    val ad = right.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements()) { t =>
      val pt = ad.getArray(t)
      Array.tabulate(pt.numElements())(p => pt.getArray(p).toDoubleArray())
    }
  }

  override def nullSafeEval(e: Any, b: Any): Any = {
    val v = e.asInstanceOf[ArrayData]
    val buckets = new Array[Int](planes.length)
    var t = 0
    while (t < planes.length) {
      val tbl = planes(t)
      var bucket = 0; var p = 0
      while (p < tbl.length) {
        val plane = tbl(p)
        val n = math.min(v.numElements(), plane.length)
        var s = 0.0; var d = 0
        while (d < n) { s += v.getFloat(d) * plane(d); d += 1 }
        if (s >= 0) bucket |= (1 << p)
        p += 1
      }
      buckets(t) = bucket
      t += 1
    }
    new GenericArrayData(buckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, _) => {
      val pl = ctx.addReferenceObj("lshPlanes", planes, "double[][][]")
      val buckets = ctx.freshName("buckets")
      val t = ctx.freshName("t"); val p = ctx.freshName("p")
      val d = ctx.freshName("d"); val n = ctx.freshName("n")
      val tbl = ctx.freshName("tbl"); val plane = ctx.freshName("plane")
      val bucket = ctx.freshName("bucket"); val s = ctx.freshName("s")
      s"""
         |final int[] $buckets = new int[$pl.length];
         |for (int $t = 0; $t < $pl.length; $t++) {
         |  final double[][] $tbl = $pl[$t];
         |  int $bucket = 0;
         |  for (int $p = 0; $p < $tbl.length; $p++) {
         |    final double[] $plane = $tbl[$p];
         |    final int $n = java.lang.Math.min($e.numElements(), $plane.length);
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      $s += $e.getFloat($d) * $plane[$d];
         |    }
         |    if ($s >= 0) $bucket |= (1 << $p);
         |  }
         |  $buckets[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($buckets);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LshBuckets =
    copy(left = newLeft, right = newRight)
}
