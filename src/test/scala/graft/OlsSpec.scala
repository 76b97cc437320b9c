package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ols
import graft.sources.Tables

/** Semantics guard for D79: the one-pass-moments + Cramer solve must
  * agree with an independent dense least-squares solve (Breeze QR via
  * `\`) on the same quantized design matrix — two entirely different
  * numerical routes to the same β. */
class OlsSpec extends AnyFunSuite {
  import TestSpark._

  test("p9 coefficients match a Breeze dense least-squares solve") {
    import TestSpark.spark.implicits._
    import breeze.linalg.{DenseMatrix, DenseVector}
    val rows = Tables.lineitem(spark, sf)
      .select($"l_quantity", $"l_discount", $"l_tax", $"l_extendedprice")
      .collect()
      .map { r =>
        (math.round(r.getDouble(0)).toDouble,
          math.round(r.getDouble(1) * 100).toDouble,
          math.round(r.getDouble(2) * 100).toDouble,
          math.round(r.getDouble(3) * 100).toDouble)
      }
    val x = DenseMatrix.tabulate(rows.length, 4) { (i, j) =>
      j match {
        case 0 => 1.0
        case 1 => rows(i)._1
        case 2 => rows(i)._2
        case 3 => rows(i)._3
      }
    }
    val y = DenseVector(rows.map(_._4))
    val beta = x \ y
    val got = Ols.p9OlsMulti(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    assert(got.map(_._2).toSeq ==
      Seq("intercept", "quantity", "discount_pct", "tax_pct"))
    got.foreach { case (idx, feat, coef) =>
      val ref = beta(idx)
      assert(math.abs(coef - ref) <= 1e-4 * math.max(1.0, math.abs(ref)),
        s"$feat: cramer $coef vs breeze $ref")
    }
    // non-degenerate: the fixture's mean price is far from zero, so a
    // well-posed solve must put the intercept near the sample mean
    // (features are uncorrelated with price in this synthetic data)
    assert(got.forall { case (_, _, c) =>
      !c.isNaN && !c.isInfinite }, "singular normal equations")
    assert(math.abs(got(0)._3) > 1e5,
      "intercept should carry the (cents-scale) mean price")
  }

  test("p10 ridge matches a Breeze regularized solve and shrinks toward p9") {
    import TestSpark.spark.implicits._
    import breeze.linalg.{DenseMatrix, DenseVector, inv}
    val rows = Tables.lineitem(spark, sf)
      .select($"l_quantity", $"l_discount", $"l_tax", $"l_extendedprice")
      .collect()
      .map { r =>
        (math.round(r.getDouble(0)).toDouble,
          math.round(r.getDouble(1) * 100).toDouble,
          math.round(r.getDouble(2) * 100).toDouble,
          math.round(r.getDouble(3) * 100).toDouble)
      }
    val x = DenseMatrix.tabulate(rows.length, 4) { (i, j) =>
      j match {
        case 0 => 1.0
        case 1 => rows(i)._1
        case 2 => rows(i)._2
        case 3 => rows(i)._3
      }
    }
    val y = DenseVector(rows.map(_._4))
    val xtx = x.t * x
    for (j <- 1 to 3) xtx(j, j) += Ols.ridgeLambda.toDouble
    val beta = inv(xtx) * (x.t * y)
    val got = Ols.p10Ridge(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    got.foreach { case (idx, feat, coef) =>
      val ref = beta(idx)
      assert(math.abs(coef - ref) <= 1e-3 * math.max(1.0, math.abs(ref)),
        s"$feat: cramer $coef vs breeze $ref")
    }
    // the penalty must actually bite: some non-intercept coefficient
    // moves vs the unregularized p9 solve (element-wise shrinkage is
    // only guaranteed for orthogonal designs, so assert difference,
    // not direction)
    val ols = Ols.p9OlsMulti(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(got.filter(_._1 > 0).exists { case (idx, _, coef) =>
      math.abs(coef - ols(idx)) > 1e-4 }, "ridge penalty had no effect")
  }

  test("p11 logistic IRLS trace equals a driver integer-moments replay") {
    import graft.operators.Logistic
    def r4(v: Double) =
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def rnd(v: Double): Long =
      BigDecimal(v).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val docs = Tables.documents(spark, sf).select("n_chars", "lang")
      .collect()
      .map(r => (r.getLong(0) / 100L, if (r.getString(1) == "en") 1L else 0L))
    def step(beta: Option[(Double, Double)]): (Double, Double) = {
      var sw, swx, swxx, swz, swxz = BigInt(0)
      docs.foreach { case (x, y) =>
        val (etaq, pq) = beta match {
          case None => (0L, 500000L)
          case Some((b0, b1)) =>
            val e = rnd((b0 + b1 * x.toDouble) * 1e6)
            val p = 1.0 / (1.0 + math.exp(-(e.toDouble / 1e6)))
            (e, math.min(Logistic.pqMax,
              math.max(Logistic.pqMin, rnd(p * 1e6))))
        }
        val wq = pq * (1000000L - pq)
        val zq = etaq + math.floor(
          ((y * 1000000L - pq).toDouble * 1e12) / wq.toDouble).toLong
        sw += wq; swx += BigInt(wq) * x; swxx += BigInt(wq) * x * x
        swz += BigInt(wq) * zq; swxz += BigInt(wq) * x * zq
      }
      val (dsw, dswx, dswxx, dswz, dswxz) = (sw.toDouble, swx.toDouble,
        swxx.toDouble, swz.toDouble, swxz.toDouble)
      val det = dsw * dswxx - dswx * dswx
      ((dswz * dswxx - dswx * dswxz) / det / 1e6,
        (dsw * dswxz - dswx * dswz) / det / 1e6)
    }
    val b1 = step(None)
    val b2 = step(Some(b1))
    val expected = Seq(
      (1, 0, "intercept", r4(b1._1)), (1, 1, "hecto_chars", r4(b1._2)),
      (2, 0, "intercept", r4(b2._1)), (2, 1, "hecto_chars", r4(b2._2)))
    val got = Logistic.p11Logistic(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getDouble(3)))
      .toSeq
    assert(got == expected)
    // step 1 is the exact closed form (p = 1/2): finite, and the second
    // step must stay in the same neighborhood (IRLS step, not a blowup)
    assert(math.abs(b2._1 - b1._1) < 1.0 && math.abs(b2._2 - b1._2) < 1.0)
  }
}
