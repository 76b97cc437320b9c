package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** D79: closed-form MULTIVARIATE least squares over lineitem —
  * `price_cents ~ intercept + quantity + discount_pct + tax_pct` via
  * the normal equations XᵀXβ = Xᵀy (SURVEY.md §2.B12; the same
  * one-pass-moments-then-driver-solve shape as the reference PCA's
  * covariance route,
  * /root/reference/src/main/scala/com/nvidia/rapids/ml/RapidsPCA.scala:110-140
  * — there the Gram matrix feeds an eigensolve, here a 4×4 linear
  * solve; p7 covers the single-feature case, this is the general one).
  *
  * Scale shape: ONE partial-aggregated pass over the fact table
  * producing 14 mergeable moments (no shuffle of data rows — the agg
  * reduces map-side to a single 14-column row); the 4×4 solve is
  * driver-side O(1). This is how closed-form regression should run at
  * 100 TB: moments commute, so no row order, partitioning, or executor
  * count can change the answer.
  *
  * Determinism: features and target are quantized to exact integers
  * (quantity is integral; discount/tax/price are 2-dp decimals →
  * ×100), so every moment is an EXACT integer sum (DECIMAL(38,0) in
  * Spark, HUGEINT in DuckDB — both overflow-free); the only floating
  * point is the final determinant arithmetic, and both engines
  * evaluate the SAME 24-term Leibniz expansion in the SAME
  * lexicographic term order with left-associated products ([[detSql]]
  * and [[detVal]] are generated from one permutation list), so the
  * coefficients are bit-identical before the 4-dp round. */
object Ols {

  private def parity(p: Seq[Int]): Int = {
    val inv = (for {
      i <- p.indices
      j <- i + 1 until p.length
      if p(i) > p(j)
    } yield 1).sum
    if (inv % 2 == 0) 1 else -1
  }

  /** Lexicographic 4-element permutations with signs — the shared term
    * order for both determinant evaluators. */
  private val perms: Seq[(Int, Seq[Int])] =
    (0 to 3).permutations.map(p => (parity(p), p.toSeq)).toSeq

  // normal-equation matrix A = XᵀX and vector b = Xᵀy, as moment names
  private val aGrid = Vector(
    Vector("n", "sq", "sd", "st"),
    Vector("sq", "sqq", "sqd", "sqt"),
    Vector("sd", "sqd", "sdd", "sdt"),
    Vector("st", "sqt", "sdt", "stt"))
  private val bNames = Vector("sy", "sqy", "sdy", "sty")

  /** Entry (r,c) of A with column `mat` replaced by b (`mat` = -1 for
    * A itself) — Cramer's rule. */
  private def ename(mat: Int, r: Int, c: Int): String =
    if (c == mat) bNames(r) else aGrid(r)(c)

  /** The Leibniz expansion as SQL over named DOUBLE columns; starts at
    * literal 0 so the add/subtract chain associates exactly like
    * [[detVal]]'s fold. */
  private def detSql(mat: Int): String =
    "0 " + perms.map { case (s, p) =>
      val prod = (0 until 4).map(r => ename(mat, r, p(r))).mkString(" * ")
      (if (s > 0) "+" else "-") + s" ($prod)"
    }.mkString(" ")

  /** The same expansion over a moment map — identical op order. */
  private def detVal(mat: Int, m: Map[String, Double]): Double =
    perms.foldLeft(0.0) { case (acc, (s, p)) =>
      val prod = (0 until 4).foldLeft(1.0)((pr, r) => pr * m(ename(mat, r, p(r))))
      if (s > 0) acc + prod else acc - prod
    }

  private val features =
    Seq((0, "intercept"), (1, "quantity"), (2, "discount_pct"), (3, "tax_pct"))

  def p9OlsMulti(spark: SparkSession, dir: String): DataFrame =
    solveFromMoments(spark, dir, 0L)

  /** Ridge penalty for [[p10Ridge]], in QUANTIZED-design units (the
    * features the moments are built from: raw quantity, ×100
    * discount/tax). λ is added to the non-intercept diagonal of XᵀX,
    * the standard don't-penalize-the-intercept convention. */
  val ridgeLambda = 1000000L

  /** D89: ridge (L2-regularized) regression — the same one-pass exact
    * moments as p9, with XᵀX + λI (intercept unpenalized) fed to the
    * identical shared-by-construction Cramer solve. Regularization
    * changes ONE driver-side addition, not the data pass: at 100 TB
    * the cost is exactly p9's single partial-aggregated scan. λ shifts
    * integer-exact moments by an integer, so both engines still
    * evaluate the same 24-term expansion on bit-identical doubles. */
  def p10Ridge(spark: SparkSession, dir: String): DataFrame =
    solveFromMoments(spark, dir, ridgeLambda)

  /** Shared p9/p10 body: one-pass exact moments, optional ridge shift
    * on the non-intercept diagonal, driver Cramer solve. */
  private def solveFromMoments(spark: SparkSession, dir: String,
      lam: Long): DataFrame = {
    import spark.implicits._
    def s(e: Column, n: String) = sum(e.cast("decimal(38,0)")).as(n)
    val li = Tables.lineitem(spark, dir).select(
      round($"l_quantity").cast("long").as("q"),
      round($"l_discount" * 100).cast("long").as("d"),
      round($"l_tax" * 100).cast("long").as("t"),
      round($"l_extendedprice" * 100).cast("long").as("y"))
    val row = li.agg(
      count(lit(1)).as("n"),
      s($"q", "sq"), s($"d", "sd"), s($"t", "st"), s($"y", "sy"),
      s($"q" * $"q", "sqq"), s($"q" * $"d", "sqd"), s($"q" * $"t", "sqt"),
      s($"d" * $"d", "sdd"), s($"d" * $"t", "sdt"), s($"t" * $"t", "stt"),
      s($"q" * $"y", "sqy"), s($"d" * $"y", "sdy"), s($"t" * $"y", "sty"))
      .head()
    val m0 = row.schema.fieldNames.zipWithIndex.map { case (name, i) =>
      name -> (row.get(i) match {
        case l: java.lang.Long => l.toDouble
        case bd: java.math.BigDecimal => bd.doubleValue
      })
    }.toMap
    val m = m0 ++ Seq("sqq", "sdd", "stt")
      .map(k => k -> (m0(k) + lam.toDouble))
    val da = detVal(-1, m)
    features.map { case (idx, feat) =>
      (idx, feat,
        BigDecimal(detVal(idx, m) / da)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toDF("idx", "feature", "coef").orderBy($"idx")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p9_ols_multi" -> p9OlsMulti,
    "p10_ridge" -> p10Ridge)

  private val momentNames =
    Seq("sq", "sd", "st", "sy", "sqq", "sqd", "sqt", "sdd", "sdt", "stt",
      "sqy", "sdy", "sty")

  /** DuckDB replay: identical quantization, HUGEINT-exact moments,
    * and the SAME generated Leibniz expansion — the float path is
    * shared by construction. `lam` adds the ridge shift to the
    * non-intercept diagonal, mirroring [[solveFromMoments]] (p9 = 0,
    * which emits no `+` so the p9 SQL text is unchanged). */
  private def oracleSql(lam: Long): String = {
    val sums = Seq("q" -> "sq", "d" -> "sd", "t" -> "st", "y" -> "sy",
      "q*q" -> "sqq", "q*d" -> "sqd", "q*t" -> "sqt",
      "d*d" -> "sdd", "d*t" -> "sdt", "t*t" -> "stt",
      "q*y" -> "sqy", "d*y" -> "sdy", "t*y" -> "sty")
      .map { case (e, n) => s"sum($e) AS $n" }.mkString(", ")
    val diag = Set("sqq", "sdd", "stt")
    val casts = ("n" +: momentNames)
      .map(n => if (lam != 0L && diag(n))
        s"CAST($n AS DOUBLE) + $lam AS $n"
      else s"CAST($n AS DOUBLE) AS $n").mkString(", ")
    val dets = (-1 to 3)
      .map(i => s"(${detSql(i)}) AS d${if (i < 0) "a" else i.toString}")
      .mkString(", ")
    val vals = features.map { case (i, f) => s"($i, '$f')" }.mkString(", ")
    s"""WITH li AS (SELECT
            CAST(round(l_quantity) AS BIGINT) AS q,
            CAST(round(l_discount * 100) AS BIGINT) AS d,
            CAST(round(l_tax * 100) AS BIGINT) AS t,
            CAST(round(l_extendedprice * 100) AS BIGINT) AS y
          FROM lineitem),
        m AS (SELECT CAST(count(*) AS BIGINT) AS n, $sums FROM li),
        dd AS (SELECT $casts FROM m),
        dets AS (SELECT $dets FROM dd)
        SELECT idx, feature,
          round(CASE idx WHEN 0 THEN d0 WHEN 1 THEN d1
                         WHEN 2 THEN d2 ELSE d3 END / da, 4) AS coef
        FROM dets CROSS JOIN (VALUES $vals) AS v(idx, feature)
        ORDER BY idx"""
  }

  val oracle: Map[String, String] = Map(
    "p9_ols_multi" -> oracleSql(0L),
    "p10_ridge" -> oracleSql(ridgeLambda))
}
