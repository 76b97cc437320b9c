package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.CacheScope.ScopedPersist

/** D79: closed-form MULTIVARIATE least squares over lineitem —
  * `price_cents ~ intercept + quantity + discount_pct + tax_pct` via
  * the normal equations XᵀXβ = Xᵀy (SURVEY.md §2.B12; the same
  * one-pass-moments-then-driver-solve shape as the reference PCA's
  * covariance route,
  * /root/reference/src/main/scala/org/apache/spark/ml/feature/RapidsPCA.scala:110-140
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

  /** The p9/p10 design projection: lineitem → exact integer features
    * (x1 = quantity, x2 = discount×100, x3 = tax×100) and target
    * (y = price cents). */
  def designFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir).select(
      round($"l_quantity").cast("long").as("x1"),
      round($"l_discount" * 100).cast("long").as("x2"),
      round($"l_tax" * 100).cast("long").as("x3"),
      round($"l_extendedprice" * 100).cast("long").as("y"))
  }

  /** One-pass exact-moments fit over an (x1, x2, x3, y) long-column
    * frame: 14 mergeable integer moments in ONE partial-aggregated
    * scan, the optional ridge shift on the non-intercept diagonal,
    * then the driver-side shared-by-construction Cramer solve.
    * Returns (b0, b1, b2, b3) UNROUNDED — the [[ml.feature.GraftLinear]]
    * estimator and the p9/p10 queries both fit through here, so
    * `model.transform` scores with bit-identical coefficients. */
  def fitExact(df: DataFrame, lam: Long): Array[Double] = {
    def s(e: Column, n: String) = sum(e.cast("decimal(38,0)")).as(n)
    val (c1, c2, c3, cy) = (col("x1"), col("x2"), col("x3"), col("y"))
    val row = df.agg(
      count(lit(1)).as("n"),
      s(c1, "sq"), s(c2, "sd"), s(c3, "st"), s(cy, "sy"),
      s(c1 * c1, "sqq"), s(c1 * c2, "sqd"), s(c1 * c3, "sqt"),
      s(c2 * c2, "sdd"), s(c2 * c3, "sdt"), s(c3 * c3, "stt"),
      s(c1 * cy, "sqy"), s(c2 * cy, "sdy"), s(c3 * cy, "sty"))
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
    (0 to 3).map(i => detVal(i, m) / da).toArray
  }

  /** Shared p9/p10 body: [[fitExact]] over the lineitem design, 4-dp
    * rounded into the (idx, feature, coef) readout. */
  private def solveFromMoments(spark: SparkSession, dir: String,
      lam: Long): DataFrame = {
    import spark.implicits._
    val b = fitExact(designFrame(spark, dir), lam)
    features.map { case (idx, feat) =>
      (idx, feat,
        BigDecimal(b(idx))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toDF("idx", "feature", "coef").orderBy($"idx")
  }

  /** Fold count for [[p12RidgeCv]]. */
  val cvFolds = 3

  /** D155: k-fold cross-validated ridge — per fold, train p10's ridge
    * on the OTHER folds and report held-out RMSE plus the fold's
    * coefficients: the model-selection readout (stable coefficients +
    * flat RMSE across folds = the fit generalizes).
    *
    * The train-on-complement pass is FREE: fold moments partial-
    * aggregate in the same single scan, and each fold's training
    * moments are total − fold — EXACT integer subtraction (the
    * moments commute; no second data pass, no per-fold scan). Each
    * fold solves the identical shared-by-construction Cramer
    * expansion (p9/p10), so coefficients are bit-identical to the
    * oracle's SQL solve. Held-out errors are per-row doubles from the
    * SAME prediction expression; each squared error is ROUNDED TO THE
    * 4-DP GRID BEFORE the sum and summed as DECIMAL (the t26
    * round-before-sum rule), so the SSE has no float summation order.
    *
    * Scale shape: one scan for moments (k-row output), one broadcast
    * join of 3 coefficient rows for scoring, one partial-aggregated
    * SSE rollup. Folds assigned by the md5 gate (c5: no RNG). */
  def p12RidgeCv(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def s(e: Column, n: String) = sum(e.cast("decimal(38,0)")).as(n)
    val li = Tables.lineitem(spark, dir).select(
      (conv(substring(md5(concat_ws(":", $"l_orderkey", $"l_linenumber")),
        1, 4), 16, 10).cast("long") % cvFolds).cast("int").as("fold"),
      round($"l_quantity").cast("long").as("q"),
      round($"l_discount" * 100).cast("long").as("d"),
      round($"l_tax" * 100).cast("long").as("t"),
      round($"l_extendedprice" * 100).cast("long").as("y"))
      .scopedPersist()
    val perFold = li.groupBy($"fold").agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      s($"q", "sq"), s($"d", "sd"), s($"t", "st"), s($"y", "sy"),
      s($"q" * $"q", "sqq"), s($"q" * $"d", "sqd"), s($"q" * $"t", "sqt"),
      s($"d" * $"d", "sdd"), s($"d" * $"t", "sdt"), s($"t" * $"t", "stt"),
      s($"q" * $"y", "sqy"), s($"d" * $"y", "sdy"), s($"t" * $"y", "sty"))
      .collect()
    val names = "n" +: momentNames
    def bd(r: org.apache.spark.sql.Row, i: Int): BigDecimal =
      BigDecimal(r.getDecimal(i))
    val byFold: Map[Int, Map[String, BigDecimal]] = perFold.map { r =>
      r.getInt(0) ->
        names.zipWithIndex.map { case (n, i) => n -> bd(r, i + 1) }.toMap
    }.toMap
    val tot: Map[String, BigDecimal] =
      names.map(n => n -> byFold.values.map(_(n)).sum).toMap
    val coefs = byFold.keys.toSeq.sorted.map { f =>
      val train = names.map(n => n -> (tot(n) - byFold(f)(n)).toDouble).toMap
      val m = train ++ Seq("sqq", "sdd", "stt")
        .map(k => k -> (train(k) + ridgeLambda.toDouble))
      val da = detVal(-1, m)
      (f, detVal(0, m) / da, detVal(1, m) / da,
        detVal(2, m) / da, detVal(3, m) / da)
    }
    val cdf = coefs.toDF("fold", "b0", "b1", "b2", "b3")
    li.join(broadcast(cdf), "fold")
      .withColumn("err",
        expr("CAST(y AS DOUBLE) - (b0 + b1 * q + b2 * d + b3 * t)"))
      .withColumn("term", expr("CAST(round(err * err, 4) AS DECIMAL(38,6))"))
      .groupBy($"fold")
      .agg(count(lit(1)).as("n_test"), sum($"term").as("sse"),
        first($"b0").as("b0"), first($"b1").as("b1"),
        first($"b2").as("b2"), first($"b3").as("b3"))
      .select($"fold", $"n_test",
        round($"b0", 4).as("b0"), round($"b1", 4).as("b1"),
        round($"b2", 4).as("b2"), round($"b3", 4).as("b3"),
        round(expr("sqrt(CAST(sse AS DOUBLE) / CAST(n_test AS DOUBLE))"), 4)
          .as("rmse_cents"))
      .orderBy($"fold")
  }

  /** D241: weighted least squares — price cents regressed on discount
    * (×100), each LINE ITEM weighted by its quantity: the regression a
    * pricing analyst actually wants (a 50-unit line should pull the
    * discount-elasticity fit 50× harder than a 1-unit line), and the
    * family's missing estimator next to p9 OLS / p10 ridge / p11
    * logistic / p14 Poisson. Reports the weighted slope and intercept
    * (cents), the weighted R², and the weight total.
    *
    * Determinism: the p9 discipline — w, x, y are exact integers, the
    * SIX weighted moments (Σw, Σwx, Σwy, Σwxx, Σwxy, Σwyy) accumulate
    * as decimal(38,0) in ONE partial-aggregated scan (integer addition
    * commutes), and the closed forms evaluate driver-side on
    * bit-identical doubles in both engines.
    *
    * Scale shape: one scan, six mergeable moments, a 1-row result —
    * corpus-size-independent after the scan (exactly p9). */
  def p16Wls(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def s(e: org.apache.spark.sql.Column, n: String) =
      sum(e.cast("decimal(38,0)")).as(n)
    val d = designFrame(spark, dir)
      .select($"x1".as("w"), $"x2".as("x"), $"y")
    val r = d.agg(count(lit(1)).as("n"), s($"w", "sw"),
        s($"w" * $"x", "swx"), s($"w" * $"y", "swy"),
        s($"w" * $"x" * $"x", "swxx"), s($"w" * $"x" * $"y", "swxy"),
        s($"w" * $"y" * $"y", "swyy")).head()
    val n = r.getLong(0)
    val Seq(sw, swx, swy, swxx, swxy, swyy) = (1 to 6)
      .map(i => r.getDecimal(i).doubleValue)
    val den = sw * swxx - swx * swx
    val b1 = (sw * swxy - swx * swy) / den
    val b0 = (swy - b1 * swx) / sw
    // weighted R² = 1 − SSE/SST over the weighted moments
    val sst = swyy - swy * swy / sw
    val sse = swyy - 2.0 * (b0 * swy + b1 * swxy) +
      b0 * b0 * sw + 2.0 * b0 * b1 * swx + b1 * b1 * swxx
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    Seq((n, r.getDecimal(1).toBigInteger.longValueExact(),
      r4(b0), r4(b1), r4(1.0 - sse / sst)))
      .toDF("n_rows", "sum_w", "b0_cents", "b1_cents_per_pct", "r2_weighted")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p9_ols_multi" -> p9OlsMulti,
    "p10_ridge" -> p10Ridge,
    "p12_ridge_cv" -> p12RidgeCv,
    "p16_wls" -> p16Wls)

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

  /** DuckDB replay of [[p12RidgeCv]]: identical fold gate, HUGEINT
    * total−fold training moments, the SAME generated Leibniz solve per
    * fold row, and the same round-before-decimal-sum SSE. */
  private def cvOracleSql: String = {
    val names = "n" +: momentNames
    val sums = Seq("q" -> "sq", "d" -> "sd", "t" -> "st", "y" -> "sy",
      "q*q" -> "sqq", "q*d" -> "sqd", "q*t" -> "sqt",
      "d*d" -> "sdd", "d*t" -> "sdt", "t*t" -> "stt",
      "q*y" -> "sqy", "d*y" -> "sdy", "t*y" -> "sty")
      .map { case (e, n) => s"sum($e) AS $n" }.mkString(", ")
    val totals = names.map(n => s"sum($n) AS $n").mkString(", ")
    val diag = Set("sqq", "sdd", "stt")
    val trainCols = names.map { n =>
      val base = s"CAST(t.$n - f.$n AS DOUBLE)"
      if (diag(n)) s"$base + $ridgeLambda AS $n" else s"$base AS $n"
    }.mkString(", ")
    val dets = (0 to 3)
      .map(i => s"((${detSql(i)}) / (${detSql(-1)})) AS b$i").mkString(", ")
    val pred = "(b0 + b1 * q + b2 * d + b3 * t)"
    s"""WITH li AS (SELECT
            CAST(CAST('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)
              || ':' || CAST(l_linenumber AS VARCHAR)), 1, 4) AS BIGINT)
              % $cvFolds AS INT) AS fold,
            CAST(round(l_quantity) AS BIGINT) AS q,
            CAST(round(l_discount * 100) AS BIGINT) AS d,
            CAST(round(l_tax * 100) AS BIGINT) AS t,
            CAST(round(l_extendedprice * 100) AS BIGINT) AS y
          FROM lineitem),
        fm AS (SELECT fold, CAST(count(*) AS HUGEINT) AS n, $sums
          FROM li GROUP BY 1),
        tm AS (SELECT $totals FROM fm),
        tr AS (SELECT f.fold, $trainCols FROM fm f CROSS JOIN tm t),
        cf AS (SELECT fold, $dets FROM tr),
        er AS (SELECT li.fold,
            CAST(round((CAST(y AS DOUBLE) - $pred)
              * (CAST(y AS DOUBLE) - $pred), 4) AS DECIMAL(38,6)) AS term
          FROM li JOIN cf USING (fold))
        SELECT e.fold, CAST(count(*) AS BIGINT) AS n_test,
          round(c.b0, 4) AS b0, round(c.b1, 4) AS b1,
          round(c.b2, 4) AS b2, round(c.b3, 4) AS b3,
          round(sqrt(CAST(sum(e.term) AS DOUBLE)
            / CAST(count(*) AS DOUBLE)), 4) AS rmse_cents
        FROM er e JOIN cf c USING (fold)
        GROUP BY e.fold, c.b0, c.b1, c.b2, c.b3 ORDER BY e.fold"""
  }

  val oracle: Map[String, String] = Map(
    "p9_ols_multi" -> oracleSql(0L),
    "p10_ridge" -> oracleSql(ridgeLambda),
    "p12_ridge_cv" -> cvOracleSql,
    "p16_wls" ->
      """WITH d AS (SELECT
              CAST(round(l_quantity) AS BIGINT) AS w,
              CAST(round(l_discount * 100) AS BIGINT) AS x,
              CAST(round(l_extendedprice * 100) AS BIGINT) AS y
            FROM lineitem),
          m AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(w) AS BIGINT) AS sw_i,
              CAST(sum(w) AS DOUBLE) AS sw,
              CAST(sum(w * x) AS DOUBLE) AS swx,
              CAST(sum(w * y) AS DOUBLE) AS swy,
              CAST(sum(w * x * x) AS DOUBLE) AS swxx,
              CAST(sum(w * x * y) AS DOUBLE) AS swxy,
              CAST(sum(w * y * y) AS DOUBLE) AS swyy
            FROM d),
          b AS (SELECT *,
              (sw * swxy - swx * swy) / (sw * swxx - swx * swx) AS b1
            FROM m),
          b2 AS (SELECT *, (swy - b1 * swx) / sw AS b0 FROM b),
          e AS (SELECT *,
              swyy - 2.0 * (b0 * swy + b1 * swxy) + b0 * b0 * sw
                + 2.0 * b0 * b1 * swx + b1 * b1 * swxx AS sse,
              swyy - swy * swy / sw AS sst
            FROM b2)
          SELECT n AS n_rows, sw_i AS sum_w, round(b0, 4) AS b0_cents,
            round(b1, 4) AS b1_cents_per_pct,
            round(1.0 - sse / sst, 4) AS r2_weighted
          FROM e""")
}
