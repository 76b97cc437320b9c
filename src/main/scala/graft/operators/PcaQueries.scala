package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ml.{Cov, Eigen}
import graft.ml.feature.GraftPCA
import graft.sources.Tables

/** Oracle-checked query surface for the reference-parity ML operators
  * (SURVEY.md §2.B D2–D6): column statistics, covariance/Gram matrix,
  * PCA trace identity, PCA projection norm preservation.
  *
  * The distributed work (one treeAggregate pass over the rows, Cov.scala)
  * runs on executors; only the n×n result is driver-local, exactly like
  * the reference (RapidsRowMatrix.scala:75-124). The small result is
  * re-parallelized into a DataFrame so the driver's parquet/DuckDB gate
  * can check it.
  */
object PcaQueries {

  /** Upper-triangle window checked against the oracle (full n×n would
    * be 64·65/2 = 2080 rows of float-rounding risk for no extra
    * coverage; the aggregation pass is identical for all cells). */
  private val checkDims = 8

  /** Half-away-from-zero, matching both Spark's and DuckDB's round(). */
  private def rnd(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** One distributed pass per fixture dir per JVM: p1–p4 all consume the
    * same (count, mean, Gram) statistics, and the fixtures are
    * immutable, so the pass is memoized like a materialized view.
    * Keyed by dir alone deliberately: unlike Dedup.sigCache (which holds
    * session-bound persisted DataFrames), the value is plain driver-local
    * arrays, eagerly computed — valid across sessions and after the
    * computing session stops. */
  private val statsCache =
    scala.collection.concurrent.TrieMap.empty[String, Cov.Stats]
  private def cachedStats(spark: SparkSession, dir: String): Cov.Stats =
    statsCache.getOrElseUpdate(dir,
      Cov.stats(Tables.embeddings(spark, dir), "embedding"))

  /** D2: per-dimension mean + sample variance of the embedding column —
    * the `Statistics.colStats` equivalent (reference:
    * RapidsRowMatrix.scala:152-162), from the same single pass as the
    * covariance. */
  def p1ColStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stats = cachedStats(spark, dir)
    val cov = stats.covariance
    val rows = (0 until stats.mean.length).map { i =>
      (i, rnd(stats.mean(i), 6), rnd(cov(i, i), 6))
    }
    rows.toDF("pos", "mean_v", "var_v").orderBy($"pos")
  }

  /** D3: sample covariance matrix entries (upper triangle, first
    * [[checkDims]] dims) — the custom Gram aggregation with mean
    * centering (reference semantics R7–R12). */
  def p2Covariance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cov = cachedStats(spark, dir).covariance
    val rows = for { i <- 0 until checkDims; j <- i until checkDims }
      yield (i, j, rnd(cov(i, j), 6))
    rows.toDF("i", "j", "cov").orderBy($"i", $"j")
  }

  /** D4: raw Gram matrix BᵀB entries (no centering, no normalization —
    * the meanCentering=false accumulation path). */
  def p3Gram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = cachedStats(spark, dir).secondMoment
    val rows = for { i <- 0 until checkDims; j <- i until checkDims }
      yield (i, j, rnd(g(i, j), 4))
    rows.toDF("i", "j", "gram").orderBy($"i", $"j")
  }

  /** D5: PCA eigenvalue trace identity — Σλᵢ of the covariance equals
    * Σ var(dim). DuckDB can't eigendecompose, but the trace is basis-
    * invariant, so this checks the full eigen pipeline end-to-end. */
  def p4PcaTrace(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cov = cachedStats(spark, dir).covariance
    val res = Eigen.pca(cov, cov.rows)
    Seq(Tuple1(rnd(res.eigenvalues.sum, 4)))
      .toDF("total_var")
  }

  /** D5+D6: full-rank PCA projection preserves row norms (orthogonal
    * basis ⇒ ‖pcᵀv‖ = ‖v‖) — checks eigenvector orthonormality and the
    * transform path against a plain SQL norm. */
  def p5PcaProjectNorm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val dim = emb.select(size($"embedding")).head().getInt(0)
    val model = new GraftPCA().setK(dim)
      .setInputCol("embedding").setOutputCol("proj")
      .fit(emb)
    model.transform(emb.filter($"vec_id" < 50))
      .select($"vec_id",
        round(sqrt(Similarity.dot($"proj", $"proj")), 4).as("norm"))
      .orderBy($"vec_id")
  }

  /** D5+D6 whitening identity: scaling component i of the projection by
    * 1/√λᵢ must give unit sample variance in every component (PCA
    * whitening — the feature-decorrelation step). λᵢ is recovered as
    * explainedVariance ratio × covariance trace, so this checks fit
    * (eigenvalues), transform (projections) and the variance identity
    * var(pcᵢᵀv) = λᵢ end-to-end; the oracle pins the exact constant the
    * identity predicts. Distributed shape: transform is the batched
    * GEMM path, the per-component variance one partial-aggregated
    * groupBy over an 8-way posexplode. */
  def p6PcaWhiten(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = 8
    val emb = Tables.embeddings(spark, dir)
    val model = new GraftPCA().setK(k)
      .setInputCol("embedding").setOutputCol("proj")
      .fit(emb)
    val stats = cachedStats(spark, dir)
    val trace = (0 until stats.mean.length).map(i => stats.covariance(i, i)).sum
    val scale = model.explainedVariance.values.map(r => 1.0 / math.sqrt(r * trace))
    model.transform(emb)
      .select(posexplode($"proj").as(Seq("comp", "z")))
      .withColumn("zw", $"z" * element_at(lit(scale), $"comp" + 1))
      .groupBy($"comp")
      .agg(round(var_samp($"zw"), 4).as("var_white"))
      .orderBy($"comp")
  }

  /** D55: grouped OLS (normal equations) — per market segment, regress
    * order price on the customer's account balance: slope =
    * cov(x,y)/var(x), intercept = ȳ − slope·x̄, r² =
    * cov²/(var(x)·var(y)). The same mergeable second-moment statistics
    * as the D3 covariance pass (count/Σx/Σxy), just 1-dimensional and
    * grouped — ONE partial-aggregated scan after the key join, no
    * iteration, no driver-side data. Only the final O(1)-magnitude
    * ratios are rounded (4 dp); the raw moments stay full-precision so
    * cross-engine summation-order noise cannot reach the rounded
    * digits. */
  def p7OlsSegment(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(
        count(lit(1)).as("n"),
        covar_samp($"c_acctbal", $"o_totalprice").as("cxy"),
        var_samp($"c_acctbal").as("vx"),
        var_samp($"o_totalprice").as("vy"),
        avg($"c_acctbal").as("mx"),
        avg($"o_totalprice").as("my"))
      .select($"c_mktsegment", $"n",
        round($"cxy" / $"vx", 4).as("slope"),
        round($"my" - ($"cxy" / $"vx") * $"mx", 4).as("intercept"),
        round($"cxy" * $"cxy" / ($"vx" * $"vy"), 4).as("r2"))
      .orderBy($"c_mktsegment")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p7_ols_segment" -> p7OlsSegment,
    "p6_pca_whiten" -> p6PcaWhiten,
    "p1_colstats" -> p1ColStats,
    "p2_covariance" -> p2Covariance,
    "p3_gram" -> p3Gram,
    "p4_pca_trace" -> p4PcaTrace,
    "p5_pca_project_norm" -> p5PcaProjectNorm)

  private val unnested =
    """SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
              CAST(unnest(embedding) AS DOUBLE) AS v
       FROM embeddings"""

  val oracle: Map[String, String] = Map(
    "p7_ols_segment" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
           round(covar_samp(c_acctbal, o_totalprice) / var_samp(c_acctbal), 4) AS slope,
           round(avg(o_totalprice) - (covar_samp(c_acctbal, o_totalprice)
             / var_samp(c_acctbal)) * avg(c_acctbal), 4) AS intercept,
           round(covar_samp(c_acctbal, o_totalprice) * covar_samp(c_acctbal, o_totalprice)
             / (var_samp(c_acctbal) * var_samp(o_totalprice)), 4) AS r2
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    // the whitening identity predicts the constant exactly: unit
    // variance in every whitened component
    "p6_pca_whiten" ->
      """SELECT CAST(i AS INT) AS comp, CAST(1.0 AS DOUBLE) AS var_white
         FROM generate_series(0, 7) t(i) ORDER BY comp""",
    "p1_colstats" ->
      s"""WITH e AS ($unnested)
          SELECT pos, round(avg(v), 6) AS mean_v, round(var_samp(v), 6) AS var_v
          FROM e GROUP BY pos ORDER BY pos""",
    "p2_covariance" ->
      s"""WITH e AS ($unnested)
          SELECT a.pos AS i, b.pos AS j, round(covar_samp(a.v, b.v), 6) AS cov
          FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.pos <= b.pos
          WHERE a.pos < $checkDims AND b.pos < $checkDims
          GROUP BY 1, 2 ORDER BY 1, 2""",
    "p3_gram" ->
      s"""WITH e AS ($unnested)
          SELECT a.pos AS i, b.pos AS j, round(sum(a.v * b.v), 4) AS gram
          FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.pos <= b.pos
          WHERE a.pos < $checkDims AND b.pos < $checkDims
          GROUP BY 1, 2 ORDER BY 1, 2""",
    "p4_pca_trace" ->
      s"""WITH e AS ($unnested)
          SELECT round(sum(vv), 4) AS total_var
          FROM (SELECT var_samp(v) AS vv FROM e GROUP BY pos) t""",
    "p5_pca_project_norm" ->
      """SELECT vec_id,
           round(sqrt(list_inner_product(embedding::DOUBLE[],
                                         embedding::DOUBLE[])), 4) AS norm
         FROM embeddings WHERE vec_id < 50 ORDER BY vec_id""")
}
