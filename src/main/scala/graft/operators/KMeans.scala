package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Distributed Lloyd k-means over the embeddings table (SURVEY.md
  * §2.B12 D67) — the second full ML algorithm beside PCA, built on the
  * same partial-aggregation discipline as the reference's covariance
  * pass (`/root/reference/src/main/scala/org/apache/spark/ml/linalg/distributed/RapidsRowMatrix.scala:177-234`
  * batches per-partition work; here Catalyst's partial hash aggregate
  * plays that role).
  *
  * Determinism (the whole design): float summation order is
  * execution-order-dependent in a distributed sum, so per-dimension
  * centroid means are accumulated as INTEGER sums of
  * `floor(v · 2^20)` quantized components — integer addition commutes,
  * so the means are bit-identical on any partitioning, any engine.
  * Assignment compares `dot(c,c) − 2·dot(x,c)` (the ‖x‖²-free
  * expansion of squared L2) with both dots summed in ascending index
  * order (Spark HOF and DuckDB `list_inner_product` agree
  * bit-for-bit — the s1/s3 precedent), ties broken by lowest
  * centroid id via lexicographic struct-min. Init is the k
  * lowest-vec_id embeddings quantized through the same mean formula
  * (n = 1) — no RNG anywhere.
  *
  * Scale shape per iteration: assignment is a narrow map (centroids
  * ride along as an 8×64 literal — the q44 broadcast-boundaries
  * shape), the ONLY shuffle is the per-(cid, dim) partial-aggregated
  * integer-sum rollup (k·d = 512 rows to the driver, independent of
  * corpus size). Empty clusters keep their previous centroid. */
object KMeans {

  val k = 8
  val iters = 3

  /** Quantization scale for the exact integer mean sums (2^20). */
  val qScale = 1048576.0

  private def quantMean(s: Long, n: Long): Double =
    (s.toDouble / n.toDouble) / qScale

  /** Ascending-index sequential dot of two double arrays (driver). */
  private def dotSeq(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); i += 1 }
    d
  }

  /** Ascending-index HOF dot on `array<double>` columns — interpreted,
    * bit-identical to DuckDB `list_inner_product` (same order, same
    * IEEE ops). The corpus side is k=8 evals/row; a compiled
    * double-dot expression (the [[graft.functions.DotProduct]] float
    * sibling) is the drop-in if k·d ever dominates. */
  private def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Fitted state: per-cluster counts + centroid means (+norms). */
  private[graft] case class Fit(cents: Array[Array[Double]],
      counts: Array[Long])

  /** The per-row argmin-assignment column against a centroid set —
    * shared by the fit loop and [[graft.ml.feature.GraftKMeansModel]]'s
    * transform. `e` must be an `array<double>` column. */
  private[graft] def assignCol(e: Column,
      cents: Array[Array[Double]]): Column = {
    val distStructs = cents.zipWithIndex.map { case (c, cid) =>
      val cLit = typedLit(c.toSeq)
      struct((lit(dotSeq(c, c)) - lit(2.0) * dotD(e, cLit)).as("dist"),
        lit(cid).as("cid"))
    }
    array_min(array(distStructs: _*)).getField("cid")
  }

  /** Core Lloyd loop over a frame with columns (ord: Long, e:
    * array<double>): init = the kk lowest-ord rows, then `rounds`
    * assign+update steps. Parameterized for the Estimator API; p8 uses
    * the ([[k]], [[iters]]) constants. */
  private[graft] def fitVectors(vecs: DataFrame, kk: Int,
      rounds: Int): Fit = {
    import vecs.sparkSession.implicits._
    // init: the kk lowest-ord vectors through the n=1 mean formula
    var cents: Array[Array[Double]] = vecs.orderBy($"ord").limit(kk)
      .select($"e").collect()
      .map(_.getSeq[Double](0).toArray
        .map(v => quantMean(math.floor(v * qScale).toLong, 1L)))
    require(cents.length == kk, s"need >= $kk rows to seed $kk clusters")
    var counts = Array.fill(kk)(0L)

    for (_ <- 1 to rounds) {
      val assigned = vecs.select($"e", assignCol($"e", cents).as("cid"))
      val sums = assigned
        .select($"cid", posexplode($"e").as(Seq("pos", "v")))
        .groupBy($"cid", $"pos")
        .agg(sum(floor($"v" * qScale)).as("s"), count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      val next = Array.tabulate(kk) { cid =>
        if (sums.contains((cid, 0)))
          Array.tabulate(cents(cid).length) { pos =>
            val (s, n) = sums((cid, pos)); quantMean(s, n)
          }
        else cents(cid) // empty cluster keeps its centroid
      }
      counts = Array.tabulate(kk)(cid =>
        sums.get((cid, 0)).map(_._2).getOrElse(0L))
      cents = next
    }
    Fit(cents, counts)
  }

  private def fit(spark: SparkSession, dir: String): Fit = {
    import spark.implicits._
    fitVectors(Tables.embeddings(spark, dir)
      .select($"vec_id".as("ord"), $"embedding".cast("array<double>").as("e")),
      k, iters)
  }

  /** p8: per-cluster census after [[iters]] Lloyd rounds — cluster id,
    * member count, and the centroid's L2 norm (4 dp). */
  def p8Kmeans(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val f = fit(spark, dir)
    (0 until k).map { cid =>
      (cid, f.counts(cid),
        BigDecimal(math.sqrt(dotSeq(f.cents(cid), f.cents(cid))))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toDF("cluster_id", "n_vecs", "centroid_norm")
      .orderBy($"cluster_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p8_kmeans" -> p8Kmeans)

  // Oracle: the same three Lloyd rounds as chained CTEs. Quantized
  // integer sums make every mean exact; list_inner_product matches the
  // ascending HOF dot bit-for-bit.
  private val oracleSql: String = {
    val iterCtes = (1 to iters).map { i =>
      s"""a$i AS (SELECT vec_id, e, cid FROM (
            SELECT v.vec_id, v.e, c.cid,
              row_number() OVER (PARTITION BY v.vec_id ORDER BY
                list_inner_product(c.c, c.c)
                  - 2 * list_inner_product(v.e, c.c), c.cid) AS rk
            FROM e v CROSS JOIN c${i - 1} c) WHERE rk = 1),
          s$i AS (SELECT cid, i AS pos,
              sum(CAST(floor(e[i] * $qScale) AS BIGINT)) AS s,
              CAST(count(*) AS BIGINT) AS n
            FROM a$i CROSS JOIN
              (SELECT unnest(generate_series(1, 64)) AS i)
            GROUP BY cid, i),
          c$i AS (SELECT p.cid,
              coalesce(u.c, p.c) AS c, coalesce(u.n, 0) AS n
            FROM c${i - 1} p LEFT JOIN (
              SELECT cid,
                list((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / $qScale
                     ORDER BY pos) AS c,
                any_value(n) AS n
              FROM s$i GROUP BY cid) u ON u.cid = p.cid)"""
    }.mkString(",\n          ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings),
          init AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1
                AS INT) AS cid, e
            FROM e ORDER BY vec_id LIMIT $k),
          c0 AS (SELECT cid,
              list_transform(e, v -> (CAST(floor(v * $qScale) AS DOUBLE)
                / 1.0) / $qScale) AS c
            FROM init),
          $iterCtes
          SELECT cid AS cluster_id, CAST(n AS BIGINT) AS n_vecs,
            round(sqrt(list_inner_product(c, c)), 4) AS centroid_norm
          FROM c$iters ORDER BY cluster_id"""
  }

  val oracle: Map[String, String] = Map("p8_kmeans" -> oracleSql)
}
