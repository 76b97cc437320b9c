package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** D260: decision stump by histogram split search — the depth-1 tree.
  *
  * Finds the single best threshold on a numeric feature (extended
  * price, quantized to $100 bins) predicting a binary label
  * (returnflag = 'R') by EXACT weighted-Gini minimization over every
  * candidate split. This is the primitive inside every
  * gradient-boosted-tree trainer — and the histogram formulation IS
  * the scale answer (XGBoost's `hist`/LightGBM: candidate thresholds
  * live on a bounded value grid, so split search costs one pass plus
  * a domain-bounded cumulative scan, never a per-row sort).
  *
  * Determinism: the per-bin census (count, positives) and every
  * cumulative/complement count are EXACT integers; the weighted Gini
  * for each candidate is ONE shared IEEE expression tree ([[wgSql]])
  * interpolated into both engines, so the argmin row — selected by
  * ordering on the RAW double then bin — is identical bit-for-bit;
  * only the reported gini/gain round 4-dp.
  *
  * Scale shape: one partial-aggregated groupBy to the ≤ |price
  * domain|/100 bin histogram (~1.1k rows — bounded by the value
  * domain, NOT the data), a 1-row total broadcast-crossed in, one
  * unpartitioned cumulative window over the bin-sized frame, and a
  * TakeOrdered-1 argmin. Nothing after the scan is data-sized.
  */
object Stump {

  private def d(x: String) = s"CAST($x AS DOUBLE)"

  /** Gini impurity of one side from its positive/negative/total counts. */
  private def giniSql(p: String, q: String, m: String) =
    s"""(1.0 - (${d(p)} / ${d(m)}) * (${d(p)} / ${d(m)})
        - (${d(q)} / ${d(m)}) * (${d(q)} / ${d(m)}))"""

  /** Split-weighted Gini over columns (nl,pl,ql, nr,pr,qr, n). */
  private val wgSql =
    s"""((${d("nl")} * ${giniSql("pl", "ql", "nl")}
        + ${d("nr")} * ${giniSql("pr", "qr", "nr")}) / ${d("n")})"""

  /** Parent (unsplit) Gini over columns (pos, neg, n). */
  private val parentSql = giniSql("pos", "neg", "n")

  def p17Stump(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rows = Tables.lineitem(spark, dir).select(
      floor($"l_extendedprice" / 100.0).cast("long").as("bin"),
      ($"l_returnflag" === "R").cast("long").as("y"))
    val hist = rows.groupBy($"bin")
      .agg(count(lit(1)).as("cnt"), sum($"y").as("p"))
    val tot = hist.agg(sum($"cnt").as("n"), sum($"p").as("pos"))
    val w = Window.orderBy($"bin")
    val cand = hist
      .select($"bin", sum($"cnt").over(w).as("nl"), sum($"p").over(w).as("pl"))
      .crossJoin(broadcast(tot))
      .filter($"nl" < $"n") // a split must leave something on the right
      .withColumn("ql", $"nl" - $"pl")
      .withColumn("nr", $"n" - $"nl")
      .withColumn("pr", $"pos" - $"pl")
      .withColumn("qr", $"nr" - $"pr")
      .withColumn("neg", $"n" - $"pos")
    cand.select($"bin", $"nl", $"nr", $"pl", $"pr",
        expr(wgSql).as("wg_raw"), expr(parentSql).as("pg_raw"))
      .orderBy($"wg_raw", $"bin").limit(1)
      .select($"bin".as("threshold_bin"),
        $"nl".as("n_left"), $"nr".as("n_right"),
        $"pl".as("pos_left"), $"pr".as("pos_right"),
        round($"wg_raw", 4).as("gini_split"),
        round($"pg_raw" - $"wg_raw", 4).as("gini_gain"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p17_stump" -> p17Stump)

  val oracle: Map[String, String] = Map(
    "p17_stump" ->
      s"""WITH r AS (SELECT CAST(floor(l_extendedprice / 100.0) AS BIGINT)
              AS bin,
              CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
            FROM lineitem),
          h AS (SELECT bin, CAST(count(*) AS BIGINT) AS cnt,
              CAST(sum(y) AS BIGINT) AS p
            FROM r GROUP BY bin),
          t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
              CAST(sum(p) AS BIGINT) AS pos FROM h),
          c AS (SELECT bin,
              CAST(sum(cnt) OVER (ORDER BY bin) AS BIGINT) AS nl,
              CAST(sum(p) OVER (ORDER BY bin) AS BIGINT) AS pl
            FROM h),
          f AS (SELECT c.bin, c.nl, c.pl, c.nl - c.pl AS ql,
              t.n - c.nl AS nr, t.pos - c.pl AS pr,
              (t.n - c.nl) - (t.pos - c.pl) AS qr,
              t.n AS n, t.pos AS pos, t.n - t.pos AS neg
            FROM c CROSS JOIN t WHERE c.nl < t.n)
          SELECT bin AS threshold_bin, nl AS n_left, nr AS n_right,
            pl AS pos_left, pr AS pos_right,
            round($wgSql, 4) AS gini_split,
            round($parentSql - $wgSql, 4) AS gini_gain
          FROM f ORDER BY $wgSql, bin LIMIT 1""")
}
