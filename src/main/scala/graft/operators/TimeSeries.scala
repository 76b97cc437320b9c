package graft.operators

import java.sql.Date

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** One observation of a per-nation daily revenue series. */
case class HoltIn(nation: String, day: Date, y: Long)

/** One smoothed observation: level/trend state after folding this day,
  * plus the one-step-ahead forecast error the PREVIOUS state made. */
case class HoltOut(nation: String, day: Date, cents: Long,
    level: Double, trend: Double, forecast_err: Double)

/** D113: Holt linear (double-exponential) smoothing over per-nation
  * daily revenue — the classic level+trend forecaster, run as a
  * per-series sequential fold:
  *
  *   l_t = ½·y_t + ½·(l_{t−1} + b_{t−1})
  *   b_t = ½·(l_t − l_{t−1}) + ½·b_{t−1}
  *   err_t = y_t − (l_{t−1} + b_{t−1})      (one-step forecast error)
  *
  * α = β = ½ are EXACT binary fractions, so each step is a fixed
  * sequence of IEEE multiplies/adds on identical doubles in both
  * engines — the fold IS the evaluation order, so there is no
  * summation-order freedom anywhere and the 4-dp output rounding
  * can never flip (the cosSql identical-structure argument applied
  * to a recurrence). Initialization: l₁ = y₁, b₁ = 0, err₁ = 0.
  * The series index is OBSERVATION order (days with no orders are
  * skipped, not zero-filled — documented series semantics).
  *
  * Scale shape: the daily census is one partial-aggregated groupBy;
  * the fold is `groupByKey(nation).flatMapSortedGroups(day)` — the
  * c3/e10 secondary-sort shape: O(1) state per series, series fold in
  * parallel, the sort rides the shuffle. The oracle replays the
  * identical recurrence as a recursive CTE (e10 pattern). */
object TimeSeries {

  private[operators] def holtFold(
      it: Iterator[HoltIn]): Iterator[HoltOut] = {
    var has = false
    var l = 0.0
    var b = 0.0
    it.map { r =>
      val y = r.y.toDouble
      val (err, nl, nb) =
        if (!has) (0.0, y, 0.0)
        else {
          val e = y - (l + b)
          val l1 = 0.5 * y + 0.5 * (l + b)
          val b1 = 0.5 * (l1 - l) + 0.5 * b
          (e, l1, b1)
        }
      has = true; l = nl; b = nb
      HoltOut(r.nation, r.day, r.y, l, b, err)
    }
  }

  def q65Holt(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, dir)),
        $"c_nationkey" === $"n_nationkey")
      .select($"n_name".as("nation"), to_date($"o_orderdate").as("day"),
        floor($"o_totalprice" * 100).cast("long").as("cents"))
      .groupBy($"nation", $"day").agg(sum($"cents").as("y"))
      .as[HoltIn]
    daily.groupByKey(_.nation)
      .flatMapSortedGroups($"day") { (_: String, it: Iterator[HoltIn]) =>
        holtFold(it)
      }
      .toDF()
      .select($"nation", $"day", $"cents",
        round($"level", 4).as("level"), round($"trend", 4).as("trend"),
        round($"forecast_err", 4).as("forecast_err"))
      .orderBy($"nation", $"day")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q65_holt" -> q65Holt)

  val oracle: Map[String, String] = Map(
    "q65_holt" ->
      """WITH RECURSIVE d AS (
            SELECT n.n_name AS nation,
              CAST(date_trunc('day', o.o_orderdate) AS DATE) AS day,
              CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS y,
              row_number() OVER (PARTITION BY n.n_name
                ORDER BY CAST(date_trunc('day', o.o_orderdate) AS DATE)) AS rn
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
              JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2),
          r AS (
            SELECT nation, day, y, rn, CAST(y AS DOUBLE) AS l,
              CAST(0.0 AS DOUBLE) AS b, CAST(0.0 AS DOUBLE) AS err
            FROM d WHERE rn = 1
            UNION ALL
            SELECT d.nation, d.day, d.y, d.rn,
              0.5 * d.y + 0.5 * (r.l + r.b),
              0.5 * ((0.5 * d.y + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b,
              d.y - (r.l + r.b)
            FROM r JOIN d ON d.nation = r.nation AND d.rn = r.rn + 1)
          SELECT nation, day, y AS cents, round(l, 4) AS level,
            round(b, 4) AS trend, round(err, 4) AS forecast_err
          FROM r ORDER BY nation, day""")
}
