package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** As-of (point-in-time) join — an operator Spark has no built-in for
  * (SURVEY.md §2 extension; the reference has no joins at all).
  *
  * Semantics: for each left row, attach the payload of the single right
  * row with the same key and the greatest `rightTime <= leftTime`
  * (inclusive), or nulls when none exists — DuckDB `ASOF LEFT JOIN`.
  *
  * Execution shape (chosen for 100 TB): a naive formulation is a range
  * join (`l.key = r.key AND r.t <= l.t` + a per-row max), which Spark
  * executes as a broadcast-nested-loop or exploded equi-join — O(n·m)
  * per key. This instead tags both sides, unions them, and runs ONE
  * window pass per key ordered by (time, side): `last(payload,
  * ignoreNulls)` over an unbounded-preceding frame is a running O(1)
  * carry-forward, so total cost is one shuffle on the key plus a sort —
  * linear in rows, skew-bounded by the hottest key, no pairwise blowup.
  *
  * Right rows must be unique per (key, time) — pre-aggregate ties (the
  * caller chooses the tiebreak) or the carried payload is
  * order-dependent.
  */
object AsOf {

  /** Generic as-of join. `payload` = right-side columns to carry.
    * Right rows sort before left rows at equal time, so a left row at
    * exactly `t` matches a right row at `t` (inclusive bound).
    *
    * The payload is carried as ONE struct with a single
    * `last(ignoreNulls)`: every carried column comes from the SAME
    * matched right row even when individual payload values are null
    * (per-column carries would mix columns across right rows). */
  def asofJoin(left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty,
      "asofJoin needs at least one payload column (an empty carry is a no-op)")
    // backtick-quote every by-name reference: a column literally named
    // "a.b" (legal in schemas) must not be parsed as a nested-field path
    def qcol(c: String): Column = col("`" + c.replace("`", "``") + "`")
    val leftCols = left.columns.toSeq
    val l = left.select(
      qcol(leftKey).as("__key") +: qcol(leftTime).as("__t") +: lit(1).as("__side") +:
        lit(null).cast(org.apache.spark.sql.types.StructType(
          payload.map(c => right.schema(c)))).as("__pay") +:
        leftCols.map(qcol): _*)
    val r = right.select(
      qcol(rightKey).as("__key") +: qcol(rightTime).as("__t") +: lit(0).as("__side") +:
        struct(payload.map(c => qcol(c).as(c)): _*).as("__pay") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r).select(
      (Seq(col("__side")) ++ leftCols.map(qcol) ++
        Seq(last(col("__pay"), ignoreNulls = true).over(w).as("__pay"))): _*)
    // getField, not a "__pay.c" path string, for the same dot-safety
    carried.filter(col("__side") === 1)
      .select(leftCols.map(qcol) ++
        payload.map(c => col("__pay").getField(c).as(c)): _*)
  }

  /** D10-extension query: each event joined to the user's latest order
    * at-or-before the event time, aggregated per event type. Orders are
    * deduplicated to one per (custkey, orderdate) by max orderkey so
    * the as-of match is unique. */
  def q19Asof(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(max($"o_orderkey").as("o_orderkey"), max($"o_totalprice").as("o_totalprice"))
    val joined = asofJoin(
      Tables.events(spark, dir).select($"event_id", $"ts", $"user_id", $"event_type"),
      "user_id", "ts",
      orders, "o_custkey", "o_orderdate",
      Seq("o_orderkey", "o_totalprice"))
    joined.groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        count($"o_orderkey").as("n_matched"),
        round(avg($"o_totalprice"), 2).as("avg_matched_price"))
      .orderBy($"event_type")
  }

  /** D23-extension: time-series resample + gap-fill — regularize each
    * user's event stream onto a daily spine, forward-filling the last
    * observed daily total across missing days (the as-of carry-forward
    * applied to a generated grid; what `ffill`/`time_bucket_gapfill`
    * do elsewhere).
    *
    * Scale shape: the spine is built by a map-side
    * `explode(sequence(...))` on the (distinct) entity set — never a
    * cross join — so spine size is |entities|×|grid| rows streamed out
    * of a narrow stage; the fill is one window pass per entity
    * (high-cardinality key at scale), same O(1)-state carry-forward as
    * [[asofJoin]]. Bounded here to user_id < 20 for an
    * oracle-checkable output. */
  def q34Gapfill(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).filter($"user_id" < 20)
    val daily = ev
      .groupBy($"user_id", date_trunc("day", $"ts").as("day"))
      .agg(count(lit(1)).as("n_events"),
        round(sum($"value"), 2).as("day_value"))
    val spine = ev.select($"user_id").distinct()
      .withColumn("day", explode(sequence(
        lit("2024-01-01").cast("timestamp"),
        lit("2024-01-30").cast("timestamp"),
        expr("interval 1 day"))))
    val w = Window.partitionBy($"user_id").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("user_id", "day"), "left")
      .select($"user_id", $"day",
        coalesce($"n_events", lit(0L)).as("n_events"),
        coalesce(last($"day_value", ignoreNulls = true).over(w), lit(0.0))
          .as("fill_value"))
      .orderBy($"user_id", $"day")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q19_asof" -> q19Asof,
    "q34_gapfill" -> q34Gapfill)

  val oracle: Map[String, String] = Map(
    "q19_asof" ->
      """WITH o AS (SELECT o_custkey, o_orderdate,
            max(o_orderkey) AS o_orderkey, max(o_totalprice) AS o_totalprice
          FROM orders GROUP BY 1, 2)
         SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_matched,
           round(avg(o.o_totalprice), 2) AS avg_matched_price
         FROM events e
         ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
         GROUP BY e.event_type ORDER BY e.event_type""",
    "q34_gapfill" ->
      """WITH ev AS (SELECT * FROM events WHERE user_id < 20),
         daily AS (SELECT user_id, date_trunc('day', ts) AS day,
             CAST(count(*) AS BIGINT) AS n_events,
             round(sum(value), 2) AS day_value
           FROM ev GROUP BY 1, 2),
         spine AS (SELECT user_id,
             unnest(generate_series(TIMESTAMP '2024-01-01',
               TIMESTAMP '2024-01-30', INTERVAL 1 DAY)) AS day
           FROM (SELECT DISTINCT user_id FROM ev)),
         j AS (SELECT s.user_id, s.day,
             coalesce(d.n_events, 0) AS n_events, d.day_value
           FROM spine s LEFT JOIN daily d
             ON s.user_id = d.user_id AND s.day = d.day)
         SELECT user_id, day, n_events,
           coalesce(last_value(day_value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0)
             AS fill_value
         FROM j ORDER BY user_id, day""")
}
