package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.sources.Tables

/** Input row for the control chart (typed view of `events`). */
case class ChartEvent(ts: Timestamp, event_type: String)

/** One sealed-hour verdict: the hour's count, its EWMA baseline over
  * the previous sealed hours (None until history exists), and the
  * alert level (None = in control). */
case class ChartRow(hr_ts: Timestamp, event_type: String, cnt: Long,
    baseline: Option[Double], level: Option[String])

/** Per-type state: counts of hours the watermark has not sealed yet,
  * plus the ≤ [[ControlChart.depth]] most recent SEALED hour counts
  * (most recent first) — the lag buffer the baseline reads. */
case class ChartState(open: Map[Long, Long], lags: List[Long])

/** D187: streaming EWMA control chart — per event type, every sealed
  * hour's event count is compared against an exponentially-weighted
  * baseline of the previous sealed hours and flagged `warn`/`crit` on
  * large relative deviation (the ops-monitoring "is this feed
  * behaving" surface; e12 checks level AGAINST SEASONAL PROFILE, this
  * checks level against RECENT TREND — the two standard anomaly
  * lenses, cf. q54/q87 in batch).
  *
  * Baseline: b_t = Σ_{j=1..8} αʲ·c_{t−j} / Σ_{j=1..8} αʲ over the
  * PRESENT previous hours (q36's truncated-window EWMA, normalized —
  * truncation is what keeps both the stream state and the batch
  * window FIXED-depth instead of an unbounded recursion). Levels:
  * crit when cnt ≥ 1.7·b or ≤ 0.3·b, warn at 1.3·b / 0.6·b.
  *
  * Determinism: weights interpolate as exact double literals into
  * both engines (the q36 convention); the numerator/denominator sums
  * run in ascending-lag order on both engines (absent lags contribute
  * IEEE +0.0, which never perturbs the sum); threshold comparisons
  * and the 4-dp rounding read the identical unrounded double.
  *
  * Scale shape (batch twin): ONE map-side-combined hour census
  * (#types × #hours rows, never event-sized), lag windows partitioned
  * by event_type, no joins. Stream side: state per type is the open-
  * hour count map + an ≤8-long lag buffer — O(open hours + 8), never
  * event-buffering; sealing drains in ascending hour order so the lag
  * recursion matches the batch twin exactly.
  */
object ControlChart {

  /** EWMA decay per lag step (q36's [[graft.operators.AdvancedSql]]
    * convention). */
  val alpha = 0.8
  /** Truncated lag depth — bounds state and window alike. */
  val depth = 8
  private val hourMs = 3600L * 1000

  /** crit/warn relative-deviation fences (symmetric-ish ratios). */
  val critHigh = 1.7; val critLow = 0.3
  val warnHigh = 1.3; val warnLow = 0.6

  private def w(j: Int): Double = math.pow(alpha, j)

  // ---- batch twin (declarative; this is what the oracle checks) ----

  /** Per-(type, hour) census with EWMA baseline + alert level. */
  def controlChart(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val win = Window.partitionBy($"event_type").orderBy($"hr_ts")
    val num = (1 to depth).map(j =>
      coalesce(lag($"cnt", j).over(win), lit(0L)).cast("double") * lit(w(j)))
      .reduceLeft(_ + _)
    val den = (1 to depth).map(j =>
      when(lag($"cnt", j).over(win).isNotNull, lit(w(j))).otherwise(lit(0.0)))
      .reduceLeft(_ + _)
    val cd = $"cnt".cast("double")
    def braw: Column = $"braw"
    events
      .groupBy(date_trunc("hour", $"ts").as("hr_ts"), $"event_type")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("braw", when(den > 0.0, num / den))
      .select($"hr_ts", $"event_type", $"cnt",
        round(braw, 4).as("baseline"),
        when(braw.isNotNull &&
            (cd >= lit(critHigh) * braw || cd <= lit(critLow) * braw), "crit")
          .when(braw.isNotNull &&
            (cd >= lit(warnHigh) * braw || cd <= lit(warnLow) * braw), "warn")
          .as("level"))
  }

  def e18ControlChart(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    controlChart(Tables.events(spark, dir)).orderBy($"event_type", $"hr_ts")
  }

  // ---- streaming variant (custom state) ----

  /** Streaming deployment: one verdict row per (type, hour), emitted
    * once the watermark seals the hour. */
  def chartStream(spark: SparkSession, events: DataFrame,
      delay: String = "10 minutes"): DataFrame = {
    import spark.implicits._
    events.withWatermark("ts", delay)
      .select(col("ts"), col("event_type"))
      .as[ChartEvent]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(updateChart)
      .toDF()
  }

  /** The pure sealed-hour verdict — shared by the stream fold and the
    * spec replay. `lags` is most-recent-first. */
  private[streaming] def verdict(tpe: String, hrMs: Long, cnt: Long,
      lags: List[Long]): ChartRow = {
    val ws = lags.take(depth).zipWithIndex
    if (ws.isEmpty) ChartRow(new Timestamp(hrMs), tpe, cnt, None, None)
    else {
      // ascending-lag fold: identical IEEE order to the batch window
      val num = ws.foldLeft(0.0) { case (a, (c, i)) => a + c.toDouble * w(i + 1) }
      val den = ws.foldLeft(0.0) { case (a, (_, i)) => a + w(i + 1) }
      val b = num / den
      val cd = cnt.toDouble
      val level =
        if (cd >= critHigh * b || cd <= critLow * b) Some("crit")
        else if (cd >= warnHigh * b || cd <= warnLow * b) Some("warn")
        else None
      val b4 = BigDecimal(b).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
      ChartRow(new Timestamp(hrMs), tpe, cnt, Some(b4), level)
    }
  }

  private[streaming] def updateChart(tpe: String,
      in: Iterator[ChartEvent],
      state: GroupState[ChartState]): Iterator[ChartRow] = {
    val st = state.getOption.getOrElse(ChartState(Map.empty, Nil))
    val wm = state.getCurrentWatermarkMs()
    if (state.hasTimedOut || in.isEmpty) {
      // seal every open hour the watermark has passed, ASCENDING, so
      // each verdict sees exactly the lag buffer the batch twin does
      val (closed, open) = st.open.partition { case (h, _) => h + hourMs <= wm }
      var lags = st.lags
      val out = closed.toSeq.sortBy(_._1).map { case (h, c) =>
        val row = verdict(tpe, h, c, lags)
        lags = (c :: lags).take(depth)
        row
      }
      state.update(ChartState(open, lags))
      if (open.nonEmpty)
        state.setTimeoutTimestamp(math.max(open.keys.min + hourMs, wm + 1))
      out.iterator
    } else {
      val open = in.foldLeft(st.open) { (m, e) =>
        val h = Math.floorDiv(e.ts.getTime, hourMs) * hourMs
        m.updated(h, m.getOrElse(h, 0L) + 1L)
      }
      state.update(ChartState(open, st.lags))
      state.setTimeoutTimestamp(math.max(open.keys.min + hourMs, wm + 1))
      Iterator.empty
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e18_control_chart" -> e18ControlChart)

  /** Weight literals, ascending lag, shortest-round-trip doubles (the
    * q36 interpolation rule). */
  private def numSql = (1 to depth)
    .map(j => s"COALESCE(CAST(l$j AS DOUBLE), 0.0) * ${w(j)}")
    .mkString(" + ")
  private def denSql = (1 to depth)
    .map(j => s"CASE WHEN l$j IS NOT NULL THEN ${w(j)} ELSE 0.0 END")
    .mkString(" + ")
  private def lagsSql = (1 to depth)
    .map(j => s"lag(cnt, $j) OVER w AS l$j").mkString(", ")

  val oracle: Map[String, String] = Map(
    "e18_control_chart" ->
      s"""WITH h AS (SELECT date_trunc('hour', ts) AS hr_ts, event_type,
              CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2),
          l AS (SELECT hr_ts, event_type, cnt, $lagsSql
            FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hr_ts)),
          c AS (SELECT hr_ts, event_type, cnt,
              CASE WHEN ($denSql) > 0.0
                   THEN ($numSql) / ($denSql) END AS braw
            FROM l)
          SELECT hr_ts, event_type, cnt, round(braw, 4) AS baseline,
            CASE WHEN braw IS NOT NULL
                   AND (CAST(cnt AS DOUBLE) >= $critHigh * braw
                        OR CAST(cnt AS DOUBLE) <= $critLow * braw)
                 THEN 'crit'
                 WHEN braw IS NOT NULL
                   AND (CAST(cnt AS DOUBLE) >= $warnHigh * braw
                        OR CAST(cnt AS DOUBLE) <= $warnLow * braw)
                 THEN 'warn' END AS level
          FROM c ORDER BY event_type, hr_ts""")
}
