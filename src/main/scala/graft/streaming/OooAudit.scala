package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.sources.Tables

/** Input row for the out-of-order audit (typed view of `events`). */
case class OooEvent(user_id: Long, ts: Timestamp, event_id: Long)

/** Per-event lateness verdict: how far (whole seconds) this event's
  * event-time sits BEHIND the furthest event-time already ingested for
  * the same user. 0 = in order. */
case class OooLateness(user_id: Long, event_id: Long, late_s: Long)

/** Per-user audit state: furthest event-time seen so far (floor-s). */
case class OooState(maxSec: Long)

/** Out-of-order-arrival audit (SURVEY.md §2.B12 D109) — the watermark
  * TUNING instrument: before choosing `withWatermark` delays, measure
  * how late the source actually delivers. Per user, each event's
  * lateness is `max(0, maxSeenTs − ts)` in ARRIVAL order, rolled up to
  * (n_events, n_late, max_late_s) per user — read "p99 of max_late_s
  * across users" as the watermark delay the stream actually needs.
  *
  * Arrival proxy: the fixture ships ts-SORTED (event_id order IS
  * event-time order — physical order would make the audit vacuously
  * zero), so arrival is simulated as a deterministic md5 scramble of
  * the ingestion id (`md5(event_id::string)`, the t19 hash-of-id
  * precedent): network-shuffled delivery, exactly replayable on both
  * engines. In production the arrival key is the physical ingestion
  * sequence and the scramble disappears.
  *
  * Unlike every other streaming operator here, the streaming variant
  * needs NO watermark and NO event-time buffering: out-of-orderness is
  * the measurand, so events fold in arrival order the moment they
  * appear — state is ONE long per user (the furthest timestamp seen),
  * emission is immediate. Batch twin is a pure window: running max
  * over the per-user arrival order (one hash exchange), then a
  * co-partitioned rollup — the q62 shape.
  */
object OooAudit {

  /** The simulated-arrival sort key: lowercase md5 hex of the decimal
    * event_id, identical in Spark, DuckDB, and the JVM replay. */
  private[streaming] def arrivalKey(eventId: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(eventId.toString.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  /** The pure per-user fold in arrival order. Exposed for the spec. */
  private[streaming] def latenessFold(userId: Long, startMax: Long,
      it: Iterator[(Long, Long)]): (Long, Iterator[OooLateness]) = {
    var mx = startMax
    val out = it.map { case (eventId, sec) =>
      val late = if (mx != Long.MinValue && mx > sec) mx - sec else 0L
      if (sec > mx) mx = sec
      OooLateness(userId, eventId, late)
    }.toList
    (mx, out.iterator)
  }

  /** Floor-seconds of a Timestamp (q62 convention). */
  private def tsSec(ts: Timestamp): Long = Math.floorDiv(ts.getTime, 1000L)

  /** e13 batch twin: per-user arrival-order lateness rollup. */
  def e13OooAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"akey", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", unix_timestamp($"ts").as("sec"),
        md5($"event_id".cast("string")).as("akey"))
      .withColumn("runmax", max($"sec").over(w))
      .withColumn("late_s",
        when($"runmax" > $"sec", $"runmax" - $"sec").otherwise(0L))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(($"late_s" > 0L).cast("long")).as("n_late"),
        max($"late_s").as("max_late_s"))
      .orderBy($"user_id")
  }

  /** D227: watermark-delay advisor — e13's per-event lateness stream
    * rolled up to the EXACT corpus-wide lateness order statistics
    * (p50/p95/p99/max, ceil-rank on the distinct-value census — the
    * q38 method, no percentile buffering) plus the advised
    * `withWatermark` delay (= p99) and the event fraction that delay
    * covers: the one-row answer to "what delay do I actually pass to
    * withWatermark?", which e13's per-user rollup leaves as a manual
    * read-off.
    *
    * Scale shape: the lateness derivation is e13's (one per-user hash
    * exchange); the census groups by INTEGER lateness seconds, so its
    * frame is bounded by the source's OOO skew domain (max_late_s
    * distinct values, ≪ corpus — the q38 bounded-census argument),
    * and the single cumulative window + 1-row totals broadcast ride
    * that bounded frame, never event rows. */
  def e20WatermarkAdvisor(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"akey", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val late = Tables.events(spark, dir)
      .select($"user_id", $"event_id", unix_timestamp($"ts").as("sec"),
        md5($"event_id".cast("string")).as("akey"))
      .withColumn("runmax", max($"sec").over(w))
      .select(when($"runmax" > $"sec", $"runmax" - $"sec")
        .otherwise(0L).as("late_s"))
    val cen = late.groupBy($"late_s").agg(count(lit(1)).as("c"))
    val wCum = Window.orderBy($"late_s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def rank(q: String) =
      expr(s"CAST(ceil($q * CAST(n AS DOUBLE)) AS BIGINT)")
    cen.withColumn("cum", sum($"c").over(wCum))
      .crossJoin(broadcast(cen.agg(sum($"c").as("n"))))
      .agg(max($"n").as("n_events"),
        sum(when($"late_s" > 0L, $"c").otherwise(0L)).as("n_late"),
        min(when($"cum" >= rank("0.50"), $"late_s")).as("p50_late_s"),
        min(when($"cum" >= rank("0.95"), $"late_s")).as("p95_late_s"),
        min(when($"cum" >= rank("0.99"), $"late_s")).as("p99_late_s"),
        max($"late_s").as("max_late_s"),
        min(when($"cum" >= rank("0.99"), $"cum")).as("cov99"))
      .select($"n_events", $"n_late", $"p50_late_s", $"p95_late_s",
        $"p99_late_s", $"max_late_s",
        $"p99_late_s".as("advised_delay_s"),
        round($"cov99".cast("double") / $"n_events".cast("double"), 4)
          .as("covered_frac"))
  }

  // ---- streaming variant (arrival-order fold, O(1) state) ----

  /** Streaming deployment: per-event lateness emitted as events
    * arrive. Micro-batch arrival granularity: within one micro-batch,
    * arrival order is pinned to event_id (the same ingestion-sequence
    * proxy the batch twin uses), so stream ≡ batch whenever the feed
    * delivers event_ids in order across batches. */
  def oooStream(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events
      .select(col("user_id"), col("ts"), col("event_id"))
      .as[OooEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(updateAudit)
      .toDF()
  }

  private[streaming] def updateAudit(userId: Long,
      in: Iterator[OooEvent],
      state: GroupState[OooState]): Iterator[OooLateness] = {
    val start = state.getOption.map(_.maxSec).getOrElse(Long.MinValue)
    val ordered = in.toSeq
      .sortBy(e => (arrivalKey(e.event_id), e.event_id))
      .map(e => (e.event_id, tsSec(e.ts))).iterator
    val (mx, out) = latenessFold(userId, start, ordered)
    state.update(OooState(mx))
    out
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e13_ooo_audit" -> e13OooAudit,
    "e20_watermark_advisor" -> e20WatermarkAdvisor)

  val oracle: Map[String, String] = Map(
    "e13_ooo_audit" ->
      """WITH d AS (SELECT user_id, event_id,
              CAST(floor(epoch(ts)) AS BIGINT) AS sec,
              md5(CAST(event_id AS VARCHAR)) AS akey
            FROM events),
          r AS (SELECT user_id, sec,
              max(sec) OVER (PARTITION BY user_id ORDER BY akey, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS runmax
            FROM d)
          SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
            CAST(count(*) FILTER (runmax > sec) AS BIGINT) AS n_late,
            CAST(COALESCE(max(CASE WHEN runmax > sec THEN runmax - sec
              ELSE 0 END), 0) AS BIGINT) AS max_late_s
          FROM r GROUP BY user_id ORDER BY user_id""",
    "e20_watermark_advisor" ->
      """WITH d AS (SELECT user_id, event_id,
              CAST(floor(epoch(ts)) AS BIGINT) AS sec,
              md5(CAST(event_id AS VARCHAR)) AS akey
            FROM events),
          r AS (SELECT user_id, sec,
              max(sec) OVER (PARTITION BY user_id ORDER BY akey, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS runmax
            FROM d),
          l AS (SELECT CASE WHEN runmax > sec THEN runmax - sec
              ELSE 0 END AS late_s FROM r),
          cen AS (SELECT late_s, CAST(count(*) AS BIGINT) AS c
            FROM l GROUP BY 1),
          cm AS (SELECT late_s, c,
              CAST(sum(c) OVER (ORDER BY late_s
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum
            FROM cen),
          tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cen),
          m AS (SELECT
              CAST(max(n) AS BIGINT) AS n_events,
              CAST(sum(CASE WHEN late_s > 0 THEN c ELSE 0 END)
                AS BIGINT) AS n_late,
              CAST(min(CASE WHEN cum >=
                  CAST(ceil(0.50 * CAST(n AS DOUBLE)) AS BIGINT)
                THEN late_s END) AS BIGINT) AS p50_late_s,
              CAST(min(CASE WHEN cum >=
                  CAST(ceil(0.95 * CAST(n AS DOUBLE)) AS BIGINT)
                THEN late_s END) AS BIGINT) AS p95_late_s,
              CAST(min(CASE WHEN cum >=
                  CAST(ceil(0.99 * CAST(n AS DOUBLE)) AS BIGINT)
                THEN late_s END) AS BIGINT) AS p99_late_s,
              CAST(max(late_s) AS BIGINT) AS max_late_s,
              CAST(min(CASE WHEN cum >=
                  CAST(ceil(0.99 * CAST(n AS DOUBLE)) AS BIGINT)
                THEN cum END) AS BIGINT) AS cov99
            FROM cm CROSS JOIN tot)
          SELECT n_events, n_late, p50_late_s, p95_late_s, p99_late_s,
            max_late_s, p99_late_s AS advised_delay_s,
            round(CAST(cov99 AS DOUBLE) / CAST(n_events AS DOUBLE), 4)
              AS covered_frac
          FROM m""")
}
