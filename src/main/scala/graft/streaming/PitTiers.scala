package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Analytics
import graft.sources.Tables

/** One event entering the PIT state machine (typed view of `events`). */
case class PitEvent(user_id: Long, ts: Timestamp, event_id: Long,
    event_type: String, value: Double)

/** One enriched activity: the spend tier active when it happened
  * (−1 before the user's first purchase). */
case class PitActivity(user_id: Long, event_id: Long, ts: Timestamp,
    tier: Int)

/** One buffered not-yet-sealed event. */
case class PendingPit(tsMs: Long, eventId: Long, isPurchase: Boolean,
    value: Double, ts: Timestamp)

/** Per-user PIT state: the current tier + the unsealed buffer. */
case class PitState(tier: Int, pending: List[PendingPit])

/** Streaming point-in-time dimension enrichment (SURVEY.md §2.B12
  * D70) — the CDC-versioned-dimension join done ONLINE: purchases are
  * dimension updates (they set the user's spend tier,
  * floor(value / 25) as in q46), every other event is an activity that
  * must be tagged with the tier that was active AT ITS EVENT TIME.
  * The batch equivalent is q46's interval build + point-in-time join;
  * the streaming form never materializes intervals at all — one
  * `flatMapGroupsWithState` keeps the current tier per user and folds
  * both row kinds through the same watermark-sealed buffer (the e9
  * pattern), so out-of-order dimension updates and activities
  * re-interleave correctly before any activity is tagged.
  *
  * Ordering is pinned exactly to the batch join's semantics: an
  * activity at a purchase's exact ts belongs to the NEW interval
  * (`ts >= valid_from`), so same-ts events fold purchases first
  * ((ts, ¬isPurchase, event_id) sort); activities before the user's
  * first purchase get tier −1 on both sides.
  *
  * State per user is one int + the unsealed buffer — bounded by the
  * watermark horizon, never by history. The e11 query is the batch
  * twin's per-tier census (oracle-gated); StreamingSpec pins
  * stream ≡ batch on the per-activity rows. */
object PitTiers {

  // ---- batch twin ----

  /** Per-activity tier assignment over a batch frame (the join form —
    * what the stream must reproduce row-for-row). */
  def activityTiers(ev: DataFrame): DataFrame = {
    import ev.sparkSession.implicits._
    val dim = Analytics.dimIntervals(ev)
      .select($"user_id".as("d_user"), $"valid_from", $"valid_to", $"tier")
    ev.filter($"event_type" =!= "purchase")
      .select($"user_id", $"event_id", $"ts")
      .join(dim,
        $"user_id" === $"d_user" && $"ts" >= $"valid_from" &&
          ($"valid_to".isNull || $"ts" < $"valid_to"),
        "left")
      .select($"user_id", $"event_id", $"ts",
        coalesce($"tier", lit(-1)).as("tier"))
  }

  /** e11: per-tier activity census (bounded by the tier count). */
  def e11PitTiers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    activityTiers(Tables.events(spark, dir))
      .groupBy($"tier")
      .agg(count(lit(1)).as("n_activities"),
        countDistinct($"user_id").as("n_users"))
      .orderBy($"tier")
  }

  // ---- streaming variant ----

  def pitTierStream(spark: SparkSession, events: DataFrame,
      delay: String = "10 minutes"): DataFrame = {
    import spark.implicits._
    events.withWatermark("ts", delay)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
      .as[PitEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(updatePit)
      .toDF()
  }

  private[streaming] def updatePit(userId: Long,
      in: Iterator[PitEvent],
      state: GroupState[PitState]): Iterator[PitActivity] = {
    val prev = state.getOption.getOrElse(PitState(-1, Nil))
    val buf = (prev.pending ++ in.map(e =>
        PendingPit(e.ts.getTime, e.event_id, e.event_type == "purchase",
          e.value, e.ts)))
      .sortBy(p => (p.tsMs, !p.isPurchase, p.eventId))
    val wm = state.getCurrentWatermarkMs()
    val (ready, open) = buf.partition(_.tsMs <= wm)

    var tier = prev.tier
    val out = ready.flatMap { p =>
      if (p.isPurchase) {
        tier = math.floor(p.value / Analytics.scd2TierWidth).toInt
        None
      } else Some(PitActivity(userId, p.eventId, p.ts, tier))
    }
    if (open.isEmpty && out.isEmpty && ready.isEmpty) state.remove()
    else {
      state.update(PitState(tier, open))
      if (open.nonEmpty) state.setTimeoutTimestamp(open.head.tsMs + 1)
    }
    out.iterator
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e11_pit_tiers" -> e11PitTiers)

  val oracle: Map[String, String] = Map(
    "e11_pit_tiers" ->
      """WITH ch AS (SELECT user_id, event_id, ts AS valid_from,
              CAST(floor(value / 25) AS INT) AS tier
            FROM events WHERE event_type = 'purchase'),
          dim AS (SELECT user_id, valid_from, tier,
              lead(valid_from) OVER (PARTITION BY user_id
                ORDER BY valid_from, event_id) AS valid_to
            FROM ch),
          act AS (SELECT e.user_id, e.event_id,
              coalesce(d.tier, -1) AS tier
            FROM events e LEFT JOIN dim d ON d.user_id = e.user_id
              AND e.ts >= d.valid_from
              AND (d.valid_to IS NULL OR e.ts < d.valid_to)
            WHERE e.event_type <> 'purchase')
          SELECT tier, CAST(count(*) AS BIGINT) AS n_activities,
            CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
          FROM act GROUP BY tier ORDER BY tier""")
}
