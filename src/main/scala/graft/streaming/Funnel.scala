package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.sources.Tables

/** Input row for the stateful funnel (typed view of `events`). */
case class FunnelEvent(user_id: Long, ts: Timestamp, event_type: String,
    event_id: Long)

/** One buffered event in funnel state (millis since epoch). */
case class BufEv(tsMs: Long, tpe: String, eventId: Long)

/** Per-user state: events of the still-open sessions, oldest first. */
case class FunnelState(events: List[BufEv])

/** One closed session with its funnel depth. */
case class FunnelSession(user_id: Long, session_start: Timestamp,
    n_events: Long, funnel_stage: Int)

/** Ordered conversion-funnel per session (SURVEY.md §2.B D22 custom
  * state): within each 30-minute-gap session, how deep did the user get
  * through view → click → purchase IN TEMPORAL ORDER?
  *
  *   t_view     = min ts of 'view' events
  *   t_click    = min ts of 'click'    events with ts >= t_view
  *   t_purchase = min ts of 'purchase' events with ts >= t_click
  *   funnel_stage = 3/2/1/0 for the deepest stage reached
  *
  * This is ORDER-SENSITIVE (a purchase before any click does not count),
  * which is exactly what `session_window` + builtin aggregates cannot
  * express — hence the `flatMapGroupsWithState` streaming variant
  * ([[sessionFunnelStream]]), the one place in the engine that
  * hand-rolls state. The batch twin ([[sessionFunnel]]) stays fully
  * declarative: gaps-and-islands sessionization plus a chain of
  * session-partition window minima, all under ONE hash exchange on
  * `user_id` (sid and (user_id, sid) requirements are satisfied by the
  * coarser user_id partitioning, so Catalyst plans no further shuffle —
  * guarded in PlanSpec).
  */
object Funnel {

  /** Session gap; a gap >= this starts a new session (mirrors the e3
    * gaps-and-islands oracle convention). */
  private val gapMs = 30L * 60 * 1000

  // ---- batch twin (declarative; this is what the oracle checks) ----

  /** Sessionize + ordered funnel, one shuffle. Output: (user_id,
    * session_start, n_events, funnel_stage). */
  def sessionFunnel(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val lagTs = lag(col("ts"), 1).over(byUser)
    val newS = when(lagTs.isNull
      .or(col("ts") >= lagTs + expr("INTERVAL 30 MINUTES")), 1).otherwise(0)
    val bySess = Window.partitionBy(col("user_id"), col("sid"))
    events
      .withColumn("sid", sum(newS).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // min(CASE …) ignores nulls, so each t_* is the constrained minimum;
      // a later window may reference an earlier one (Catalyst chains the
      // Window operators over the same user_id partitioning)
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("ts"))).over(bySess))
      .withColumn("t_click",
        min(when(col("event_type") === "click" && col("ts") >= col("t_view"),
          col("ts"))).over(bySess))
      .withColumn("t_purchase",
        min(when(col("event_type") === "purchase" && col("ts") >= col("t_click"),
          col("ts"))).over(bySess))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).as("session_start"),
        count(lit(1)).as("n_events"),
        // partition-constant per (user_id, sid); min is order-independent
        min(col("t_view")).as("tv"), min(col("t_click")).as("tc"),
        min(col("t_purchase")).as("tp"))
      .select(col("user_id"), col("session_start"), col("n_events"),
        when(col("tp").isNotNull, 3).when(col("tc").isNotNull, 2)
          .when(col("tv").isNotNull, 1).otherwise(0)
          .cast("int").as("funnel_stage"))
  }

  def e6Funnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sessionFunnel(Tables.events(spark, dir))
      .orderBy($"user_id", $"session_start")
  }

  // ---- streaming variant (custom state) ----

  /** Streaming deployment: per-user `flatMapGroupsWithState` buffers the
    * open sessions' events (state bounded by the watermark horizon: a
    * session closes — and its buffer is dropped — as soon as the
    * watermark passes session-end + gap), emits each closed session
    * once (append mode), and uses an event-time timeout to flush
    * sessions for users that stop sending events.
    *
    * Buffered timestamps are millis; sub-millisecond event-time is
    * truncated in the state (not in the emitted session_start ordering,
    * which ties are broken on event_id for).
    */
  def sessionFunnelStream(spark: SparkSession, events: DataFrame,
      delay: String = "10 minutes"): DataFrame = {
    import spark.implicits._
    events.withWatermark("ts", delay)
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(updateFunnel)
      .toDF()
  }

  /** State-update function: merge buffered + incoming events, split into
    * gap-sessions, emit the ones the watermark has sealed, keep the
    * rest, and arm the timeout at the earliest open session's close
    * time. Called with an empty iterator on timeout — same code path. */
  private[streaming] def updateFunnel(userId: Long,
      in: Iterator[FunnelEvent],
      state: GroupState[FunnelState]): Iterator[FunnelSession] = {
    val incoming = in.map(e => BufEv(e.ts.getTime, e.event_type, e.event_id))
    val all = (state.getOption.map(_.events).getOrElse(Nil) ++ incoming)
      .sortBy(e => (e.tsMs, e.eventId))
    if (all.isEmpty) { state.remove(); return Iterator.empty }

    // split the sorted buffer into gap-sessions (>= gap starts a new one)
    val sessions = all.tail.foldLeft(List(List(all.head))) { (acc, e) =>
      if (e.tsMs - acc.head.head.tsMs >= gapMs) List(e) :: acc
      else (e :: acc.head) :: acc.tail
    }.map(_.reverse).reverse // chronological sessions, each oldest-first
    // note: gap is measured from the LAST event of the open session —
    // acc.head.head is the most recent because we prepend
    val wm = state.getCurrentWatermarkMs()
    val (closed, open) = sessions.partition(s => s.last.tsMs + gapMs <= wm)

    if (open.isEmpty) state.remove()
    else {
      state.update(FunnelState(open.flatten))
      // open sessions all have close-time > wm (else they'd be closed),
      // so this timestamp is legal; fires when the watermark seals the
      // EARLIEST open session even if the user goes quiet
      state.setTimeoutTimestamp(open.head.last.tsMs + gapMs)
    }
    closed.iterator.map(funnelOf(userId, _))
  }

  /** Ordered funnel over one session's events — the same constrained
    * minima as the batch twin's window chain (ties included via >=). */
  private def funnelOf(uid: Long, evs: List[BufEv]): FunnelSession = {
    val tView = evs.collect { case e if e.tpe == "view" => e.tsMs }
      .minOption
    val tClick = tView.flatMap(tv =>
      evs.collect { case e if e.tpe == "click" && e.tsMs >= tv => e.tsMs }
        .minOption)
    val tPurchase = tClick.flatMap(tc =>
      evs.collect { case e if e.tpe == "purchase" && e.tsMs >= tc => e.tsMs }
        .minOption)
    val stage =
      if (tPurchase.isDefined) 3
      else if (tClick.isDefined) 2
      else if (tView.isDefined) 1
      else 0
    FunnelSession(uid, new Timestamp(evs.map(_.tsMs).min),
      evs.length.toLong, stage)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e6_funnel" -> e6Funnel)

  val oracle: Map[String, String] = Map(
    "e6_funnel" ->
      """WITH o AS (
           SELECT user_id, event_id, ts, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s AS (
           SELECT user_id, ts, event_type,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM o),
         v AS (SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
                 OVER (PARTITION BY user_id, sid) AS t_view FROM s),
         c AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts >= t_view
                 THEN ts END) OVER (PARTITION BY user_id, sid) AS t_click FROM v),
         p AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= t_click
                 THEN ts END) OVER (PARTITION BY user_id, sid) AS t_purchase FROM c)
         SELECT user_id, min(ts) AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(CASE WHEN min(t_purchase) IS NOT NULL THEN 3
                     WHEN min(t_click) IS NOT NULL THEN 2
                     WHEN min(t_view) IS NOT NULL THEN 1
                     ELSE 0 END AS INT) AS funnel_stage
         FROM p GROUP BY user_id, sid ORDER BY user_id, session_start""")
}
