package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.sources.Tables

/** Input row for the rate limiter (typed view of `events`). */
case class RateEvent(user_id: Long, ts: Timestamp, event_id: Long)

/** One admit/reject decision. `admitted` is int (1/0) so the rollup is
  * a plain sum and the oracle CASE matches bit-for-bit. */
case class RateDecision(user_id: Long, event_id: Long, ts: Timestamp,
    admitted: Int)

/** One buffered not-yet-sealed request (event-time micros + payload). */
case class PendingReq(tsUs: Long, eventId: Long, ts: Timestamp)

/** Per-user limiter state: token units available after the last sealed
  * event, that event's time, and the unsealed buffer. */
case class RateLimitState(availUnits: Long, lastUs: Long,
    pending: List[PendingReq])

/** Per-user event-time token-bucket rate limiting (SURVEY.md §2.B12
  * D66) — the throttling/admission-control operator an ingest or
  * API-request pipeline runs in front of expensive downstream work.
  *
  * Bucket semantics (classic token bucket, event-time):
  * capacity [[RateLimit.capTokens]] tokens, refill 1 token per
  * [[RateLimit.refillUs]] MICROSECONDS of event time, bucket starts
  * full. Each event consumes one token if available (admitted)
  * and is rejected otherwise; rejected events consume nothing.
  * All arithmetic is INTEGER MICRO-units (1 unit = 1 μs of refill:
  * a token is `refillUs` units) — the e9/g1 fixed-point discipline —
  * so batch, stream and the DuckDB oracle agree bit-for-bit with no
  * float rate anywhere.
  *
  * Batch twin: `groupByKey(user).flatMapSortedGroups(ts, event_id)` —
  * the (c3) sorted-fold shape: the per-user sequential
  * conditional-reset fold is not expressible as a window cumsum
  * (admission depends on the fold state), the sort rides the
  * shuffle's secondary-sort machinery, state is O(1), and users fold
  * in parallel. The oracle replays it as a recursive CTE (depth =
  * max events/user).
  *
  * Streaming variant: `flatMapGroupsWithState` with the [[Budget]]
  * watermark-sealed buffer pattern — out-of-order arrivals re-sort in
  * the bounded unsealed buffer, sealed events fold through the bucket
  * in (ts, event_id) order, and an event-time timeout flushes quiet
  * users. State per user is O(unsealed) + two longs.
  */
object RateLimit {

  /** Refill interval: one token per 4 event-time hours (in μs). */
  val refillUs = 14400000000L

  /** Bucket capacity in tokens. */
  val capTokens = 2L

  /** Capacity in integer μs-units. */
  val capUnits: Long = capTokens * refillUs

  /** The pure per-user fold: events in (ts, event_id) order through
    * the bucket. Exposed for the spec's brute replay. */
  private[streaming] def limitFold(userId: Long,
      it: Iterator[(Long, Long, Timestamp)]): Iterator[RateDecision] = {
    var avail = capUnits
    var lastUs = Long.MinValue
    it.map { case (tsUs, eventId, ts) =>
      if (lastUs != Long.MinValue)
        avail = math.min(capUnits, avail + (tsUs - lastUs))
      lastUs = tsUs
      val admitted = avail >= refillUs
      if (admitted) avail -= refillUs
      RateDecision(userId, eventId, ts, if (admitted) 1 else 0)
    }
  }

  /** Per-event admit/reject decisions over a batch events frame. */
  def rateDecisions(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id"), col("ts"), col("event_id"))
      .as[RateEvent]
      .groupByKey(_.user_id)
      .flatMapSortedGroups(col("ts"), col("event_id")) {
        (user: Long, it: Iterator[RateEvent]) =>
          limitFold(user, it.map(e =>
            (tsMicros(e.ts), e.event_id, e.ts)))
      }
      .toDF()
  }

  /** e10: per-user admitted/rejected census (bounded by user count). */
  def e10RateLimit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    rateDecisions(Tables.events(spark, dir))
      .groupBy($"user_id")
      .agg(sum($"admitted").cast("long").as("n_admitted"),
        (count(lit(1)) - sum($"admitted")).cast("long").as("n_rejected"))
      .orderBy($"user_id")
  }

  /** Event-time micros of a Timestamp (getTime carries whole ms;
    * getNanos the full fractional part). */
  private def tsMicros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  // ---- streaming variant (custom state, Budget's sealed-buffer shape) ----

  /** Streaming deployment: emits each decision exactly once, in
    * event-time order per user, once the watermark seals the event. */
  def rateLimitStream(spark: SparkSession, events: DataFrame,
      delay: String = "10 minutes"): DataFrame = {
    import spark.implicits._
    events.withWatermark("ts", delay)
      .select(col("user_id"), col("ts"), col("event_id"))
      .as[RateEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(updateLimiter)
      .toDF()
  }

  private[streaming] def updateLimiter(userId: Long,
      in: Iterator[RateEvent],
      state: GroupState[RateLimitState]): Iterator[RateDecision] = {
    val prev = state.getOption.getOrElse(
      RateLimitState(capUnits, Long.MinValue, Nil))
    val buf = (prev.pending ++ in.map(e =>
        PendingReq(tsMicros(e.ts), e.event_id, e.ts)))
      .sortBy(p => (p.tsUs, p.eventId))
    val wm = state.getCurrentWatermarkMs() * 1000L
    val (ready, open) = buf.partition(_.tsUs <= wm)

    var avail = prev.availUnits
    var lastUs = prev.lastUs
    val decisions = ready.map { p =>
      if (lastUs != Long.MinValue)
        avail = math.min(capUnits, avail + (p.tsUs - lastUs))
      lastUs = p.tsUs
      val admitted = avail >= refillUs
      if (admitted) avail -= refillUs
      RateDecision(userId, p.eventId, p.ts, if (admitted) 1 else 0)
    }
    if (open.isEmpty && decisions.isEmpty && ready.isEmpty) state.remove()
    else {
      state.update(RateLimitState(avail, lastUs, open))
      if (open.nonEmpty) state.setTimeoutTimestamp(open.head.tsUs / 1000L + 1)
    }
    decisions.iterator
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e10_rate_limit" -> e10RateLimit)

  val oracle: Map[String, String] = Map(
    "e10_rate_limit" ->
      s"""WITH RECURSIVE d AS (
            SELECT user_id, event_id, epoch_us(ts) AS tus,
              row_number() OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS rn
            FROM events),
          r AS (
            SELECT user_id, event_id, tus, rn,
              1 AS admitted, $capUnits - $refillUs AS avail
            FROM d WHERE rn = 1
            UNION ALL
            SELECT d.user_id, d.event_id, d.tus, d.rn,
              CASE WHEN least($capUnits, r.avail + (d.tus - r.tus))
                     >= $refillUs THEN 1 ELSE 0 END,
              least($capUnits, r.avail + (d.tus - r.tus)) -
                CASE WHEN least($capUnits, r.avail + (d.tus - r.tus))
                       >= $refillUs THEN $refillUs ELSE 0 END
            FROM r JOIN d ON d.user_id = r.user_id AND d.rn = r.rn + 1)
          SELECT user_id, CAST(sum(admitted) AS BIGINT) AS n_admitted,
            CAST(count(*) - sum(admitted) AS BIGINT) AS n_rejected
          FROM r GROUP BY user_id ORDER BY user_id""")
}
