package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.sources.Tables

/** Input row for the stateful budget monitor (typed view of `events`). */
case class SpendEvent(user_id: Long, ts: Timestamp, event_id: Long,
    value: Double)

/** One buffered not-yet-sealed event (millis since epoch). */
case class PendingSpend(tsMs: Long, eventId: Long, cents: Long)

/** Per-user monitor state: running total of sealed events + the
  * still-unsealed buffer (bounded by the watermark horizon). */
case class BudgetState(cumCents: Long, pending: List[PendingSpend])

/** One emitted threshold crossing. */
case class BudgetAlert(user_id: Long, event_id: Long, ts: Timestamp,
    cum_cents: Long, tier: Int)

/** Per-user budget-threshold alerting (SURVEY.md §2.B D54): every event
  * that pushes a user's running spend across a multiple of
  * [[Budget.tierCents]] emits one alert row with the new tier.
  *
  * Money is INTEGER CENTS (floor(value·100)) and the running total a
  * sequential integer fold in (ts, event_id) order, so batch, stream and
  * the DuckDB oracle agree bit-for-bit — no float summation order
  * exists (the g1/q37 fixed-point discipline applied to running state).
  *
  * Batch twin: one hash exchange on user_id, a running-frame window sum,
  * and a crossing filter `tier(cum) > tier(cum − this event)` — fully
  * declarative, oracle-gated (`e9_budget_alerts`).
  *
  * Streaming variant: `flatMapGroupsWithState` buffers events the
  * watermark has not sealed (out-of-order arrivals re-sort in the
  * buffer, exactly like the funnel), folds sealed events into a single
  * running BIGINT, emits crossings in event-time order, and arms an
  * event-time timeout so a user who goes quiet still flushes once the
  * watermark passes their buffered events. State per user is O(unsealed
  * events) + one long — bounded by the watermark horizon, never by
  * history length.
  */
object Budget {

  /** Alert granularity: one tier per 100.00 of cumulative spend. */
  val tierCents = 10000L

  /** FLOOR integer division (exact, pmod-based — no double round-trip):
    * Spark's `div` truncates toward zero while DuckDB's `//` floors, so
    * for negative cumulative spend (refund-heavy users) they disagree on
    * the tier. Tier semantics are pinned to FLOOR on every side (batch,
    * stream via `Math.floorDiv`, oracle `//`): a user refunded below 0
    * sits in tier −1 and re-crossing tier boundaries upward after a
    * refund re-alerts — deterministic, engine-independent. */
  private def floorDiv(e: String, d: Long): String =
    s"(($e) - pmod($e, ${d}L)) div ${d}L"

  // ---- batch twin (declarative; this is what the oracle checks) ----

  /** Threshold crossings over a batch events frame. */
  def budgetAlerts(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("cents", floor(col("value") * 100).cast("long"))
      .withColumn("cum_cents", sum(col("cents")).over(w))
      .filter(expr(floorDiv("cum_cents", tierCents)) >
        expr(floorDiv("cum_cents - cents", tierCents)))
      .select(col("user_id"), col("event_id"), col("ts"), col("cum_cents"),
        expr(floorDiv("cum_cents", tierCents)).cast("int").as("tier"))
  }

  def e9BudgetAlerts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // event_id makes the sort total: a refund can re-cross the same
    // boundary, producing duplicate (user_id, cum_cents) pairs.
    budgetAlerts(Tables.events(spark, dir))
      .orderBy($"user_id", $"cum_cents", $"event_id")
  }

  // ---- streaming variant (custom state) ----

  /** Streaming deployment over an events stream (same columns as the
    * fixture). Emits each crossing exactly once, in event-time order
    * per user, once the watermark seals the crossing event. */
  def budgetAlertStream(spark: SparkSession, events: DataFrame,
      delay: String = "10 minutes"): DataFrame = {
    import spark.implicits._
    events.withWatermark("ts", delay)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[SpendEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(updateBudget)
      .toDF()
  }

  /** State update: merge + sort the unsealed buffer, fold every event
    * the watermark has sealed into the running total (emitting
    * crossings), keep the rest, arm a timeout at the earliest unsealed
    * event so quiet users still flush. */
  private[streaming] def updateBudget(userId: Long,
      in: Iterator[SpendEvent],
      state: GroupState[BudgetState]): Iterator[BudgetAlert] = {
    val prev = state.getOption.getOrElse(BudgetState(0L, Nil))
    val buf = (prev.pending ++ in.map(e =>
        PendingSpend(e.ts.getTime, e.event_id, math.floor(e.value * 100).toLong)))
      .sortBy(p => (p.tsMs, p.eventId))
    val wm = state.getCurrentWatermarkMs()
    val (ready, open) = buf.partition(_.tsMs <= wm)

    var cum = prev.cumCents
    val alerts = ready.flatMap { p =>
      val before = cum
      cum += p.cents
      // floorDiv, not /: tier semantics are FLOOR (see floorDiv above)
      if (Math.floorDiv(cum, tierCents) > Math.floorDiv(before, tierCents))
        Some(BudgetAlert(userId, p.eventId, new Timestamp(p.tsMs), cum,
          Math.floorDiv(cum, tierCents).toInt))
      else None
    }
    if (open.isEmpty && alerts.isEmpty && ready.isEmpty) state.remove()
    else {
      state.update(BudgetState(cum, open))
      if (open.nonEmpty) state.setTimeoutTimestamp(open.head.tsMs + 1)
    }
    alerts.iterator
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e9_budget_alerts" -> e9BudgetAlerts)

  val oracle: Map[String, String] = Map(
    "e9_budget_alerts" ->
      s"""WITH c AS (SELECT user_id, event_id, ts,
              CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
          r AS (SELECT user_id, event_id, ts, cents,
              CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                AS cum_cents
            FROM c)
          SELECT user_id, event_id, ts, cum_cents,
            CAST(cum_cents // $tierCents AS INT) AS tier
          FROM r
          WHERE cum_cents // $tierCents > (cum_cents - cents) // $tierCents
          ORDER BY user_id, cum_cents, event_id""")
}
