package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.sources.Tables

/** Input row for the gap detector (typed view of `events`). */
case class GapEvent(user_id: Long, ts: Timestamp, event_id: Long)

/** One confirmed silence: the user's consecutive-event gap that
  * exceeded the threshold. */
case class GapRow(user_id: Long, gap_start_ms: Long, gap_end_ms: Long,
    gap_s: Long)

/** Per-user state: events the watermark has not sealed, plus the
  * (ts_ms, event_id) of the last SEALED event — the left edge of the
  * next candidate gap. */
case class GapState(pending: List[(Long, Long)], last: Option[(Long, Long)])

/** D199: streaming absence detection — per user, every gap between
  * CONSECUTIVE events longer than [[GapAlerts.gapThresholdS]] is
  * emitted as a confirmed-silence row once the closing event seals:
  * the "device went dark / user churn-risk ping" surface. This is the
  * inverse of e3's sessionization (which MERGES activity; this
  * reports the holes) and, like e14/e18, it is not expressible as a
  * watermark-appended windowed aggregate — the pair (previous event,
  * next event) needs custom state.
  *
  * Stream side: the e15 sealed-buffer discipline — arrivals buffer
  * until the watermark passes them, then fold in exact (ts, event_id)
  * order against the last sealed event, so OOO delivery within the
  * watermark cannot split or duplicate a gap. State is O(unsealed
  * events + 1), never history-sized.
  *
  * Batch twin (what the oracle checks): ONE lag window partitioned by
  * user (high cardinality), integer-second arithmetic, exactly the
  * rows the drained stream emits. Stream ≡ batch guarded in
  * StreamingSpec with an OOO arrival.
  */
object GapAlerts {

  /** Minimum silence (whole seconds) that counts as a gap. */
  val gapThresholdS = 6L * 3600

  // ---- batch twin (declarative; this is what the oracle checks) ----

  def gapAlerts(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_ms", $"event_id")
    events.select($"user_id", unix_millis($"ts").as("ts_ms"), $"event_id")
      .withColumn("prev_ms", lag($"ts_ms", 1).over(w))
      .filter($"prev_ms".isNotNull &&
        expr("(ts_ms - prev_ms) div 1000") > gapThresholdS)
      .select($"user_id", $"prev_ms".as("gap_start_ms"),
        $"ts_ms".as("gap_end_ms"),
        expr("(ts_ms - prev_ms) div 1000").as("gap_s"))
  }

  def e19GapAlerts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    gapAlerts(Tables.events(spark, dir))
      .orderBy($"user_id", $"gap_end_ms")
  }

  // ---- streaming variant (custom state) ----

  def gapStream(spark: SparkSession, events: DataFrame,
      delay: String = "10 minutes"): DataFrame = {
    import spark.implicits._
    events.withWatermark("ts", delay)
      .select(col("user_id"), col("ts"), col("event_id"))
      .as[GapEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(updateGaps)
      .toDF()
  }

  /** Fold sealed events (already (ts, id)-sorted) against the last
    * sealed edge, emitting every super-threshold gap. */
  private def fold(uid: Long, last: Option[(Long, Long)],
      sealedEvs: List[(Long, Long)]): (Option[(Long, Long)], List[GapRow]) =
    sealedEvs.foldLeft((last, List.empty[GapRow])) { case ((l, out), e) =>
      val rows = l match {
        case Some((pms, _)) if (e._1 - pms) / 1000L > gapThresholdS =>
          out :+ GapRow(uid, pms, e._1, (e._1 - pms) / 1000L)
        case _ => out
      }
      (Some(e), rows)
    }

  private[streaming] def updateGaps(uid: Long, in: Iterator[GapEvent],
      state: GroupState[GapState]): Iterator[GapRow] = {
    val st = state.getOption.getOrElse(GapState(Nil, None))
    val wm = state.getCurrentWatermarkMs()
    val all = st.pending ++
      (if (state.hasTimedOut) Nil
       else in.map(e => (e.ts.getTime, e.event_id)))
    val (sealedEvs, pending) = all.partition(_._1 <= wm)
    val (last, rows) = fold(uid, st.last, sealedEvs.sortBy(identity))
    state.update(GapState(pending, last))
    if (pending.nonEmpty)
      state.setTimeoutTimestamp(math.max(pending.map(_._1).min + 1, wm + 1))
    rows.iterator
  }

  // ------------------------------------------------------------ registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e19_gap_alerts" -> e19GapAlerts)

  val oracle: Map[String, String] = Map(
    "e19_gap_alerts" ->
      s"""WITH e AS (SELECT user_id, event_id,
              CAST(epoch_ms(ts) AS BIGINT) AS ts_ms
            FROM events),
          s AS (SELECT user_id, ts_ms,
              lag(ts_ms) OVER (PARTITION BY user_id
                ORDER BY ts_ms, event_id) AS prev_ms
            FROM e)
          SELECT user_id, prev_ms AS gap_start_ms, ts_ms AS gap_end_ms,
            (ts_ms - prev_ms) // 1000 AS gap_s
          FROM s
          WHERE prev_ms IS NOT NULL
            AND (ts_ms - prev_ms) // 1000 > $gapThresholdS
          ORDER BY user_id, gap_end_ms""")
}
