package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.sources.Tables

/** Input row for the CDC compactor (typed view of `events`). */
case class CdcEvent(user_id: Long, ts: Timestamp, event_id: Long,
    event_type: String, value: Double)

/** One buffered not-yet-sealed change. */
case class CdcPend(tsMs: Long, eventId: Long, eventType: String, cents: Long)

/** The open burst's compacted state: the latest change + update count. */
case class CdcCur(lastTsMs: Long, lastEventId: Long, lastType: String,
    lastCents: Long, n: Long)

/** Per-user compactor state: unsealed buffer + open burst. */
case class CdcState(pending: List[CdcPend], cur: Option[CdcCur])

/** One emitted compaction checkpoint (a sealed activity burst). */
case class CdcRow(user_id: Long, last_ts_ms: Long, last_event_type: String,
    last_cents: Long, n_updates: Long)

/** D141: streaming CDC log compaction — treat each user's events as a
  * change stream and emit ONE compacted checkpoint (latest change +
  * update count) per ACTIVITY BURST, where a burst closes after
  * [[Compact.gapMs]] of event-time inactivity. This is Kafka
  * log-compaction / materialized-upsert-view maintenance done with
  * bounded state: q30 is the batch MERGE, e11 tags activities with
  * versioned state — e15 maintains the compacted head itself.
  *
  * The stream is `flatMapGroupsWithState` keyed by user with the
  * e9/e11 watermark-sealed buffer: changes fold in exact (ts,
  * event_id) order only once sealed, so out-of-order arrivals
  * re-interleave before compaction; because the fold is in order, the
  * burst's latest change is simply the last folded one (no argmax
  * structure needed). An event-time timeout at lastTs + gap flushes
  * the final burst and DELETES the state — state per user is one
  * CdcCur + the unsealed buffer, bounded by the watermark horizon,
  * never by history.
  *
  * Batch twin (what the oracle checks): per-user gap-sessionization
  * via the lag/running-sum islands trick — two windows PARTITIONED BY
  * user (one hash exchange), then the burst's last row by (ts,
  * event_id) and its row count. Timestamps are emitted as epoch
  * MILLIS (BIGINT) so the cross-engine compare never touches
  * timestamp precision/zone. */
object Compact {

  /** Event-time inactivity that closes a burst. */
  val gapMs: Long = 6L * 3600 * 1000

  // ---- batch twin (declarative; this is what the oracle checks) ----

  /** Compacted checkpoints over a batch events frame. */
  def compacted(ev: DataFrame): DataFrame = {
    import ev.sparkSession.implicits._
    val base = ev.select($"user_id", $"ts", $"event_id", $"event_type",
      floor($"value" * 100).cast("long").as("cents"),
      unix_millis($"ts").as("ts_ms"))
    val wSeq = Window.partitionBy($"user_id").orderBy($"ts_ms", $"event_id")
    val sess = base
      .withColumn("prev_ms", lag($"ts_ms", 1).over(wSeq))
      .withColumn("brk",
        when($"prev_ms".isNull || $"ts_ms" - $"prev_ms" > gapMs, 1L)
          .otherwise(0L))
      .withColumn("sid", sum($"brk").over(wSeq))
    val wBurst = Window.partitionBy($"user_id", $"sid")
    sess
      .withColumn("n_updates", count(lit(1)).over(wBurst))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"user_id", $"sid")
          .orderBy($"ts_ms".desc, $"event_id".desc)))
      .filter($"rn" === 1)
      .select($"user_id", $"ts_ms".as("last_ts_ms"),
        $"event_type".as("last_event_type"), $"cents".as("last_cents"),
        $"n_updates")
  }

  def e15CdcCompact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    compacted(Tables.events(spark, dir))
      .orderBy($"user_id", $"last_ts_ms")
  }

  // ---- streaming variant (custom state) ----

  /** Streaming deployment: one checkpoint per sealed burst, emitted
    * when the watermark passes the burst's last change + gap. */
  def compactStream(spark: SparkSession, events: DataFrame,
      delay: String = "10 minutes"): DataFrame = {
    import spark.implicits._
    events.withWatermark("ts", delay)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
      .as[CdcEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(updateCompact)
      .toDF()
  }

  private def toPend(e: CdcEvent): CdcPend =
    CdcPend(e.ts.getTime, e.event_id, e.event_type,
      math.floor(e.value * 100).toLong)

  /** Fold sealed changes (already (ts, event_id)-sorted) into the open
    * burst, emitting a checkpoint whenever the gap closes one. */
  private def fold(uid: Long, cur: Option[CdcCur], done: List[CdcPend])
      : (Option[CdcCur], List[CdcRow]) =
    done.foldLeft((cur, List.empty[CdcRow])) { case ((c, out), p) =>
      c match {
        case Some(b) if p.tsMs - b.lastTsMs > gapMs =>
          (Some(CdcCur(p.tsMs, p.eventId, p.eventType, p.cents, 1L)),
            out :+ CdcRow(uid, b.lastTsMs, b.lastType, b.lastCents, b.n))
        case Some(b) =>
          (Some(CdcCur(p.tsMs, p.eventId, p.eventType, p.cents, b.n + 1L)), out)
        case None =>
          (Some(CdcCur(p.tsMs, p.eventId, p.eventType, p.cents, 1L)), out)
      }
    }

  private[streaming] def updateCompact(uid: Long, in: Iterator[CdcEvent],
      state: GroupState[CdcState]): Iterator[CdcRow] = {
    val st = state.getOption.getOrElse(CdcState(Nil, None))
    if (state.hasTimedOut) {
      // watermark ≥ lastTs + gap: everything pending is sealed; fold
      // it, then flush the final burst and drop the state
      val (cur, rows) = fold(uid,
        st.cur, st.pending.sortBy(p => (p.tsMs, p.eventId)))
      state.remove()
      (rows ++ cur.map(b =>
        CdcRow(uid, b.lastTsMs, b.lastType, b.lastCents, b.n))).iterator
    } else {
      val wm = state.getCurrentWatermarkMs()
      val all = st.pending ++ in.map(toPend)
      val (sealedEvs, pending) = all.partition(_.tsMs <= wm)
      val (cur, rows) = fold(uid,
        st.cur, sealedEvs.sortBy(p => (p.tsMs, p.eventId)))
      state.update(CdcState(pending, cur))
      val lastTs = (pending.map(_.tsMs) ++ cur.map(_.lastTsMs)).max
      state.setTimeoutTimestamp(math.max(lastTs + gapMs, wm + 1))
      rows.iterator
    }
  }

  // ------------------------------------------------------------ registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e15_cdc_compact" -> e15CdcCompact)

  val oracle: Map[String, String] = Map(
    "e15_cdc_compact" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type,
              CAST(floor(value * 100) AS BIGINT) AS cents,
              CAST(epoch_ms(ts) AS BIGINT) AS ts_ms
            FROM events),
          s AS (SELECT *,
              lag(ts_ms) OVER (PARTITION BY user_id
                ORDER BY ts_ms, event_id) AS prev_ms
            FROM e),
          b AS (SELECT *, CASE WHEN prev_ms IS NULL
                OR ts_ms - prev_ms > $gapMs THEN 1 ELSE 0 END AS brk
            FROM s),
          sid AS (SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id
                ORDER BY ts_ms, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS sid
            FROM b),
          f AS (SELECT *,
              CAST(count(*) OVER (PARTITION BY user_id, sid) AS BIGINT)
                AS n_updates,
              row_number() OVER (PARTITION BY user_id, sid
                ORDER BY ts_ms DESC, event_id DESC) AS rn
            FROM sid)
          SELECT user_id, ts_ms AS last_ts_ms,
            event_type AS last_event_type, cents AS last_cents, n_updates
          FROM f WHERE rn = 1 ORDER BY user_id, last_ts_ms""")
}
