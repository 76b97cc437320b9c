package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.sources.Tables

/** Input row for the trending monitor (typed view of `events`). */
case class TrendEvent(ts: Timestamp, event_type: String)

/** One emitted leaderboard row for a sealed window. */
case class TrendRow(window_start: Timestamp, rk: Int, event_type: String,
    n: Long)

/** D127: streaming trending top-k — per tumbling [[Trending.windowLen]]
  * window, the [[Trending.topK]] busiest event types, emitted as one
  * ranked leaderboard per window once the watermark seals it (the
  * "what is trending right now" product surface).
  *
  * A ranked window top-k cannot be expressed as a watermark-appended
  * windowed aggregate alone (the rank needs the window CLOSED), so the
  * stream side is `flatMapGroupsWithState` keyed by window start — the
  * funnel/budget sealing pattern applied to a leaderboard: state is the
  * per-type count map (bounded by |event types|, NOT by event volume —
  * map-side increments, no event buffering), an event-time timeout at
  * window end + watermark flushes the ranked top-k exactly once, in
  * event-time order, and removes the state.
  *
  * Batch twin (what the oracle checks): tumbling window census + a
  * row_number window over each window's ≤|types| rows, rank ties pinned
  * by (n DESC, event_type). Both sides produce identical rows, guarded
  * stream ≡ batch in StreamingSpec.
  */
object Trending {

  /** Tumbling window width. */
  val windowLen = "6 hours"
  private val windowMs = 6L * 3600 * 1000
  /** Leaderboard depth per window. */
  val topK = 3

  // ---- batch twin (declarative; this is what the oracle checks) ----

  /** Ranked per-window leaderboard over a batch events frame. */
  def trending(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val w = Window.partitionBy($"window_start")
      .orderBy($"n".desc, $"event_type")
    events.groupBy(window($"ts", windowLen), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("window_start"), $"event_type", $"n")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= topK)
      .select($"window_start", $"rk", $"event_type", $"n")
  }

  def e14Trending(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    trending(Tables.events(spark, dir)).orderBy($"window_start", $"rk")
  }

  // ---- streaming variant (custom state) ----

  /** Streaming deployment: one ranked leaderboard per window, emitted
    * when the watermark passes the window end. */
  def trendingStream(spark: SparkSession, events: DataFrame,
      delay: String = "10 minutes"): DataFrame = {
    import spark.implicits._
    events.withWatermark("ts", delay)
      .select(col("ts"), col("event_type"))
      .as[TrendEvent]
      .groupByKey(e => (e.ts.getTime / windowMs) * windowMs)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(updateTrending)
      .toDF()
  }

  /** State update: fold arriving events into the per-type count map;
    * on the event-time timeout (watermark past window end) emit the
    * ranked top-k once and drop the state. */
  private[streaming] def updateTrending(windowStartMs: Long,
      in: Iterator[TrendEvent],
      state: GroupState[Map[String, Long]]): Iterator[TrendRow] = {
    if (state.hasTimedOut) {
      val ranked = state.get.toSeq
        .sortBy { case (et, n) => (-n, et) }.take(topK).zipWithIndex
        .map { case ((et, n), i) =>
          TrendRow(new Timestamp(windowStartMs), i + 1, et, n)
        }
      state.remove()
      ranked.iterator
    } else {
      val counts = in.foldLeft(state.getOption.getOrElse(Map.empty[String, Long])) {
        (m, e) => m.updated(e.event_type, m.getOrElse(e.event_type, 0L) + 1L)
      }
      state.update(counts)
      // seal once the watermark passes the window end
      state.setTimeoutTimestamp(windowStartMs + windowMs)
      Iterator.empty
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e14_trending" -> e14Trending)

  val oracle: Map[String, String] = Map(
    "e14_trending" ->
      s"""WITH w AS (SELECT time_bucket(INTERVAL '$windowLen', ts)
                AS window_start,
              event_type, CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
          r AS (SELECT window_start, event_type, n,
              row_number() OVER (PARTITION BY window_start
                ORDER BY n DESC, event_type) AS rk
            FROM w)
          SELECT window_start, CAST(rk AS INT) AS rk, event_type, n
          FROM r WHERE rk <= $topK
          ORDER BY window_start, rk""")
}
