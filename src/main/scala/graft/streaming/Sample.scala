package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.sources.Tables

/** Input row for the window sampler (typed view of `events`). */
case class SampEvent(ts: Timestamp, event_id: Long, event_type: String)

/** One emitted sample row for a sealed window. */
case class SampRow(window_start: Timestamp, rk: Int, event_id: Long,
    event_type: String)

/** D153: streaming deterministic window sampling — per tumbling
  * [[Sample.windowLen]] window, a uniform [[Sample.sampleK]]-event
  * sample selected as the events with the SMALLEST md5-derived hash
  * (the t7/c5 no-RNG gate turned into a sampler: the hash order is a
  * fixed random permutation of event ids, so the k smallest are a
  * uniform sample — reproducible on any engine, any retry, any
  * partitioning). The telemetry-downsampling stage of a streaming
  * pipeline, with an EXACT batch twin instead of reservoir
  * nondeterminism.
  *
  * Stream side: `flatMapGroupsWithState` keyed by window start, state
  * = the current k smallest (hash, id, type) triples — O(k) per
  * window, NO event buffering (an arriving event either displaces the
  * current max or is dropped on the spot); event-time timeout at
  * window end + watermark flushes the ranked sample once (the e14
  * sealing pattern). Batch twin: tumbling-window census + row_number
  * over (hash, event_id) ≤ k — what the oracle checks; StreamingSpec
  * pins stream ≡ batch. */
object Sample {

  /** Tumbling window width. */
  val windowLen = "6 hours"
  private val windowMs = 6L * 3600 * 1000
  /** Sample size per window. */
  val sampleK = 5

  /** The 60-bit md5 sampling hash as a column (engine side). */
  private def hashCol(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** The identical hash in driver Scala (stream-state side). */
  private[streaming] def hashOf(eventId: Long): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(eventId.toString.getBytes("UTF-8"))
        .take(8).map("%02x".format(_)).mkString.substring(0, 15), 16)

  // ---- batch twin (declarative; this is what the oracle checks) ----

  /** Ranked per-window deterministic sample over a batch frame. */
  def sampled(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val w = Window.partitionBy($"window_start")
      .orderBy($"h", $"event_id")
    events.select(window($"ts", windowLen), $"event_id", $"event_type")
      .select($"window.start".as("window_start"), $"event_id", $"event_type")
      .withColumn("h", hashCol($"event_id"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= sampleK)
      .select($"window_start", $"rk", $"event_id", $"event_type")
  }

  def e16StreamSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sampled(Tables.events(spark, dir)).orderBy($"window_start", $"rk")
  }

  // ---- streaming variant (custom state) ----

  def sampleStream(spark: SparkSession, events: DataFrame,
      delay: String = "10 minutes"): DataFrame = {
    import spark.implicits._
    events.withWatermark("ts", delay)
      .select(col("ts"), col("event_id"), col("event_type"))
      .as[SampEvent]
      .groupByKey(e => (e.ts.getTime / windowMs) * windowMs)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(updateSample)
      .toDF()
  }

  /** State update: keep the k hash-smallest events; on the event-time
    * timeout emit the ranked sample once and drop the state. */
  private[streaming] def updateSample(windowStartMs: Long,
      in: Iterator[SampEvent],
      state: GroupState[List[(Long, Long, String)]]): Iterator[SampRow] = {
    if (state.hasTimedOut) {
      val ranked = state.get.sortBy { case (h, id, _) => (h, id) }
        .zipWithIndex.map { case ((_, id, et), i) =>
          SampRow(new Timestamp(windowStartMs), i + 1, id, et)
        }
      state.remove()
      ranked.iterator
    } else {
      var top = state.getOption.getOrElse(Nil)
      in.foreach { e =>
        top = ((hashOf(e.event_id), e.event_id, e.event_type) :: top)
          .sortBy { case (h, id, _) => (h, id) }.take(sampleK)
      }
      state.update(top)
      state.setTimeoutTimestamp(
        math.max(windowStartMs + windowMs, state.getCurrentWatermarkMs() + 1))
      Iterator.empty
    }
  }

  // ------------------------------------------------------------ registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e16_stream_sample" -> e16StreamSample)

  val oracle: Map[String, String] = Map(
    "e16_stream_sample" ->
      s"""WITH e AS (SELECT time_bucket(INTERVAL '$windowLen', ts)
              AS window_start,
            event_id, event_type,
            CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15)
              AS BIGINT) AS h
            FROM events),
          r AS (SELECT window_start, event_id, event_type,
              row_number() OVER (PARTITION BY window_start
                ORDER BY h, event_id) AS rk
            FROM e)
          SELECT window_start, CAST(rk AS INT) AS rk, event_id, event_type
          FROM r WHERE rk <= $sampleK ORDER BY window_start, rk""")
}
