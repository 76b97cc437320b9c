package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Streaming analytics over the `events` table (SURVEY.md §2.B D22):
  * tumbling/sliding window aggregation and gap-based sessionization.
  *
  * Each transform is a pure `DataFrame => DataFrame`, so the SAME code
  * runs in batch (for the DuckDB oracle gate) and under Structured
  * Streaming (`readStream`/`MemoryStream` + watermark — exercised in
  * StreamingSpec). This is the batch-first design SURVEY.md §1.3 calls
  * for: streaming is a deployment mode, not a separate operator set.
  *
  * Scale notes: all three group on (time-bucket, low-cardinality key),
  * so state size is bounded by #windows·#keys, not by row count; the
  * watermark bounds retained state in streaming mode. Partial
  * aggregation happens map-side before the shuffle.
  */
object EventStreams {

  /** Tumbling 1-hour windows per event type: count + value sum. */
  def tumbling(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding 1-hour windows every 30 minutes: each event lands in two
    * windows; built-in `window()` does the fan-out. */
  def sliding(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("n_events"))

  /** Gap-based sessions (30-minute inactivity) per user: built-in
    * `session_window` — its stateful merge is exactly the custom-state
    * path `flatMapGroupsWithState` would hand-roll. */
  def sessions(events: DataFrame): DataFrame =
    events.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("session_window.start").as("session_start"), col("user_id"),
        col("n_events"), col("sum_value"))

  /** Watermarked variant for streaming deployment: drop events more than
    * `delay` late before windowing (D22's late-data-drop semantics). */
  def tumblingStream(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    tumbling(events.withWatermark("ts", delay))

  def sessionsStream(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    sessions(events.withWatermark("ts", delay))

  /** Exactly-once event counts per type after id-dedup (D17 × D22:
    * streaming dedup, the first stage of any event ingestion pipeline).
    *
    * The representative row per `event_id` is the MINIMUM of
    * (ts, value, event_type) — a deterministic choice, unlike
    * `dropDuplicates`, whose survivor is whichever row a task sees
    * first: if duplicate ids ever differed in payload, the downstream
    * sums would be nondeterministic (and un-oracle-able). One
    * partial-aggregated shuffle on `event_id`; the streaming variant
    * ([[dedupCountsStream]]) keeps `dropDuplicates` because arrival
    * order IS its semantics (first event wins, state watermark-bounded). */
  def dedupCounts(events: DataFrame): DataFrame =
    events.groupBy(col("event_id"))
      .agg(min(struct(col("ts"), col("value"), col("event_type"))).as("__r"))
      .select(col("__r.event_type").as("event_type"), col("__r.value").as("value"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_unique_events"),
        round(sum(col("value")), 2).as("sum_value"))

  def dedupCountsStream(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicates("event_id")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_unique_events"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_unique_events"))

  /** Watermark-bounded streaming dedup with LATE duplicates:
    * `dropDuplicates("event_id")` keys its state store on event_id
    * alone, so state grows with every id ever seen — unbounded on an
    * infinite stream. `dropDuplicatesWithinWatermark` instead evicts an
    * id's state once the watermark passes its event time, guaranteeing
    * bounded state while still dropping any duplicate that arrives
    * within the watermark delay (the at-least-once-redelivery window a
    * real ingestion pipeline actually has). Emits the surviving raw
    * events (append mode, no aggregation downstream). */
  def dedupWithinWatermarkStream(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream attribution join: clicks by the same user within the
    * 30 minutes preceding each purchase (inclusive bounds). Column
    * contract: purchases(event_id, ts, user_id), clicks(c_id, c_ts,
    * c_user, c_value).
    *
    * Streaming deployment uses Spark's native stream-stream inner join:
    * the watermark on both sides plus the two-sided time bound lets the
    * state store evict rows once the watermark passes `ts + 30min`, so
    * state is bounded by the window, not the stream. The batch/oracle
    * path ([[e5Attribution]]) routes through the bucketed RangeJoin
    * instead, because in batch an inequality join would plan as a
    * nested loop. */
  def attributionStream(purchases: DataFrame, clicks: DataFrame,
      delay: String = "1 hour"): DataFrame =
    purchases.withWatermark("ts", delay)
      .join(clicks.withWatermark("c_ts", delay),
        expr("user_id = c_user AND c_ts >= ts - INTERVAL 30 MINUTES AND c_ts <= ts"))

  /** LEFT-OUTER stream-stream attribution: every purchase is emitted,
    * matched or not — the orphan-rate shape (conversion without a
    * preceding click). In streaming, Spark holds the null-padded left
    * row back until the watermark passes the end of its join window
    * (no click can ever arrive for it), so "orphan" has exact
    * semantics and state stays watermark-bounded exactly as in the
    * inner case. */
  def attributionOuterStream(purchases: DataFrame, clicks: DataFrame,
      delay: String = "1 hour"): DataFrame =
    purchases.withWatermark("ts", delay)
      .join(clicks.withWatermark("c_ts", delay),
        expr("user_id = c_user AND c_ts >= ts - INTERVAL 30 MINUTES AND c_ts <= ts"),
        "leftOuter")

  /** Static enrichment dimension: user → nation name (customer ⋈
    * nation, dim ⋈ dim — both tiny next to the event stream). */
  def userNation(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer")
      .join(Tables.load(spark, dir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey").as("user_id"), col("n_name"))

  /** Stream-static enrichment: events joined to a broadcast dimension,
    * then windowed per nation. The static side is planned once and
    * broadcast to every micro-batch — no shuffle of the stream, no
    * state for the join itself (only the downstream window aggregate
    * holds state). This is THE ingestion-enrichment shape: a firehose
    * joined to slowly-changing reference data. Unknown users survive
    * as 'unknown' (left join), so a dim lag can never drop events. */
  def enrichedCounts(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left")
      .withColumn("nation", coalesce(col("n_name"), lit("unknown")))
      .groupBy(window(col("ts"), "1 hour"), col("nation"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("nation"),
        col("n_events"), col("sum_value"))

  def enrichedCountsStream(events: DataFrame, dim: DataFrame,
      delay: String = "10 minutes"): DataFrame =
    enrichedCounts(events.withWatermark("ts", delay), dim)

  // ---- batch query surface for the oracle gate ----

  /** D22-extension: batch twin of [[enrichedCountsStream]]. */
  def e8StreamStaticEnrich(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    enrichedCounts(Tables.events(spark, dir), userNation(spark, dir))
      .orderBy($"window_start", $"nation")
  }

  /** Static weekday×hour traffic profile (the "trained" baseline an
    * online detector loads as reference data): hourly census → ≤ 168
    * seasonal slots. Shares q54's integer-only shape. */
  def seasonalBaseline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(window($"ts", "1 hour"))
      .agg(count(lit(1)).as("cnt"))
      .select($"window.start".as("hr_ts"), $"cnt")
      .groupBy((dayofweek($"hr_ts") - 1).as("dow"), hour($"hr_ts").as("hr"))
      .agg(sum($"cnt").as("total"), count(lit(1)).as("n_hours"))
  }

  /** Core of e12: hourly count per tumbling window, stream-static
    * joined to the broadcast seasonal profile, severity-classified by
    * INTEGER predicates (warn ≥ 1.5×, crit ≥ 1.7× the slot mean — the
    * q54 no-float-in-the-predicate discipline). On a stream the window
    * aggregate is the only stateful operator (watermark-sealed); the
    * profile join adds no state (e8's stream-static argument). */
  def anomalyAlerts(events: DataFrame, profile: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events.groupBy(window($"ts", "1 hour"))
      .agg(count(lit(1)).as("cnt"))
      .select($"window.start".as("hr_ts"), $"cnt")
      .withColumn("dow", dayofweek($"hr_ts") - 1)
      .withColumn("hr", hour($"hr_ts"))
      .join(broadcast(profile), Seq("dow", "hr"))
      .withColumn("level",
        when(lit(10L) * $"cnt" * $"n_hours" >= lit(17L) * $"total", "crit")
          .when(lit(2L) * $"cnt" * $"n_hours" >= lit(3L) * $"total", "warn"))
      .filter($"level".isNotNull)
      .select($"hr_ts", $"cnt", $"level")
  }

  def anomalyAlertsStream(events: DataFrame, profile: DataFrame,
      delay: String = "10 minutes"): DataFrame =
    anomalyAlerts(events.withWatermark("ts", delay), profile)

  /** D93: batch twin of [[anomalyAlertsStream]] — online seasonal
    * anomaly alerting (q54's detector made a stream: the profile is
    * the offline-trained baseline, the stream self-reports hours that
    * run hot for their weekday×hour slot, tiered warn/crit). */
  def e12SeasonalAlerts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    anomalyAlerts(Tables.events(spark, dir), seasonalBaseline(spark, dir))
      .orderBy($"hr_ts")
  }

  def e1Tumbling(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    tumbling(Tables.events(spark, dir)).orderBy($"window_start", $"event_type")
  }

  def e2Sliding(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sliding(Tables.events(spark, dir)).orderBy($"window_start")
  }

  def e3Sessions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sessions(Tables.events(spark, dir))
      .orderBy($"user_id", $"session_start")
      .select($"user_id", $"session_start", $"n_events", $"sum_value")
  }

  def e4DedupCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    dedupCounts(Tables.events(spark, dir)).orderBy($"event_type")
  }

  /** D22×D24: batch twin of [[attributionStream]] — per-user count and
    * value of clicks attributed to purchases. Uses the bucketed range
    * join (equi-join on (user, time-bucket), exact post-filter), so the
    * batch plan never degenerates to a nested loop. */
  def e5Attribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"ts", $"user_id")
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("c_id"), $"ts".as("c_ts"),
        $"user_id".as("c_user"), $"value".as("c_value"))
    graft.operators.RangeJoin.rangeJoin(purchases, "user_id", "ts",
        clicks, "c_user", "c_ts", Seq("c_id", "c_value"), 30L * 60)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_attributed"),
        round(sum($"c_value"), 2).as("sum_click_value"))
      .orderBy($"user_id")
  }

  /** Batch twin of [[attributionOuterStream]]: per user, purchase
    * count, how many purchases attracted ≥1 click, total attributed
    * clicks and value — orphan purchases included (the metric e5's
    * inner join cannot produce). The match set reuses the bucketed
    * range join; the per-purchase rollup and the purchases⋈matches
    * left join are both keyed on purchase identity (high cardinality,
    * co-partitioned — the match frame is purchase-sized, NOT
    * broadcastable at scale). */
  def e7AttributionOuter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"ts", $"user_id")
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("c_id"), $"ts".as("c_ts"),
        $"user_id".as("c_user"), $"value".as("c_value"))
    val perPurchase = graft.operators.RangeJoin.rangeJoin(
        purchases, "user_id", "ts",
        clicks, "c_user", "c_ts", Seq("c_id", "c_value"), 30L * 60)
      .groupBy($"event_id")
      .agg(count(lit(1)).as("n_clicks"), sum($"c_value").as("cv"))
    purchases.join(perPurchase, Seq("event_id"), "left")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_purchases"),
        count(when($"n_clicks" > 0, 1)).as("n_matched"),
        coalesce(sum($"n_clicks"), lit(0L)).as("n_clicks"),
        round(coalesce(sum($"cv"), lit(0.0)), 2).as("sum_click_value"))
      .orderBy($"user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e12_seasonal_alerts" -> e12SeasonalAlerts,
    "e8_stream_static_enrich" -> e8StreamStaticEnrich,
    "e7_attribution_outer" -> e7AttributionOuter,
    "e1_tumbling" -> e1Tumbling,
    "e2_sliding" -> e2Sliding,
    "e3_sessions" -> e3Sessions,
    "e4_dedup_counts" -> e4DedupCounts,
    "e5_attribution" -> e5Attribution)

  val oracle: Map[String, String] = Map(
    "e12_seasonal_alerts" ->
      """WITH h AS (SELECT date_trunc('hour', ts) AS hr_ts,
              CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1),
          sl AS (SELECT hr_ts, cnt, CAST(dayofweek(hr_ts) AS INT) AS dow,
              CAST(hour(hr_ts) AS INT) AS hr FROM h),
          se AS (SELECT dow, hr, CAST(sum(cnt) AS BIGINT) AS total,
              CAST(count(*) AS BIGINT) AS n_hours
            FROM sl GROUP BY dow, hr)
          SELECT sl.hr_ts, sl.cnt,
            CASE WHEN 10 * sl.cnt * se.n_hours >= 17 * se.total THEN 'crit'
                 WHEN 2 * sl.cnt * se.n_hours >= 3 * se.total THEN 'warn'
            END AS level
          FROM sl JOIN se USING (dow, hr)
          WHERE 2 * sl.cnt * se.n_hours >= 3 * se.total
          ORDER BY sl.hr_ts""",
    "e8_stream_static_enrich" ->
      """SELECT date_trunc('hour', e.ts) AS window_start,
           coalesce(n.n_name, 'unknown') AS nation,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(e.value), 2) AS sum_value
         FROM events e
         LEFT JOIN customer c ON e.user_id = c.c_custkey
         LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "e7_attribution_outer" ->
      """WITH p AS (SELECT event_id, ts, user_id FROM events
                    WHERE event_type = 'purchase'),
         c AS (SELECT ts AS c_ts, user_id AS c_user, value AS c_value
               FROM events WHERE event_type = 'click'),
         m AS (SELECT p.event_id, p.user_id,
                 count(c.c_user) AS n_clicks, sum(c.c_value) AS cv
               FROM p LEFT JOIN c
                 ON p.user_id = c.c_user
                AND c.c_ts >= p.ts - INTERVAL 30 MINUTES AND c.c_ts <= p.ts
               GROUP BY p.event_id, p.user_id)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(count(*) FILTER (n_clicks > 0) AS BIGINT) AS n_matched,
           CAST(sum(n_clicks) AS BIGINT) AS n_clicks,
           round(coalesce(sum(cv), 0), 2) AS sum_click_value
         FROM m GROUP BY user_id ORDER BY user_id""",
    "e1_tumbling" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    // sliding(1h, 30m): an event at t belongs to windows starting at
    // floor30(t) and floor30(t) − 30min
    "e2_sliding" ->
      """WITH starts AS (
           SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start FROM events
           UNION ALL
           SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' FROM events)
         SELECT window_start, CAST(count(*) AS BIGINT) AS n_events
         FROM starts GROUP BY 1 ORDER BY 1""",
    // representative = min(ts, value, event_type) per id, mirroring the
    // deterministic struct-min in [[dedupCounts]]
    "e4_dedup_counts" ->
      """WITH d AS (SELECT DISTINCT ON (event_id) event_id, event_type, value
                    FROM events ORDER BY event_id, ts, value, event_type)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_unique_events,
           round(sum(value), 2) AS sum_value
         FROM d GROUP BY event_type ORDER BY event_type""",
    "e5_attribution" ->
      """SELECT p.user_id, CAST(count(*) AS BIGINT) AS n_attributed,
           round(sum(c.value), 2) AS sum_click_value
         FROM events p JOIN events c
           ON p.user_id = c.user_id
          AND p.event_type = 'purchase' AND c.event_type = 'click'
          AND c.ts >= p.ts - INTERVAL 30 MINUTES AND c.ts <= p.ts
         GROUP BY p.user_id ORDER BY p.user_id""",
    // gaps-and-islands replay of session_window semantics
    "e3_sessions" ->
      """WITH o AS (
           SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s AS (
           SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM o)
         SELECT user_id, min(ts) AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
         FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""")
}
