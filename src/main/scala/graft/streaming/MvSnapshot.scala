package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{SnapshotTable, Tables}

/** D267: streaming incremental materialized-view maintenance INTO the
  * versioned snapshot table — the operational composition of D71
  * (batch incremental MV), D255 (exactly-once batch-tagged commits)
  * and D257 (snapshot MERGE): each micro-batch folds its delta into
  * the per-event-type revenue census and lands the refreshed view as
  * ONE committed snapshot version, so downstream readers get (a) an
  * always-consistent current MV, (b) time travel across refresh
  * generations ("what did the dashboard say after batch 3?"), and
  * (c) exactly-once semantics across foreachBatch retries — the tag
  * rides inside the same atomic manifest publication as the merge.
  *
  * The view is dimension-sized (≤ |event_type| rows), so the
  * read-combine-merge cycle per batch costs one bounded snapshot read
  * plus one partial-aggregated delta scan of the batch — at 100 TB of
  * history the per-batch cost depends only on batch size and view
  * width, never on history (the D71 argument, made durable).
  *
  * Batch twin (what the oracle checks): the view the stream converges
  * to equals ONE partial-aggregated census of the whole events table —
  * exact integer counts and cents (floor(value·100)). */
object MvSnapshot {

  /** The per-type revenue census a batch (or the full table) reduces
    * to: exact integer counts and cents. */
  def mvOf(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events.groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(floor($"value" * 100).cast("long")).as("cents"))
  }

  /** Fold one micro-batch's delta into the MV table, committing the
    * refreshed view as the next snapshot version tagged with
    * `batchId`. A replayed batch (foreachBatch retry) is a no-op.
    * Returns the committed version, or None when skipped. */
  def applyBatch(batch: DataFrame, path: String,
      batchId: Long): Option[Long] = {
    import batch.sparkSession.implicits._
    val spark = batch.sparkSession
    val delta = mvOf(batch)
    // replay guard BEFORE reading the current view: on a retry the
    // view already contains this batch, and folding it again would
    // double-count even though mergeBatch would refuse to commit
    if (SnapshotTable.latestBatchId(spark, path).exists(_ >= batchId))
      return None
    val combined =
      if (SnapshotTable.versions(spark, path).isEmpty) delta
      else {
        val cur = SnapshotTable.readSnapshot(spark, path)
        cur.select($"event_type", $"n_events".as("n0"), $"cents".as("c0"))
          .join(delta.select($"event_type", $"n_events".as("n1"),
            $"cents".as("c1")), Seq("event_type"), "full_outer")
          .select($"event_type",
            (coalesce($"n0", lit(0L)) + coalesce($"n1", lit(0L)))
              .as("n_events"),
            (coalesce($"c0", lit(0L)) + coalesce($"c1", lit(0L)))
              .as("cents"))
      }
    // the refreshed view's keys are a superset of the current view's
    // (full_outer above), so a MERGE's survivor anti-join is provably
    // empty — publish the whole view as one tagged overwrite instead
    SnapshotTable.overwriteBatch(combined, path, batchId)
  }

  /** Signed per-type census of one CHANGE-FEED batch (D286): rows
    * entering the view's input (insert / update_postimage) count +1,
    * rows leaving it (update_preimage / delete) count −1 — the
    * delta-algebra that lets an incremental MV survive a copy-on-write
    * MERGE or DELETE commit upstream (a rewritten-but-unchanged row
    * never appears in the feed; an updated key contributes its
    * preimage negatively and its postimage positively). */
  def mvDeltaOfChanges(feed: DataFrame): DataFrame = {
    import feed.sparkSession.implicits._
    val sgn = when(col(SnapshotTable.changeTypeCol)
        .isin("insert", "update_postimage"), lit(1L)).otherwise(lit(-1L))
    feed.groupBy($"event_type")
      .agg(sum(sgn).as("n_events"),
        sum(sgn * floor($"value" * 100).cast("long")).as("cents"))
  }

  /** Fold one CHANGE-FEED micro-batch (rows carrying `_change_type`)
    * into the MV table — [[applyBatch]]'s D286-aware twin. Event types
    * whose census reaches zero drop out of the view, so the MV
    * converges to the batch twin of the upstream table's CURRENT
    * contents even across merges and deletes. */
  def applyChangeBatch(batch: DataFrame, path: String,
      batchId: Long): Option[Long] = {
    import batch.sparkSession.implicits._
    val spark = batch.sparkSession
    if (SnapshotTable.latestBatchId(spark, path).exists(_ >= batchId))
      return None
    val delta = mvDeltaOfChanges(batch)
    val combined =
      if (SnapshotTable.versions(spark, path).isEmpty) delta
      else {
        val cur = SnapshotTable.readSnapshot(spark, path)
        cur.select($"event_type", $"n_events".as("n0"), $"cents".as("c0"))
          .join(delta.select($"event_type", $"n_events".as("n1"),
            $"cents".as("c1")), Seq("event_type"), "full_outer")
          .select($"event_type",
            (coalesce($"n0", lit(0L)) + coalesce($"n1", lit(0L)))
              .as("n_events"),
            (coalesce($"c0", lit(0L)) + coalesce($"c1", lit(0L)))
              .as("cents"))
      }
    SnapshotTable.overwriteBatch(combined.filter($"n_events" > 0L),
      path, batchId)
  }

  /** Streaming sink: maintain the MV table from an events stream;
    * caller owns the query lifecycle (the D255 contract). */
  def streamMv(events: DataFrame, path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) =>
        applyBatch(batch.toDF(), path, id); ()
      }
      .outputMode("update")
      .start()

  /** Batch twin: the census the stream converges to over the full
    * fixture — one partial-aggregated scan. */
  def e22StreamMv(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mvOf(Tables.events(spark, dir)).orderBy($"event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e22_stream_mv" -> e22StreamMv)

  val oracle: Map[String, String] = Map(
    "e22_stream_mv" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
         FROM events GROUP BY event_type ORDER BY event_type""")
}
