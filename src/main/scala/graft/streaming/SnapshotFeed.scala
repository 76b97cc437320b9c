package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.StreamingShim
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.sources.{SnapshotTable, Tables}

/** D278: the snapshot table's CHANGE FEED as a Structured Streaming
  * SOURCE — the read twin of [[graft.sources.SnapshotTable.streamAppend]]
  * (D255). Offsets are COMMITTED VERSION NUMBERS: each micro-batch is
  * `changesBetween(lastVersion, latestVersion]` — the row-level
  * changes the data-changing commits in that range made (compaction
  * commits are `#nodatachange` and emit nothing), each row carrying
  * its `_change_type` (D286: insert / update_preimage /
  * update_postimage / delete) and `_commit_version`. This is what
  * turns the table into a pipeline hub: one stream lands CDC into the
  * table exactly-once, downstream streams consume the committed
  * versions as ordered micro-batches — Delta's change-data-feed idea
  * (CDF files written at merge/delete commit time) re-expressed over
  * the manifest log.
  *
  * Exactly-once, both directions: upstream, a retried appendBatch
  * commits nothing (manifest batch tag), so there is no version to
  * re-emit; downstream, offsets are version numbers checkpointed by
  * the engine, and manifests are immutable, so `getBatch` replays of
  * a committed offset range are deterministic.
  *
  * Scale shape: `getOffset` is one manifest-directory listing;
  * `getBatch` plans a parquet scan from the manifests' explicit added
  * file lists — cost is proportional to the DELTA, never the table.
  * At 100 TB the feed consumer does the same I/O the producing commit
  * did, which is the floor. */
object SnapshotFeed {

  /** The feed schema: the table's recorded schema plus the row-level
    * change type (D286: insert / update_preimage / update_postimage /
    * delete) and the commit version each row arrived in. */
  def feedSchema(spark: SparkSession, path: String): StructType =
    StructType(
      SnapshotTable.readSnapshot(spark, path).schema.fields :+
        StructField(SnapshotTable.changeTypeCol,
          org.apache.spark.sql.types.StringType, nullable = false) :+
        StructField("_commit_version", LongType, nullable = false))

  /** Open the change feed as a streaming DataFrame. The table must
    * already have ≥1 committed version (the schema anchors the
    * stream). `startingVersion` = last version ALREADY consumed
    * (0 = replay from the beginning). `maxVersionsPerTrigger` caps
    * each micro-batch at that many commits (backlog restarts drain
    * bounded instead of as one giant batch); None = unthrottled. */
  def readStream(spark: SparkSession, path: String,
      startingVersion: Long = 0L,
      maxVersionsPerTrigger: Option[Long] = None): DataFrame = {
    val r = spark.readStream
      .format(classOf[SnapshotFeedProvider].getName)
      .option("path", path)
      .option("startingVersion", startingVersion.toString)
    maxVersionsPerTrigger.fold(r)(m =>
      r.option("maxVersionsPerTrigger", m.toString)).load()
  }

  /** Scratch path for e23's feed table (the c20 convention: stable
    * per (application, input dir) so Bench warm+timed runs rebuild
    * deterministically; app-scoped so concurrent sessions never share
    * a table). */
  private def scratchPath(spark: SparkSession, dir: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val app = spark.sparkContext.applicationId
    s"${sys.props("java.io.tmpdir")}/graft_snapshot_e23_${app}_$h"
  }

  /** e23: batch twin of the change feed — commit the orders fixture
    * as THREE append versions (keyed `o_orderkey % 3`), then consume
    * `changesBetween(0, latest)` and census each commit's payload.
    * The oracle recomputes commit membership from the modulus, so the
    * version column, counts, and cents are all hash-exact. The
    * streaming half (same file-delta read through the V1 source, with
    * checkpointed version offsets) is gated stream ≡ batch in
    * StreamingSpec. */
  def e23SnapshotFeed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_totalprice")
    val table = scratchPath(spark, dir)
    val tPath = new org.apache.hadoop.fs.Path(table)
    val fs = tPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(tPath, true)
    SnapshotTable.writeSnapshot(orders.filter($"o_orderkey" % 3 === 0), table)
    SnapshotTable.appendSnapshot(orders.filter($"o_orderkey" % 3 === 1), table)
    SnapshotTable.appendSnapshot(orders.filter($"o_orderkey" % 3 === 2), table)
    SnapshotTable.changesBetween(spark, table, 0L)
      .groupBy($"_commit_version")
      .agg(count(lit(1)).as("n_orders"),
        sum(floor($"o_totalprice" * 100).cast("long")).as("cents"))
      .orderBy($"_commit_version")
  }

  /** e24 (D286/D287's oracle anchor): row-level change-type census —
    * build a scratch snapshot table from orders (v1 = keys ≢3 mod 4),
    * apply a stats-pruned MERGE (v2: keys ≡0 mod 5 at half price —
    * updates for keys already present, inserts for the rest) and a
    * DELETE WHERE (v3: keys in [1000, 3000]), then census the change
    * feed per (commit version, change type): exact row counts and
    * cents. The oracle replays the same modular algebra relationally
    * (join = update pre/post pair, anti-join = insert, post-merge
    * state ∩ range = delete), so every count and cent — including the
    * IEEE half-price postimages — is hash-exact. What this gates: the
    * feed surfaces EXACTLY the changed rows of copy-on-write commits
    * (no rewritten-survivor leakage — those would inflate the v2
    * censuses), with the right images on each side. */
  def e24CdfCensus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_totalprice")
    val table = scratchPath(spark, dir) + "_e24"
    val tPath = new org.apache.hadoop.fs.Path(table)
    val fs = tPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(tPath, true)
    SnapshotTable.writeSnapshot(orders.filter($"o_orderkey" % 4 =!= 3),
      table)
    SnapshotTable.mergePruned(
      orders.filter($"o_orderkey" % 5 === 0)
        .select($"o_orderkey", ($"o_totalprice" * 0.5).as("o_totalprice")),
      table, "o_orderkey")
    SnapshotTable.deleteWhere(spark, table, "o_orderkey",
      BigDecimal(1000), BigDecimal(3000))
    SnapshotTable.changesBetween(spark, table, 0L)
      .groupBy($"_commit_version", $"_change_type")
      .agg(count(lit(1)).as("n_rows"),
        sum(floor($"o_totalprice" * 100).cast("long")).as("cents"))
      .orderBy($"_commit_version", $"_change_type")
  }

  /** e25 (D299/D301's oracle anchor): UPDATE + RESTORE through the
    * change feed — build a partitioned scratch table from orders
    * (layout column `kb = o_orderkey % 8`), UPDATE WHERE `kb = 3`
    * SET `o_totalprice *= 0.25` (exact in IEEE — a power-of-two
    * scale), then RESTORE to v1, and census the feed per
    * (commit version, change type). The update predicate is the
    * partition signature, so the touched file set — and therefore the
    * restore's file-level diff — is EXACTLY bucket 3 whatever Spark's
    * file splits did: v2 emits the bucket's pre/post image pair, v3
    * (the rollback) re-adds the original bucket files (`insert`) and
    * drops the rewritten ones (`delete`), all replayable relationally.
    * What this gates: UPDATE rewrites exactly the matched rows with
    * the SET applied (no survivor leakage into the CDF), and RESTORE's
    * diff algebra feeds downstream consumers the precise rollback. */
  def e25UpdateRestore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_totalprice",
        ($"o_orderkey" % 8).as("kb"))
    val table = scratchPath(spark, dir) + "_e25"
    val tPath = new org.apache.hadoop.fs.Path(table)
    val fs = tPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(tPath, true)
    SnapshotTable.writeSnapshotPartitioned(base, table, "kb")
    SnapshotTable.updateWhere(spark, table,
      Seq(SnapshotTable.SnapshotEquals("kb", "3")),
      Map("o_totalprice" -> ($"o_totalprice" * 0.25)))
    SnapshotTable.restore(spark, table, 1L)
    SnapshotTable.changesBetween(spark, table, 0L)
      .groupBy($"_commit_version", $"_change_type")
      .agg(count(lit(1)).as("n_rows"),
        sum(floor($"o_totalprice" * 100).cast("long")).as("cents"))
      .orderBy($"_commit_version", $"_change_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e23_snapshot_feed" -> e23SnapshotFeed,
    "e24_cdf_census" -> e24CdfCensus,
    "e25_update_restore" -> e25UpdateRestore)

  val oracle: Map[String, String] = Map(
    "e25_update_restore" ->
      """WITH base AS (SELECT o_orderkey AS k, o_totalprice AS p,
               o_orderkey % 8 AS kb FROM orders),
           b3 AS (SELECT k, p FROM base WHERE kb = 3),
           feed AS (
             SELECT CAST(1 AS BIGINT) AS v, 'insert' AS ct, p FROM base
             UNION ALL
             SELECT 2, 'update_preimage', p FROM b3
             UNION ALL
             SELECT 2, 'update_postimage', p * 0.25 FROM b3
             UNION ALL
             SELECT 3, 'delete', p * 0.25 FROM b3
             UNION ALL
             SELECT 3, 'insert', p FROM b3)
           SELECT v AS _commit_version, ct AS _change_type,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(floor(p * 100) AS BIGINT)) AS BIGINT) AS cents
           FROM feed GROUP BY 1, 2 ORDER BY 1, 2""",
    "e24_cdf_census" ->
      """WITH base AS (SELECT o_orderkey AS k, o_totalprice AS p
             FROM orders WHERE o_orderkey % 4 <> 3),
           upd AS (SELECT o_orderkey AS k, o_totalprice * 0.5 AS p
             FROM orders WHERE o_orderkey % 5 = 0),
           s2 AS (SELECT b.k, b.p FROM base b
               WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.k = b.k)
             UNION ALL SELECT k, p FROM upd),
           feed AS (
             SELECT CAST(1 AS BIGINT) AS v, 'insert' AS ct, p FROM base
             UNION ALL
             SELECT 2, 'update_preimage', b.p FROM base b
               JOIN upd u ON u.k = b.k
             UNION ALL
             SELECT 2, 'update_postimage', u.p FROM upd u
               JOIN base b ON b.k = u.k
             UNION ALL
             SELECT 2, 'insert', u.p FROM upd u
               WHERE NOT EXISTS (SELECT 1 FROM base b WHERE b.k = u.k)
             UNION ALL
             SELECT 3, 'delete', p FROM s2 WHERE k BETWEEN 1000 AND 3000)
           SELECT v AS _commit_version, ct AS _change_type,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(floor(p * 100) AS BIGINT)) AS BIGINT) AS cents
           FROM feed GROUP BY 1, 2 ORDER BY 1, 2""",
    "e23_snapshot_feed" ->
      """SELECT (o_orderkey % 3) + 1 AS _commit_version,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
         FROM orders GROUP BY 1 ORDER BY 1""")
}

/** Version-number offset: the json form is the bare number (valid
  * JSON), so checkpoint recovery hands back a parseable string
  * whatever wrapper the engine used. */
private[streaming] case class SnapshotFeedOffset(version: Long)
    extends V1Offset {
  override def json: String = version.toString
}

/** The V1 micro-batch source over one table's manifest log. V1 (not
  * DataSource V2) is the right altitude here: `getBatch` returns a
  * DataFrame, so the batch reader's whole parquet stack (vectorized
  * scan, pushdown, schema reconciliation) is reused instead of
  * re-implemented behind a `PartitionReaderFactory`.
  *
  * `maxVersionsPerTrigger` (round-14 verdict ask #6 — Delta's
  * `maxFilesPerTrigger` / Kafka's `maxOffsetsPerTrigger` idea): cap
  * each micro-batch at that many commits past the last offset this
  * source has seen, so a consumer restarted against a large backlog
  * drains it as BOUNDED batches instead of replaying everything as
  * one. Offsets stay exactly-once: the cap only changes WHERE the
  * engine's checkpointed end offset lands, never what a committed
  * (start, end] range replays. The base the cap counts from is safe
  * on restart because MicroBatchExecution re-issues `getBatch` with
  * the recovered offsets BEFORE the next `getOffset` (the documented
  * V1 restart contract), which refreshes [[lastSeen]]. */
private[streaming] class SnapshotFeedSource(sqlContext: SQLContext,
    path: String, startingVersion: Long,
    maxVersionsPerTrigger: Option[Long]) extends Source {

  private val spark = sqlContext.sparkSession

  maxVersionsPerTrigger.foreach(m => require(m >= 1L,
    s"maxVersionsPerTrigger must be >= 1, got $m"))

  override val schema: StructType = SnapshotFeed.feedSchema(spark, path)

  /** Highest version this source has handed to (or learned from) the
    * engine — the rate-limit base. */
  @volatile private var lastSeen: Long = startingVersion

  /** Latest committed version, capped by the rate limit; None until
    * there is something past the start point. */
  override def getOffset: Option[V1Offset] = {
    val latest = SnapshotTable.latestVersion(spark, path)
    val capped = maxVersionsPerTrigger match {
      case Some(mx) => math.min(latest, math.max(lastSeen, startingVersion) + mx)
      case None => latest
    }
    if (capped <= startingVersion) None
    else {
      lastSeen = math.max(lastSeen, capped)
      Some(SnapshotFeedOffset(capped))
    }
  }

  private def versionOf(o: V1Offset): Long = o.json.trim.toLong

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(startingVersion)
    val to = versionOf(end)
    lastSeen = math.max(lastSeen, math.max(from, to))
    val batch = SnapshotTable.changesBetween(spark, path, from, to)
    StreamingShim.asStreamingBatch(batch)
  }

  override def stop(): Unit = ()
}

/** `spark.readStream.format(<this class>)` provider. Registered by
  * class name (no service-loader file needed); `shortName` also
  * answers to "graft-snapshot-feed". */
class SnapshotFeedProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-snapshot-feed"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-snapshot-feed needs a 'path' option (the snapshot table)"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(
      SnapshotFeed.feedSchema(sqlContext.sparkSession,
        pathOf(parameters))))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new SnapshotFeedSource(sqlContext, pathOf(parameters),
      parameters.get("startingVersion").map(_.toLong).getOrElse(0L),
      parameters.get("maxVersionsPerTrigger").map(_.toLong))
}
