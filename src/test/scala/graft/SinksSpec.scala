package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Sinks, Tables}

/** Sink round-trips: partitioned writes must prune on read, and the
  * CSV/JSON readers must reproduce the frame under an explicit schema. */
class SinksSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("footer-based commit stats are bit-identical to the scan path") {
    import spark.implicits._
    // adversarial stat shapes: negative longs, doubles that render in
    // scientific notation, float extremes, dates, equal-valued strings,
    // >64-char ASCII strings (strStatUsable fence), non-ASCII
    // endpoints (must be DROPPED by both paths), and an all-null column
    val longAscii = "z" * 80
    val rows = Seq(
      (-5L, 3, 1.0e7, 1.5f, java.sql.Date.valueOf("1996-01-15"),
        "alpha", longAscii, "café", Option(2.0)),
      (42L, -7, -0.25, -3.5f, java.sql.Date.valueOf("2001-12-31"),
        "omega", longAscii, "zürich", Option.empty[Double]),
      (0L, 0, 123456.789, 0.0f, java.sql.Date.valueOf("1996-01-15"),
        "mid", longAscii, "plain", Option.empty[Double]))
    val df = rows.toDF("l", "i", "d", "f", "dt", "s", "longs", "uni", "n")
      .withColumn("alln", lit(null).cast("double"))
    val out = tmp("graft_footer_stats")
    val landed = graft.sources.SnapshotTable
      .landDataFiles(df, out, "data/c-statgate")
    val files = landed.map(_._1)
    val statCols = df.schema.fields.toSeq.map(_.name)
    val (fStats, fCounts) = graft.sources.SnapshotTable
      .collectStatsFooter(spark, df.schema, out, files, statCols)
    val (sStats, sCounts) = graft.sources.SnapshotTable
      .collectStatsScan(spark, df.schema, out, "data/c-statgate", files,
        statCols)
    assert(fCounts == sCounts, s"row counts differ: $fCounts vs $sCounts")
    assert(fStats.keySet == sStats.keySet)
    fStats.keySet.foreach { file =>
      assert(fStats(file) == sStats(file),
        s"stats differ for $file:\nfooter=${fStats(file)}\nscan=${sStats(file)}")
    }
    // and the gate is not vacuous: numeric + date + usable-string stats
    // present in every file; the all-null column records none anywhere;
    // at least one file's non-ASCII endpoint was dropped by BOTH paths
    fStats.values.foreach { m =>
      Seq("l", "i", "d", "f", "dt", "s", "longs").foreach(c =>
        assert(m.contains(c), s"no footer stats for $c in $m"))
      assert(!m.contains("alln"), "all-null column must record no stats")
    }
    // non-ASCII min != max endpoints must be dropped by BOTH paths:
    // land a single file holding two different non-ASCII strings
    val df2 = Seq(("café", 1L), ("zürich", 2L)).toDF("uni", "l").coalesce(1)
    val landed2 = graft.sources.SnapshotTable
      .landDataFiles(df2, out, "data/c-statgate2")
    val files2 = landed2.map(_._1)
    val (fs2, _) = graft.sources.SnapshotTable
      .collectStatsFooter(spark, df2.schema, out, files2, Seq("uni", "l"))
    val (ss2, _) = graft.sources.SnapshotTable
      .collectStatsScan(spark, df2.schema, out, "data/c-statgate2",
        files2, Seq("uni", "l"))
    assert(fs2 == ss2, s"footer=$fs2 scan=$ss2")
    assert(fs2.values.forall(!_.contains("uni")),
      "non-ASCII min != max endpoints must be dropped")
    assert(fs2.values.forall(_.contains("l")))
  }

  test("partitioned parquet write round-trips and prunes partitions on read") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text", $"lang", $"source")
    val out = tmp("graft_part")
    Sinks.writePartitioned(docs, out, Seq("lang"), sortCols = Seq("doc_id"))
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    // same rows, partition column round-tripped as a directory key
    val a = docs.orderBy($"doc_id").collect().map(_.getLong(0)).toSeq
    val b = back.orderBy($"doc_id").collect().map(r =>
      r.getLong(r.fieldIndex("doc_id"))).toSeq
    assert(a == b)
    // lang = 'en' must reach the scan as a PARTITION filter (directory
    // pruning — the 100 TB reason to partition at all)
    val q = back.filter($"lang" === "en")
    q.collect()
    val scans = q.queryExecution.executedPlan.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
        case s: FileSourceScanExec => s }
      case s: FileSourceScanExec => Seq(s)
    }.flatten
    assert(scans.nonEmpty)
    assert(scans.exists(_.partitionFilters.exists(_.references.exists(
      _.name == "lang"))), "lang filter did not prune partitions")
  }

  test("dim filter dynamically prunes partitions of a partitioned fact (DPP)") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text", $"lang", $"source")
    val out = tmp("graft_dpp")
    Sinks.writePartitioned(docs, out, Seq("lang"), sortCols = Seq("doc_id"))
    val fact = spark.read.parquet(out)
    // the partition-key predicate lives only on the dim side: without
    // dynamic partition pruning the fact scan reads every lang directory.
    // The dim must be a real scan — a local relation would constant-fold
    // the filter away and DPP would see no selective predicate.
    val dimDir = tmp("graft_dpp_dim")
    Seq(("en", 1), ("de", 0), ("fr", 0)).toDF("lang", "keep")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter($"keep" === 1)
    val q = fact.join(dim, "lang").groupBy($"lang").count()
    q.collect()
    val p = q.queryExecution.executedPlan.toString.toLowerCase
    assert(p.contains("dynamicpruning"),
      "fact scan has no dynamic partition pruning filter from the dim join")
  }

  test("registerAll exposes every fixture table to spark.sql with typed events.ts") {
    import spark.implicits._
    Tables.registerAll(spark, sf)
    val n = spark.sql(
      """SELECT count(*) AS n FROM lineitem l JOIN orders o
         ON l.l_orderkey = o.o_orderkey""").as[Long].head()
    assert(n > 0)
    // events.ts must be a real timestamp (NANOS→micros conversion), so
    // date_trunc works from SQL exactly like the typed loader path
    val ts = spark.sql("SELECT date_trunc('hour', ts) AS h FROM events LIMIT 1")
    assert(ts.schema("h").dataType.typeName == "timestamp")
  }

  test("explicit-schema CSV and JSON readers reproduce the frame") {
    import spark.implicits._
    val src = Seq((1L, "alpha", 1.5), (2L, "beta", -0.25), (3L, "with,comma", 0.0))
      .toDF("id", "name", "score")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val csvDir = tmp("graft_csv")
    src.write.mode("overwrite").option("header", "true").csv(csvDir)
    val csvBack = Sinks.readCsv(spark, csvDir, schema)
      .orderBy($"id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(csvBack.toSeq == Seq((1L, "alpha", 1.5), (2L, "beta", -0.25),
      (3L, "with,comma", 0.0)))
    val jsonDir = tmp("graft_json")
    src.write.mode("overwrite").json(jsonDir)
    val jsonBack = Sinks.readJson(spark, jsonDir, schema)
      .orderBy($"id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(jsonBack.toSeq == csvBack.toSeq)
  }

  test("ORC round-trip preserves the frame and pushes filters to the scan") {
    import spark.implicits._
    val src = graft.sources.Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val dir = tmp("graft_orc")
    Sinks.writeOrc(src, dir)
    val back = Sinks.readOrc(spark, dir)
    assert(back.count() == src.count())
    val a = src.orderBy($"o_orderkey").collect().map(_.toString).toSeq
    val b = back.orderBy($"o_orderkey").collect().map(_.toString).toSeq
    assert(a == b)
    // the comparison filter reaches the ORC scan (same pushdown
    // property the parquet paths are guarded for)
    val plan = back.filter($"o_custkey" < 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_custkey"),
      s"no pushdown in:\n${plan.take(1500)}")
  }

  test("Avro round-trip preserves the frame (scalars, timestamp, array) " +
      "and prunes columns inside the V2 scan") {
    import spark.implicits._
    import graft.sources.{Avro, AvroSource}
    val src = graft.sources.Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice",
        $"o_orderstatus", $"o_orderdate")
    val dir = tmp("graft_avro")
    Avro.write(src, dir)
    // job-completion marker landed
    assert(new java.io.File(dir, "_SUCCESS").exists())
    val back = spark.read.format(classOf[AvroSource].getName)
      .load(dir)
    assert(back.schema == src.schema)
    val a = src.orderBy($"o_orderkey").collect().map(_.toString).toSeq
    val b = back.orderBy($"o_orderkey").collect().map(_.toString).toSeq
    assert(a == b && a.nonEmpty)
    // array<float> column round-trips too
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
    val edir = tmp("graft_avro_emb")
    Avro.write(emb, edir)
    val eback = spark.read.format(classOf[AvroSource].getName).load(edir)
    val ea = emb.orderBy($"vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
    val eb = eback.orderBy($"vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
    assert(ea == eb)
    // column pruning reaches the V2 scan: a 2-column projection reads
    // a 2-column schema (the plan guard the parquet/ORC paths have)
    val pruned = back.select($"o_orderkey", $"o_totalprice")
    val scans = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        s.scan.readSchema()
    }
    assert(scans.nonEmpty)
    assert(scans.head.fieldNames.toSeq == Seq("o_orderkey", "o_totalprice"),
      s"scan read ${scans.head.fieldNames.mkString(",")}")
  }

  test("Avro source rejects an uncommitted directory unless told not to") {
    import spark.implicits._
    import graft.sources.{Avro, AvroSource}
    val src = graft.sources.Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_totalprice").limit(10)
    val dir = tmp("graft_avro_uncommitted")
    Avro.write(src, dir)
    // simulate a producer that died before committing
    assert(new java.io.File(dir, "_SUCCESS").delete())
    val ex = intercept[IllegalStateException] {
      spark.read.format(classOf[AvroSource].getName).load(dir).collect()
    }
    assert(ex.getMessage.contains("_SUCCESS"))
    // the documented escape hatch for externally-produced directories
    val n = spark.read.format(classOf[AvroSource].getName)
      .option("ignoreMissingSuccess", true).load(dir).count()
    assert(n == 10L)
  }

  test("Avro sink writes non-nullable columns (no illegal null default) " +
      "and an empty committed frame reads back via the schema sidecar") {
    import spark.implicits._
    import graft.sources.{Avro, AvroSource}
    // aggregate counts / spark.range produce NON-NULLABLE columns;
    // Avro 1.12 rejects a null default on a non-union field, so the
    // schema build must only default nullable fields
    val src = graft.sources.Tables.orders(spark, sf)
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
    assert(src.schema("n").nullable == false)
    val dir = tmp("graft_avro_nonnull")
    Avro.write(src, dir)
    val back = spark.read.format(classOf[AvroSource].getName).load(dir)
    val a = src.orderBy($"o_orderstatus").collect().map(_.toString).toSeq
    val b = back.orderBy($"o_orderstatus").collect().map(_.toString).toSeq
    assert(a == b && a.nonEmpty)
    // zero-row frame: committed write leaves part files with no rows
    // (or none at all for zero partitions) — the _schema.avsc sidecar
    // makes the round-trip degrade to an empty frame, not a throw
    val empty = src.filter(lit(false)).repartition(1).filter(lit(false))
    val edir = tmp("graft_avro_empty")
    Avro.write(empty.limit(0), edir)
    assert(new java.io.File(edir, "_schema.avsc").exists())
    // delete any zero-row part files to simulate a zero-partition job
    new java.io.File(edir).listFiles()
      .filter(_.getName.endsWith(".avro")).foreach(f => assert(f.delete()))
    val eback = spark.read.format(classOf[AvroSource].getName).load(edir)
    assert(eback.schema == src.schema ||
      eback.schema.fieldNames.toSeq == src.schema.fieldNames.toSeq)
    assert(eback.count() == 0L)
  }

  test("streaming parquet sink lands appended batches exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[Ev]
    val out = tmp("graft_stream_out")
    val ck = tmp("graft_stream_ck")
    val q = Sinks.streamToParquet(mem.toDF(), out, ck)
    try {
      mem.addData(Ev(1, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), 1, "view", 1.0))
      q.processAllAvailable()
      mem.addData(Ev(2, java.sql.Timestamp.valueOf("2026-01-01 00:01:00"), 1, "click", 2.0))
      q.processAllAvailable()
      val got = spark.read.parquet(out).select($"event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == Seq(1L, 2L))
    } finally q.stop()
  }

  test("snapshot table: versioned commits round-trip with time travel") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val t = tmp("graft_snap") + "/tbl"
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val v2 = Seq((4L, "d"), (5L, "e")).toDF("id", "v")
    val v3 = Seq((9L, "z")).toDF("id", "v")
    assert(SnapshotTable.writeSnapshot(v1, t) == 1L)
    assert(SnapshotTable.appendSnapshot(v2, t) == 2L)       // append
    assert(SnapshotTable.writeSnapshot(v3, t) == 3L)        // overwrite
    assert(SnapshotTable.versions(spark, t) == Seq(1L, 2L, 3L))
    def ids(v: Long) = SnapshotTable.readSnapshot(spark, t, v)
      .select($"id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(1) == Seq(1L, 2L, 3L))
    assert(ids(2) == Seq(1L, 2L, 3L, 4L, 5L))               // v1 + appended
    assert(ids(3) == Seq(9L))                               // overwritten
    // default read = latest
    assert(SnapshotTable.readSnapshot(spark, t).count() == 1L)
    // append schema mismatch fails loudly, commits nothing visible
    val bad = Seq((1L, 2.0)).toDF("id", "x")
    intercept[IllegalArgumentException] {
      SnapshotTable.appendSnapshot(bad, t)
    }
    assert(SnapshotTable.latestVersion(spark, t) == 3L)
    // a predicate on the snapshot read still reaches the parquet scan
    val q = SnapshotTable.readSnapshot(spark, t, 2).filter($"id" > 3L)
    assert(q.count() == 2L)
    val scans = q.queryExecution.executedPlan.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
        case s: FileSourceScanExec => s }
      case s: FileSourceScanExec => Seq(s)
    }.flatten
    assert(scans.exists(_.metadata.getOrElse("PushedFilters", "")
      .contains("GreaterThan")), "filter not pushed to snapshot scan")
  }

  test("snapshot table: empty-frame version commits and reads back empty") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val t = tmp("graft_snap_empty") + "/tbl"
    val empty = Seq.empty[(Long, String)].toDF("id", "v")
    assert(SnapshotTable.writeSnapshot(empty, t) == 1L)
    val back = SnapshotTable.readSnapshot(spark, t, 1)
    assert(back.schema.fieldNames.toSeq == Seq("id", "v"))
    assert(back.count() == 0L)
  }

  test("snapshot table: racing writers both commit, last version wins") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val t = tmp("graft_snap_race") + "/tbl"
    SnapshotTable.writeSnapshot(Seq((0L, "base")).toDF("id", "v"), t)
    // two overwriting writers released simultaneously: the create-if-
    // absent manifest mutex must serialize them into versions 2 and 3
    val gate = new java.util.concurrent.CountDownLatch(1)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq("w1", "w2").map { w =>
      val df = Seq((1L, w)).toDF("id", "v")
      new Thread(() => {
        try { gate.await(); got.add(SnapshotTable.writeSnapshot(df, t)) }
        catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join())
    assert(errs.isEmpty, s"writer failed: ${errs.peek()}")
    val vs = got.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
    assert(vs.toSeq == Seq(2L, 3L), s"expected versions 2,3 got ${vs.toSeq}")
    // every version remains readable and internally consistent
    assert(SnapshotTable.readSnapshot(spark, t, 1).count() == 1L)
    val w2 = SnapshotTable.readSnapshot(spark, t, 2).select($"v").head.getString(0)
    val w3 = SnapshotTable.readSnapshot(spark, t, 3).select($"v").head.getString(0)
    assert(Set(w2, w3) == Set("w1", "w2"), "each commit holds one writer's rows")
  }

  test("snapshot table: manifest stats skip files on a range read") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val t = tmp("graft_snap_stats") + "/tbl"
    def frame(lo: Long, hi: Long) =
      (lo until hi).map(i => (i, s"r$i")).toDF("id", "v").repartition(2)
    // three id-clustered commits → disjoint per-commit id ranges
    SnapshotTable.writeSnapshot(frame(0, 100), t)
    SnapshotTable.appendSnapshot(frame(100, 200), t)
    SnapshotTable.appendSnapshot(frame(200, 300), t)
    val full = SnapshotTable.readSnapshot(spark, t)
    val allFiles = full.inputFiles.length
    val pruned = SnapshotTable.readSnapshotRange(spark, t, "id",
      BigDecimal(150), BigDecimal(160))
    // identical to the unpruned filter (pruning deletes I/O, not rows)
    val exp = full.filter($"id" >= 150L && $"id" <= 160L).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val got = pruned.collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got == exp && got.size == 11)
    // only the middle commit's files intersect [150, 160]
    assert(pruned.inputFiles.nonEmpty && pruned.inputFiles.length < allFiles)
    // append carried the BASE files' stats forward: a range inside
    // commit 1 read at the latest version still skips commits 2/3
    val p1 = SnapshotTable.readSnapshotRange(spark, t, "id",
      BigDecimal(0), BigDecimal(10))
    assert(p1.inputFiles.length < allFiles && p1.count() == 11L)
    // an empty intersection plans zero files and returns empty
    val p0 = SnapshotTable.readSnapshotRange(spark, t, "id",
      BigDecimal(1000), BigDecimal(2000))
    assert(p0.count() == 0L)
    // unknown column fails loudly
    intercept[IllegalArgumentException] {
      SnapshotTable.readSnapshotRange(spark, t, "nope",
        BigDecimal(0), BigDecimal(1))
    }
  }

  test("snapshot table: merge upserts by key and preserves history") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val t = tmp("graft_snap_merge") + "/tbl"
    // merge into an empty table = plain first commit
    assert(SnapshotTable.merge(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t, Seq("id")) == 1L)
    // update key 2, insert key 3
    assert(SnapshotTable.merge(
      Seq((2L, "x"), (3L, "c")).toDF("id", "v"), t, Seq("id")) == 2L)
    def rows(ver: Long) = SnapshotTable.readSnapshot(spark, t, ver)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(rows(2) == Seq((1L, "a"), (2L, "x"), (3L, "c")))
    // time travel across merge generations: v1 is untouched
    assert(rows(1) == Seq((1L, "a"), (2L, "b")))
    // schema drift is rejected before any commit lands
    intercept[IllegalArgumentException] {
      SnapshotTable.merge(Seq((9L, 1.5)).toDF("id", "z"), t, Seq("id"))
    }
    assert(SnapshotTable.latestVersion(spark, t) == 2L)
    // tagged merge is exactly-once, and the tag CARRIES FORWARD through
    // an interleaved untagged merge (a retry after it stays a no-op)
    assert(SnapshotTable.mergeBatch(
      Seq((4L, "d")).toDF("id", "v"), t, Seq("id"), 5L).contains(3L))
    assert(SnapshotTable.merge(
      Seq((9L, "w")).toDF("id", "v"), t, Seq("id")) == 4L)
    assert(SnapshotTable.latestBatchId(spark, t).contains(5L))
    assert(SnapshotTable.mergeBatch(
      Seq((4L, "d")).toDF("id", "v"), t, Seq("id"), 5L).isEmpty)
    assert(SnapshotTable.latestVersion(spark, t) == 4L)
    // append tolerates read-back nullability drift (the merge rule)
    assert(SnapshotTable.appendSnapshot(
      SnapshotTable.readSnapshot(spark, t), t) == 5L)
    assert(SnapshotTable.latestBatchId(spark, t).contains(5L)) // carried
    // an untagged full OVERWRITE repurposes the table: the tag resets,
    // so a replacement stream restarting at batch 0 is not blinded
    assert(SnapshotTable.writeSnapshot(
      Seq((1L, "fresh")).toDF("id", "v"), t) == 6L)
    assert(SnapshotTable.latestBatchId(spark, t).isEmpty)
    assert(SnapshotTable.appendBatch(
      Seq((2L, "b0")).toDF("id", "v"), t, 0L).contains(7L))
  }

  test("snapshot table: streaming batches land exactly-once as tagged versions") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t = tmp("graft_snap_stream") + "/tbl"
    val ck = tmp("graft_snap_stream_ck")
    val mem = MemoryStream[Ev]
    val q = SnapshotTable.streamAppend(mem.toDF(), t, ck)
    try {
      mem.addData(Ev(1, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"),
        1, "view", 1.0))
      q.processAllAvailable()
      mem.addData(Ev(2, java.sql.Timestamp.valueOf("2026-01-01 00:01:00"),
        1, "click", 2.0))
      q.processAllAvailable()
    } finally q.stop()
    // one committed, batch-tagged version per micro-batch
    assert(SnapshotTable.versions(spark, t) == Seq(1L, 2L))
    assert(SnapshotTable.latestBatchId(spark, t).contains(1L))
    assert(SnapshotTable.readSnapshot(spark, t).select($"event_id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    // a foreachBatch RETRY of an already-committed batch is a no-op
    val replay = SnapshotTable.readSnapshot(spark, t, 1)
    assert(SnapshotTable.appendBatch(replay, t, 1L).isEmpty)
    assert(SnapshotTable.versions(spark, t) == Seq(1L, 2L))
    // time travel still sees batch 0 alone
    assert(SnapshotTable.readSnapshot(spark, t, 1).count() == 1L)
  }

  test("snapshot table: stats-pruned MERGE rewrites only intersecting files") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val t = tmp("graft_snap_mergep") + "/tbl"
    def frame(lo: Long, hi: Long) =
      (lo until hi).map(i => (i, s"r$i")).toDF("id", "v").repartition(2)
    // three id-clustered commits → disjoint per-file id ranges
    SnapshotTable.writeSnapshot(frame(0, 100), t)
    SnapshotTable.appendSnapshot(frame(100, 200), t)
    SnapshotTable.appendSnapshot(frame(200, 300), t)
    val before = SnapshotTable.readSnapshot(spark, t).inputFiles.toSet
    // updates touch only the middle commit's key range
    val updates = Seq((150L, "X"), (151L, "Y"), (350L, "new"))
      .toDF("id", "v")
    assert(SnapshotTable.mergePruned(updates, t, "id") == 4L)
    val after = SnapshotTable.readSnapshot(spark, t)
    val afterFiles = after.inputFiles.toSet
    // untouched files (commits 1 and 3) are carried VERBATIM; some of
    // the old files survive and some were rewritten
    assert((afterFiles intersect before).nonEmpty, "no files carried")
    assert((before diff afterFiles).nonEmpty, "nothing was rewritten")
    // row semantics identical to a full merge
    val rows = after.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(rows(150L) == "X" && rows(151L) == "Y" && rows(350L) == "new")
    assert(rows.size == 301 && rows(149L) == "r149" && rows(299L) == "r299")
    // time travel: the pre-merge version is intact
    assert(SnapshotTable.readSnapshot(spark, t, 3).count() == 300L)
    // the carried stats still prune on the new version
    val p = SnapshotTable.readSnapshotRange(spark, t, "id",
      BigDecimal(0), BigDecimal(10))
    assert(p.inputFiles.length < afterFiles.size && p.count() == 11L)
    // empty updates are a no-op; schema drift is rejected
    assert(SnapshotTable.mergePruned(
      Seq.empty[(Long, String)].toDF("id", "v"), t, "id") == 4L)
    intercept[IllegalArgumentException] {
      SnapshotTable.mergePruned(Seq((1L, 2.0)).toDF("id", "z"), t, "id")
    }
    assert(SnapshotTable.latestVersion(spark, t) == 4L)
  }

  test("snapshot table: schema evolution and timestamp time travel") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val t = tmp("graft_snap_evolve") + "/tbl"
    SnapshotTable.writeSnapshot(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t)
    // adding a column evolves the recorded schema; old rows read null
    assert(SnapshotTable.appendEvolve(
      Seq((3L, "c", 9.5)).toDF("id", "v", "w"), t) == 2L)
    val v2 = SnapshotTable.readSnapshot(spark, t, 2)
    assert(v2.schema.fieldNames.toSeq == Seq("id", "v", "w"))
    val rows2 = v2.collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(_._1).toSeq
    assert(rows2 == Seq((1L, "a", None), (2L, "b", None),
      (3L, "c", Some(9.5))))
    // a frame OMITTING an existing column appends too; its rows read
    // null there, and the column order stays the table's
    assert(SnapshotTable.appendEvolve(
      Seq((4L, 7.25)).toDF("id", "w"), t) == 3L)
    val rows3 = SnapshotTable.readSnapshot(spark, t, 3).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(_._1).toSeq
    assert(rows3 == Seq((1L, Some("a"), None), (2L, Some("b"), None),
      (3L, Some("c"), Some(9.5)), (4L, None, Some(7.25))))
    // same-name type conflicts are rejected before anything commits
    intercept[IllegalArgumentException] {
      SnapshotTable.appendEvolve(Seq((5L, 1)).toDF("id", "v"), t)
    }
    assert(SnapshotTable.latestVersion(spark, t) == 3L)
    // strict append still rejects new columns
    intercept[IllegalArgumentException] {
      SnapshotTable.appendSnapshot(
        Seq((6L, "x", 1.0, 2.0)).toDF("id", "v", "w", "z"), t)
    }
    // TIMESTAMP AS OF resolves each commit boundary
    val times = SnapshotTable.versionTimes(spark, t)
    assert(times.map(_._1) == Seq(1L, 2L, 3L))
    times.foreach { case (ver, ts) =>
      assert(SnapshotTable.versionAsOf(spark, t, ts) >= ver)
    }
    assert(SnapshotTable.readSnapshotAsOf(spark, t, times.last._2)
      .count() == 4L)
    intercept[IllegalArgumentException] {
      SnapshotTable.versionAsOf(spark, t, times.head._2 - 1000L)
    }
  }

  test("streaming MV maintenance lands exactly-once versioned refreshes") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    import graft.streaming.MvSnapshot
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t = tmp("graft_snap_mv") + "/tbl"
    val ck = tmp("graft_snap_mv_ck")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[Ev]
    val q = MvSnapshot.streamMv(mem.toDF(), t, ck)
    def mv(ver: Long) = SnapshotTable.readSnapshot(spark, t, ver)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    try {
      mem.addData(Ev(1, ts("2026-01-01 00:00:00"), 1, "view", 1.5),
        Ev(2, ts("2026-01-01 00:01:00"), 1, "purchase", 10.0))
      q.processAllAvailable()
      mem.addData(Ev(3, ts("2026-01-01 00:02:00"), 2, "view", 2.5))
      q.processAllAvailable()
    } finally q.stop()
    // one refreshed view VERSION per micro-batch, deltas folded in
    assert(SnapshotTable.versions(spark, t) == Seq(1L, 2L))
    assert(mv(1) == Seq(("purchase", 1L, 1000L), ("view", 1L, 150L)))
    assert(mv(2) == Seq(("purchase", 1L, 1000L), ("view", 2L, 400L)))
    // a foreachBatch retry of an applied batch is a no-op (no
    // double-count, no extra version)
    val replayBatch = Seq(
      Ev(3, ts("2026-01-01 00:02:00"), 2, "view", 2.5)).toDF()
    assert(MvSnapshot.applyBatch(replayBatch, t, 1L).isEmpty)
    assert(SnapshotTable.versions(spark, t) == Seq(1L, 2L) &&
      mv(2) == Seq(("purchase", 1L, 1000L), ("view", 2L, 400L)))
    // the view converges to the batch twin over the union of batches
    val all = Seq(Ev(1, ts("2026-01-01 00:00:00"), 1, "view", 1.5),
      Ev(2, ts("2026-01-01 00:01:00"), 1, "purchase", 10.0),
      Ev(3, ts("2026-01-01 00:02:00"), 2, "view", 2.5)).toDF()
    val twin = MvSnapshot.mvOf(all).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(mv(2) == twin)
  }

  test("snapshot table: vacuum retires history and orphaned data files") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val t = tmp("graft_snap_vac") + "/tbl"
    SnapshotTable.writeSnapshot(Seq((1L, "a")).toDF("id", "v"), t)
    SnapshotTable.writeSnapshot(Seq((2L, "b")).toDF("id", "v"), t)
    SnapshotTable.writeSnapshot(Seq((3L, "c")).toDF("id", "v"), t)
    // default grace period protects freshly-landed files of in-flight
    // commits; these versions are seconds old, so nothing may go yet
    SnapshotTable.vacuum(spark, t, keepVersions = 1)
    assert(new java.io.File(s"$t/data").listFiles().count(_.isDirectory) == 3,
      "grace period must protect young unreferenced files")
    // negative age floor: everything is safe to collect NOW
    SnapshotTable.vacuum(spark, t, keepVersions = 1, minAgeMs = -1000L)
    assert(SnapshotTable.versions(spark, t) == Seq(3L))
    assert(SnapshotTable.readSnapshot(spark, t).select($"id")
      .head.getLong(0) == 3L)
    intercept[IllegalArgumentException] {
      SnapshotTable.readSnapshot(spark, t, 1)
    }
    // only the surviving version's commit directory remains under data/
    val dataDirs = new java.io.File(s"$t/data").listFiles()
      .filter(_.isDirectory)
    assert(dataDirs.length == 1, s"expected 1 live commit dir, got " +
      dataDirs.map(_.getName).mkString(","))
  }

  test("zkey-sorted sink: parquet min/max stats prune files on EITHER dimension") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.AdvancedSql
    val dir = java.nio.file.Files.createTempDirectory("zorder_sink").toString
    val x = pmod($"o_custkey", lit(256L))
    val y = pmod(datediff($"o_orderdate".cast("date"),
      lit("1992-01-01").cast("date")).cast("long"), lit(256L))
    val keyed = Tables.orders(spark, sf)
      .withColumn("xb", x).withColumn("yb", y)
      .withColumn("zkey", AdvancedSql.zorder8($"xb", $"yb"))
    // range-partition by zkey -> each of the 8 files covers one z range
    keyed.repartitionByRange(8, $"zkey")
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    // per-file spans from the data itself = what parquet footer min/max
    // stats expose to the scan
    val spans = back.groupBy(input_file_name().as("f"))
      .agg(min($"xb").as("x0"), max($"xb").as("x1"),
        min($"yb").as("y0"), max($"yb").as("y1"))
      .collect()
    assert(spans.length > 4, s"expected ~8 files, got ${spans.length}")
    // a narrow predicate on EACH dimension must be disjoint from (and
    // hence skip) a decent share of files -- impossible for a layout
    // sorted on only one of the two columns
    def hitting(lo: Long, hi: Long, a: String, b: String): Int =
      spans.count(r => !(r.getAs[Long](b) < lo || r.getAs[Long](a) > hi))
    val xHits = hitting(0, 31, "x0", "x1")
    val yHits = hitting(0, 31, "y0", "y1")
    assert(xHits < spans.length, s"x in [0,32) hit all ${spans.length} files")
    assert(yHits < spans.length, s"y in [0,32) hit all ${spans.length} files")
  }

  test("snapshot table: partitioned writes prune structurally on read") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val t = tmp("graft_snap_part") + "/tbl"
    val langs = Seq("en", "de", "fr", "ja")
    val df = (0 until 400).map(i => (i.toLong, langs(i % 4), s"doc$i"))
      .toDF("id", "lang", "text").repartition(4)
    assert(SnapshotTable.writeSnapshotPartitioned(df, t, "lang") == 1L)
    val full = SnapshotTable.readSnapshot(spark, t)
    assert(full.count() == 400L)
    // partition column survives IN the data (no path inference)
    assert(full.schema.fieldNames.toSeq == Seq("id", "lang", "text"))
    // equality read plans a strict subset of files, result identical
    // to the filtered full read
    val en = SnapshotTable.readSnapshotWhere(spark, t, "lang", "en")
    assert(en.inputFiles.length < full.inputFiles.length,
      s"partition pruning planned ${en.inputFiles.length} of " +
        s"${full.inputFiles.length} files")
    val expectEn = full.filter($"lang" === "en")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(en.collect().map(_.getLong(0)).sorted.toSeq == expectEn)
    // an APPEND without an explicit partition column inherits the
    // table's layout — its files are prunable too
    val more = Seq((1000L, "en", "x"), (1001L, "de", "y"))
      .toDF("id", "lang", "text")
    assert(SnapshotTable.appendSnapshot(more, t) == 2L)
    val en2 = SnapshotTable.readSnapshotWhere(spark, t, "lang", "en")
    val all2 = SnapshotTable.readSnapshot(spark, t)
    assert(en2.inputFiles.length < all2.inputFiles.length)
    assert(en2.collect().map(_.getLong(0)).sorted.toSeq ==
      (expectEn :+ 1000L).sorted)
    // numeric stats skipping still composes on the same table
    val pruned = SnapshotTable.readSnapshotRange(spark, t, "id",
      BigDecimal(1000), BigDecimal(2000))
    assert(pruned.inputFiles.length < all2.inputFiles.length)
    assert(pruned.count() == 2L)
    // a plain overwrite REPURPOSES the table: partition layout resets
    SnapshotTable.writeSnapshot(Seq((1L, "en", "z"))
      .toDF("id", "lang", "text"), t)
    val w = SnapshotTable.readSnapshotWhere(spark, t, "lang", "en")
    assert(w.count() == 1L)
  }

  test("snapshot table: compaction bin-packs small files, data unchanged") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val t = tmp("graft_snap_compact") + "/tbl"
    // a day of micro-batches: 6 tiny appends, 2 files each
    (0 until 6).foreach { b =>
      val df = (b * 100 until (b + 1) * 100)
        .map(i => (i.toLong, s"r$i")).toDF("id", "v").repartition(2)
      if (b == 0) SnapshotTable.writeSnapshot(df, t)
      else assert(SnapshotTable.appendBatch(df, t, b.toLong).isDefined)
    }
    val before = SnapshotTable.readSnapshot(spark, t)
    val beforeFiles = before.inputFiles.toSet
    assert(beforeFiles.size == 12)
    val rows = before.collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1).toSeq
    // OPTIMIZE: everything is tiny, so it packs into few files
    val v = SnapshotTable.compact(spark, t, targetBytes = 64L << 20)
    assert(v == 7L)
    val after = SnapshotTable.readSnapshot(spark, t)
    assert(after.inputFiles.length < beforeFiles.size,
      s"compaction planned ${after.inputFiles.length} files")
    assert(after.collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1).toSeq == rows, "row set changed")
    // time travel to the pre-compaction version is intact
    assert(SnapshotTable.readSnapshot(spark, t, 6).inputFiles.toSet ==
      beforeFiles)
    // recomputed stats still prune
    val p = SnapshotTable.readSnapshotRange(spark, t, "id",
      BigDecimal(0), BigDecimal(10))
    assert(p.count() == 11L)
    // the batch tag carried through — the maintaining stream's replay
    // guard is unaffected, and a retry of batch 5 stays a no-op
    assert(SnapshotTable.latestBatchId(spark, t).contains(5L))
    assert(SnapshotTable.appendBatch(
      Seq((999L, "x")).toDF("id", "v"), t, 5L).isEmpty)
    // compacting an already-packed table is a no-op
    assert(SnapshotTable.compact(spark, t, targetBytes = 64L << 20) == 7L)
    assert(SnapshotTable.latestVersion(spark, t) == 7L)
    // vacuum reclaims the replaced small files
    SnapshotTable.vacuum(spark, t, keepVersions = 1, minAgeMs = -1000L)
    val live = SnapshotTable.readSnapshot(spark, t).inputFiles.toSet
    assert((beforeFiles intersect live).isEmpty,
      "replaced files must be reclaimed")
    assert(SnapshotTable.readSnapshot(spark, t).count() == 600L)
  }

  test("snapshot table: change feed reads version deltas in commit order") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val t = tmp("graft_snap_feed") + "/tbl"
    SnapshotTable.writeSnapshot(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t)
    SnapshotTable.appendSnapshot(Seq((3L, "c")).toDF("id", "v"), t)
    SnapshotTable.appendSnapshot(Seq((4L, "d"), (5L, "e")).toDF("id", "v"), t)
    def feed(from: Long, to: Long = -1L) =
      SnapshotTable.changesBetween(spark, t, from, to)
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getLong(r.fieldIndex("_commit_version")))).sortBy(_._1).toSeq
    // the full feed replays the whole append-only history
    assert(feed(0) == Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 2L),
      (4L, "d", 3L), (5L, "e", 3L)))
    // an incremental consumer resumes mid-stream
    assert(feed(1, 2) == Seq((3L, "c", 2L)))
    assert(feed(2) == Seq((4L, "d", 3L), (5L, "e", 3L)))
    // a caught-up consumer sees an empty (but well-typed) batch
    val empty = SnapshotTable.changesBetween(spark, t, 3)
    assert(empty.count() == 0L &&
      empty.schema.fieldNames.last == "_commit_version")
    // compaction commits do NOT re-emit their rewritten rows
    val cv = SnapshotTable.compact(spark, t, targetBytes = 64L << 20)
    assert(cv == 4L)
    assert(SnapshotTable.changesBetween(spark, t, 3).count() == 0L)
    // but a real append after the compaction flows through
    SnapshotTable.appendSnapshot(Seq((6L, "f")).toDF("id", "v"), t)
    assert(feed(3) == Seq((6L, "f", 5L)))
    // a vacuumed base version fails loudly, not silently-wrong
    SnapshotTable.vacuum(spark, t, keepVersions = 1, minAgeMs = -1000L)
    intercept[IllegalArgumentException] {
      SnapshotTable.changesBetween(spark, t, 1)
    }
  }

  test("snapshot table: sparse MERGE rewrites only bucket-touched files") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val t = tmp("graft_snap_sparse") + "/tbl"
    def frame(lo: Long, hi: Long) =
      (lo until hi).map(i => (i, s"r$i")).toDF("id", "v").repartition(2)
    // three id-clustered commits → disjoint per-file id ranges
    SnapshotTable.writeSnapshot(frame(0, 100), t)
    SnapshotTable.appendSnapshot(frame(100, 200), t)
    SnapshotTable.appendSnapshot(frame(200, 300), t)
    val before = SnapshotTable.readSnapshot(spark, t).inputFiles.toSet
    // updates at OPPOSITE key extremes: one global [5, 295] envelope
    // would intersect every file and degrade to a full rewrite; the
    // bucketed ranges must leave the middle commit untouched
    val updates = Seq((5L, "X"), (295L, "Y")).toDF("id", "v")
    assert(SnapshotTable.mergePruned(updates, t, "id") == 4L)
    val after = SnapshotTable.readSnapshot(spark, t)
    val carried = after.inputFiles.toSet intersect before
    // the middle commit's rows [100, 200) live only in carried files
    val carriedRows =
      spark.read.parquet(carried.toSeq: _*).select($"id")
        .collect().map(_.getLong(0)).toSet
    assert((100L until 200L).forall(carriedRows.contains),
      "middle commit was rewritten despite no updates in its range")
    // semantics identical to a full merge
    val rows = after.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(rows.size == 300 && rows(5L) == "X" && rows(295L) == "Y" &&
      rows(150L) == "r150")
    // non-prunable merge keys (no stats form at all) are rejected UP
    // FRONT with direction; string keys take the D297 pruned path
    val err = intercept[IllegalArgumentException] {
      SnapshotTable.mergePruned(
        Seq((true, 1L)).toDF("flag", "n"), t, "flag")
    }
    assert(err.getMessage.contains("merge()"))
  }

  test("snapshot table: sorted compaction keeps stats pruning a seek") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val t = tmp("graft_snap_csort") + "/tbl"
    // id-clustered commits (disjoint per-file ranges), then compact
    def frame(lo: Long, hi: Long) =
      (lo until hi).map(i => (i, s"r$i")).toDF("id", "v").repartition(2)
    SnapshotTable.writeSnapshot(frame(0, 100), t)
    (1 until 6).foreach(b =>
      SnapshotTable.appendSnapshot(frame(b * 100L, (b + 1) * 100L), t))
    // SORTED compaction range-partitions on the clustering key, so the
    // packed files keep near-disjoint [min,max] ranges (8 KB target →
    // several packed files, each covering a narrow id band)
    assert(SnapshotTable.compact(spark, t, targetBytes = 8192L,
      sortCol = Some("id")) == 7L)
    val all = SnapshotTable.readSnapshot(spark, t)
    assert(all.count() == 600L && all.inputFiles.length < 12 &&
      all.inputFiles.length > 1)
    val narrow = SnapshotTable.readSnapshotRange(spark, t, "id",
      BigDecimal(0), BigDecimal(10))
    assert(narrow.count() == 11L)
    assert(narrow.inputFiles.length < all.inputFiles.length,
      s"sorted compaction lost stats pruning: " +
        s"${narrow.inputFiles.length} of ${all.inputFiles.length} planned")
    // unknown sort column fails upfront
    intercept[IllegalArgumentException] {
      SnapshotTable.compact(spark, t, 64L << 20, Some("nope"))
    }
  }

  test("snapshot table: compaction preserves the partitioned one-value-per-file invariant") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val t = tmp("graft_snap_cpart") + "/tbl"
    val langs = Seq("en", "de", "fr")
    // five small partitioned appends — 15+ tiny files across 3 values
    (0 until 5).foreach { b =>
      val df = (b * 60 until (b + 1) * 60)
        .map(i => (i.toLong, langs(i % 3), s"d$i")).toDF("id", "lang", "text")
        .repartition(2)
      if (b == 0) SnapshotTable.writeSnapshotPartitioned(df, t, "lang")
      else SnapshotTable.appendSnapshot(df, t)
    }
    val beforeFiles = SnapshotTable.readSnapshot(spark, t).inputFiles.length
    val rows = SnapshotTable.readSnapshot(spark, t)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(SnapshotTable.compact(spark, t, targetBytes = 64L << 20) == 6L)
    val after = SnapshotTable.readSnapshot(spark, t)
    assert(after.inputFiles.length < beforeFiles)
    assert(after.collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1).toSeq == rows)
    // the repacked files are still one-partition-value each: the
    // equality read plans a strict subset AND still matches the filter
    val en = SnapshotTable.readSnapshotWhere(spark, t, "lang", "en")
    assert(en.inputFiles.length < after.inputFiles.length,
      "compaction lost the partitioned layout (no pruning)")
    assert(en.count() == rows.count(_._2 == "en").toLong)
  }

  test("snapshot table: sparse MERGE keeps the partition layout it rewrites") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val t = tmp("graft_snap_mpart") + "/tbl"
    val langs = Seq("en", "de")
    val base = (0 until 200)
      .map(i => (i.toLong, langs(i % 2), s"d$i")).toDF("id", "lang", "text")
    SnapshotTable.writeSnapshotPartitioned(base, t, "lang")
    // a pruned merge rewrites through the table's partition layout
    val updates = Seq((5L, "de", "X"), (6L, "en", "Y"))
      .toDF("id", "lang", "text")
    assert(SnapshotTable.mergePruned(updates, t, "id") == 2L)
    val after = SnapshotTable.readSnapshot(spark, t)
    val m = after.collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(m(5L) == "X" && m(6L) == "Y" && m(7L) == "d7" && m.size == 200)
    // rewritten files are still single-valued: equality pruning works
    // on the merged version
    val en = SnapshotTable.readSnapshotWhere(spark, t, "lang", "en")
    assert(en.inputFiles.length < after.inputFiles.length)
    assert(en.count() == 100L)
  }

  test("snapshot table: delimiter-hostile column names keep stats safe") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val t = tmp("graft_snap_esc") + "/tbl"
    // names carrying the manifest delimiters and a dot: the stats line
    // must escape them and col() references must not re-parse them
    val df = (0 until 100).map(i => (i.toLong, i * 2L, s"s$i"))
      .toDF("a|b=c,d", "e.f", "v").repartition(2)
    assert(SnapshotTable.writeSnapshot(df, t) == 1L)
    val back = SnapshotTable.readSnapshot(spark, t)
    assert(back.count() == 100L)
    // both hostile columns must still RANGE-prune correctly
    val p1 = SnapshotTable.readSnapshotRange(spark, t, "a|b=c,d",
      BigDecimal(0), BigDecimal(10))
    assert(p1.count() == 11L)
    val p2 = SnapshotTable.readSnapshotRange(spark, t, "e.f",
      BigDecimal(0), BigDecimal(10))
    assert(p2.count() == 6L)
    // appends (the write path ADVICE flagged as regressed) succeed
    assert(SnapshotTable.appendSnapshot(
      Seq((1000L, 2000L, "x")).toDF("a|b=c,d", "e.f", "v"), t) == 2L)
    assert(SnapshotTable.readSnapshotRange(spark, t, "e.f",
      BigDecimal(1999), BigDecimal(2001)).count() == 1L)
    // a partitioned write on a hostile STRING value round-trips
    val t2 = tmp("graft_snap_esc2") + "/tbl"
    val weird = Seq((1L, "x|y=z,w"), (2L, "plain"), (3L, "x|y=z,w"))
      .toDF("id", "k")
    SnapshotTable.writeSnapshotPartitioned(weird, t2, "k")
    val sel = SnapshotTable.readSnapshotWhere(spark, t2, "k", "x|y=z,w")
    assert(sel.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }

  test("snapshot table: change feed reads evolved history with the target schema") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val t = tmp("graft_snap_feedevo") + "/tbl"
    SnapshotTable.writeSnapshot(Seq((1L, "a")).toDF("id", "v"), t)
    // evolution adds a column mid-history; old files lack it
    SnapshotTable.appendEvolve(Seq((2L, "b", 9.5)).toDF("id", "v", "w"), t)
    val feed = SnapshotTable.changesBetween(spark, t, 0L)
    assert(feed.schema.fieldNames.toSeq ==
      Seq("id", "v", "w", "_change_type", "_commit_version"))
    val rows = feed.collect().map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        r.getString(3),
        r.getLong(4))).sortBy(_._1).toSeq
    assert(rows == Seq((1L, None, "insert", 1L),
      (2L, Some(9.5), "insert", 2L)))
  }

  test("snapshot table: DELETE WHERE rewrites only intersecting files and keeps history") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val t = tmp("graft_snap_del") + "/tbl"
    // three id-clustered commits -> disjoint per-file id ranges, plus
    // a null-keyed row (never inside a delete range)
    def frame(lo: Long, hi: Long) =
      (lo until hi).map(i => (Some(i), s"r$i")).toDF("id", "v")
        .repartition(2)
    SnapshotTable.writeSnapshot(frame(0, 200), t)
    SnapshotTable.appendSnapshot(frame(200, 400), t)
    SnapshotTable.appendSnapshot(
      frame(400, 600).unionAll(Seq((Option.empty[Long], "null-key"))
        .toDF("id", "v")), t)
    val before = SnapshotTable.readSnapshot(spark, t)
    assert(before.count() == 601L)
    val beforeFiles = before.inputFiles.toSet
    // delete one mid-table id band: only commit-2 files intersect
    val v = SnapshotTable.deleteWhere(spark, t, "id",
      BigDecimal(250), BigDecimal(299))
    assert(v == 4L)
    val after = SnapshotTable.readSnapshot(spark, t)
    assert(after.count() == 551L)
    assert(after.filter($"id" >= 250L && $"id" <= 299L).count() == 0L)
    // the null-keyed row survives (not in any range)
    assert(after.filter($"id".isNull).count() == 1L)
    // untouched files carried VERBATIM (commits 1 and 3 never rewritten)
    val afterFiles = after.inputFiles.toSet
    val carried = beforeFiles intersect afterFiles
    assert(carried.nonEmpty, "disjoint commits must be carried, not rewritten")
    assert((beforeFiles -- afterFiles).nonEmpty, "touched files replaced")
    // pre-delete version intact under time travel
    assert(SnapshotTable.readSnapshot(spark, t, 3).count() == 601L)
    // the feed carries the deleted rows as explicit `delete` changes
    val feed = SnapshotTable.changesBetween(spark, t, 3, 4)
    assert(feed.count() == 50L)
    assert(feed.select("_change_type").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("delete"))
    // a no-match delete publishes no commit
    assert(SnapshotTable.deleteWhere(spark, t, "id",
      BigDecimal(10000), BigDecimal(10001)) == 4L)
    // vacuum reclaims the replaced files
    SnapshotTable.vacuum(spark, t, keepVersions = 1, minAgeMs = -1000L)
    val live = SnapshotTable.readSnapshot(spark, t).inputFiles.toSet
    assert((beforeFiles -- afterFiles).forall(f =>
      !live.contains(f)), "replaced files must be gone after vacuum")
    assert(SnapshotTable.readSnapshot(spark, t).count() == 551L)
  }

  test("snapshot table: multi-column layout prunes multiplicatively with equality, IN and range") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    import graft.sources.SnapshotTable.{SnapshotEquals, SnapshotIn, SnapshotRange}
    val t = tmp("graft_snap_multi") + "/tbl"
    val srcs = Seq("web", "books", "code")
    val langs = Seq("en", "de", "fr", "ja")
    val df = (0 until 360).map(i =>
        (i.toLong, srcs(i % 3), langs((i / 3) % 4), s"doc$i"))
      .toDF("id", "source", "lang", "text").repartition(4)
    assert(SnapshotTable.writeSnapshotPartitionedMulti(df, t,
      Seq("source", "lang")) == 1L)
    val full = SnapshotTable.readSnapshot(spark, t)
    assert(full.count() == 360L)
    val nFull = full.inputFiles.length
    // each predicate prunes independently; together they compose
    val bySrc = SnapshotTable.readSnapshotFiltered(spark, t,
      Seq(SnapshotEquals("source", "web")))
    val byBoth = SnapshotTable.readSnapshotFiltered(spark, t,
      Seq(SnapshotEquals("source", "web"), SnapshotEquals("lang", "en")))
    assert(bySrc.inputFiles.length < nFull)
    assert(byBoth.inputFiles.length < bySrc.inputFiles.length,
      s"two-column pruning must beat one (${byBoth.inputFiles.length}" +
        s" vs ${bySrc.inputFiles.length} of $nFull)")
    val expect = full.filter($"source" === "web" && $"lang" === "en")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(byBoth.collect().map(_.getLong(0)).sorted.toSeq == expect)
    // IN-set pruning keeps only the named partitions
    val inQ = SnapshotTable.readSnapshotFiltered(spark, t,
      Seq(SnapshotIn("lang", Set("en", "de"))))
    assert(inQ.inputFiles.length < nFull)
    assert(inQ.count() ==
      full.filter($"lang".isin("en", "de")).count())
    // a range predicate composes with the layout predicates (result
    // identical to the filtered full read, whatever it prunes)
    val mix = SnapshotTable.readSnapshotFiltered(spark, t,
      Seq(SnapshotEquals("source", "code"),
        SnapshotRange("id", BigDecimal(0), BigDecimal(99))))
    val expectMix = full.filter($"source" === "code" &&
        $"id" >= 0L && $"id" <= 99L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(mix.collect().map(_.getLong(0)).sorted.toSeq == expectMix)
    assert(mix.inputFiles.length <= bySrc.inputFiles.length)
  }

  test("snapshot table: compaction plans from manifest sizes (zero file-status RPCs)") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val t = tmp("graft_snap_planless") + "/tbl"
    (0 until 5).foreach { b =>
      val df = (b * 50 until (b + 1) * 50).map(i => (i.toLong, s"r$i"))
        .toDF("id", "v").repartition(2)
      if (b == 0) SnapshotTable.writeSnapshot(df, t)
      else SnapshotTable.appendSnapshot(df, t)
    }
    SnapshotTable.sizeFallbacks.set(0L)
    val v = SnapshotTable.compact(spark, t, targetBytes = 64L << 20)
    assert(v == 6L)
    assert(SnapshotTable.sizeFallbacks.get() == 0L,
      "compaction planning must read sizes from the manifest, not the FS")
    assert(SnapshotTable.readSnapshot(spark, t).count() == 250L)
    // compacting again is a no-op and still plans manifest-only
    assert(SnapshotTable.compact(spark, t, targetBytes = 64L << 20) == 6L)
    assert(SnapshotTable.sizeFallbacks.get() == 0L)
  }

  test("snapshot table: vacuum reclaims replaced PARTITIONED files (recursive walk)") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val t = tmp("graft_snap_pvac") + "/tbl"
    val langs = Seq("en", "de")
    def mk(b: Int) = (b * 60 until (b + 1) * 60)
      .map(i => (i.toLong, langs(i % 2), s"d$i"))
      .toDF("id", "lang", "text").repartition(2)
    assert(SnapshotTable.writeSnapshotPartitioned(mk(0), t, "lang") == 1L)
    (1 until 4).foreach(b => SnapshotTable.appendSnapshot(mk(b), t))
    val replaced = SnapshotTable.readSnapshot(spark, t).inputFiles.toSet
    // compaction rewrites the partitioned files; vacuum must then
    // find the replaced ones UNDER the __graft_pv= subdirs
    SnapshotTable.compact(spark, t, targetBytes = 64L << 20)
    SnapshotTable.vacuum(spark, t, keepVersions = 1, minAgeMs = -1000L)
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val onDisk = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(t, "data"), true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet"))
          buf += f.getPath.toUri.getPath
      }
      buf.toSet
    }
    val stillThere = replaced.map(u => new java.net.URI(u).getPath)
      .intersect(onDisk)
    assert(stillThere.isEmpty,
      s"replaced partitioned files leaked past vacuum: $stillThere")
    // the table still reads, partition-pruned, with full contents
    assert(SnapshotTable.readSnapshot(spark, t).count() == 240L)
    assert(SnapshotTable.readSnapshotWhere(spark, t, "lang", "en")
      .count() == 120L)
  }

  test("snapshot table: MERGE emits row-level pre/post-image change types") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val t = tmp("graft_snap_cdf") + "/tbl"
    SnapshotTable.writeSnapshot(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), t)
    // full merge: update key 2, insert key 4 -> untouched keys 1/3
    // must NOT appear in the feed (the round-13 double-count footgun)
    SnapshotTable.merge(Seq((2L, "B"), (4L, "d")).toDF("id", "v"), t,
      Seq("id"))
    def feed(from: Long, to: Long) =
      SnapshotTable.changesBetween(spark, t, from, to)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sortBy(x => (x._1, x._3)).toSeq
    assert(feed(1, 2) == Seq((2L, "B", "update_postimage"),
      (2L, "b", "update_preimage"), (4L, "d", "insert")))
    // stats-pruned merge emits the same row-level semantics
    SnapshotTable.mergePruned(Seq((3L, "C")).toDF("id", "v"), t, "id")
    assert(feed(2, 3) == Seq((3L, "C", "update_postimage"),
      (3L, "c", "update_preimage")))
    // a merge touching zero rows emits NOTHING (cdf-complete marker,
    // not the legacy rewritten-files-as-inserts fallback)
    SnapshotTable.merge(Seq.empty[(Long, String)].toDF("id", "v"), t,
      Seq("id"))
    assert(SnapshotTable.changesBetween(spark, t, 3, 4).count() == 0L)
    // the first commit replays as plain inserts
    assert(feed(0, 1) == Seq((1L, "a", "insert"), (2L, "b", "insert"),
      (3L, "c", "insert")))
    // table contents are the merged state
    assert(SnapshotTable.readSnapshot(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq ==
      Seq((1L, "a"), (2L, "B"), (3L, "C"), (4L, "d")))
  }

  test("graft-snapshot format: batch reads with time travel and scan-level pruning") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val t = tmp("graft_snap_fmt") + "/tbl"
    val srcs = Seq("web", "books")
    def mk(lo: Long, hi: Long) = (lo until hi)
      .map(i => (i, srcs((i % 2).toInt), s"doc$i"))
      .toDF("id", "source", "text").repartition(2)
    SnapshotTable.writeSnapshotPartitioned(mk(0, 200), t, "source")
    Thread.sleep(60) // distinct commit mtimes for timestampAsOf
    val t1 = SnapshotTable.versionTimes(spark, t).last._2
    SnapshotTable.appendSnapshot(mk(200, 400), t)
    def fmt(opts: (String, String)*) = {
      val r = spark.read.format("graft-snapshot")
      opts.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load(t)
    }
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sortBy(_._1).toSeq
    // format-read == readSnapshot, bit for bit, schema included
    val api = SnapshotTable.readSnapshot(spark, t)
    val viaFmt = fmt()
    assert(viaFmt.schema.fieldNames.toSeq == api.schema.fieldNames.toSeq)
    assert(rows(viaFmt) == rows(api) && viaFmt.count() == 400L)
    // versionAsOf / timestampAsOf time travel
    assert(rows(fmt("versionAsOf" -> "1")) ==
      rows(SnapshotTable.readSnapshot(spark, t, 1)))
    assert(rows(fmt("timestampAsOf" -> t1.toString)) ==
      rows(SnapshotTable.readSnapshot(spark, t, 1)))
    // pushed filters prune the planned file list inside the scan
    def numFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      val scans = df.queryExecution.executedPlan.collect {
        case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
          case sc: FileSourceScanExec => sc }
        case sc: FileSourceScanExec => Seq(sc)
      }.flatten
      assert(scans.nonEmpty, "no file scan in the plan")
      scans.map(_.metrics("numFiles").value).sum
    }
    val nAll = numFiles(fmt())
    // partition-value equality prunes structurally
    val bySrc = fmt().filter($"source" === "web")
    val nSrc = numFiles(bySrc)
    assert(nSrc < nAll, s"source= pruned nothing ($nSrc of $nAll)")
    assert(rows(bySrc) == rows(api.filter($"source" === "web")))
    // numeric range prunes via the per-file stats (id-clustered commits)
    val byId = fmt().filter($"id" >= 250L && $"id" <= 299L)
    val nId = numFiles(byId)
    assert(nId < nAll, s"id range pruned nothing ($nId of $nAll)")
    assert(rows(byId) ==
      rows(api.filter($"id" >= 250L && $"id" <= 299L)))
    // an unsupported predicate must not lose rows (prunes nothing)
    val odd = fmt().filter($"id" % 2L === 1L)
    assert(odd.count() == 200L)
    // IN-set on the layout column prunes too, results identical
    val inq = fmt().filter($"source".isin("books"))
    assert(numFiles(inq) < nAll)
    assert(rows(inq) == rows(api.filter($"source" === "books")))
  }

  test("graft-snapshot format: date and timestamp predicates prune files") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val t = tmp("graft_snap_date") + "/tbl"
    // a year of date-partitioned facts (the dominant warehouse layout),
    // committed in two halves so both partition stats and data-file
    // stats exist; ts is a zone-free NTZ event time clustered with d
    def day(i: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(1994, 1, 1).plusDays(i.toLong))
    def ts(i: Int) = java.time.LocalDateTime.of(1994, 1, 1, 0, 0, 0)
      .plusHours(i.toLong * 7L)
    def mk(lo: Int, hi: Int) = (lo until hi)
      .map(i => (i.toLong, day(i % 60), ts(i), s"v$i"))
      .toDF("id", "d", "ts", "v")
    SnapshotTable.writeSnapshotPartitioned(mk(0, 120), t, "d")
    SnapshotTable.appendSnapshot(mk(120, 240), t)
    def fmt() = spark.read.format("graft-snapshot").load(t)
    val api = SnapshotTable.readSnapshot(spark, t)
    def numFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      val scans = df.queryExecution.executedPlan.collect {
        case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
          case sc: FileSourceScanExec => sc }
        case sc: FileSourceScanExec => Seq(sc)
      }.flatten
      assert(scans.nonEmpty, "no file scan in the plan")
      scans.map(_.metrics("numFiles").value).sum
    }
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getLong(0)).sorted.toSeq
    val nAll = numFiles(fmt())
    // date EQUALITY on the layout column prunes structurally
    val eq = fmt().filter($"d" === lit("1994-01-15").cast("date"))
    assert(numFiles(eq) < nAll, "date equality pruned nothing")
    assert(rows(eq) == rows(api.filter($"d" === lit("1994-01-15").cast("date"))))
    assert(eq.count() == 4L) // ids 14, 74, 134, 194
    // date BETWEEN prunes to the intersecting partitions
    val rg = fmt().filter($"d".between(lit("1994-01-05").cast("date"),
      lit("1994-01-10").cast("date")))
    assert(numFiles(rg) < nAll, "date range pruned nothing")
    assert(rows(rg) == rows(api.filter(
      $"d".between(lit("1994-01-05").cast("date"),
        lit("1994-01-10").cast("date")))))
    // date IN-set prunes too
    val din = fmt().filter($"d".isin(day(3), day(7)))
    assert(numFiles(din) < nAll, "date IN pruned nothing")
    assert(rows(din) == rows(api.filter($"d".isin(day(3), day(7)))))
    // NTZ timestamp range prunes via the commit-clustered data stats:
    // the second commit's ts values all exceed the first commit's
    val tcut = ts(120)
    val tq = fmt().filter($"ts" >= lit(tcut))
    assert(numFiles(tq) < nAll, "ntz timestamp range pruned nothing")
    assert(rows(tq) == rows(api.filter($"ts" >= lit(tcut))) &&
      tq.count() == 120L)
    // zoned TIMESTAMP columns prune through the micros stat form
    val t2 = tmp("graft_snap_tstz") + "/tbl"
    val zdf = (0 until 100).map(i => (i.toLong,
        java.sql.Timestamp.from(java.time.Instant.parse("2026-01-01T00:00:00Z")
          .plusSeconds(i.toLong * 3600L))))
      .toDF("id", "zts")
    SnapshotTable.writeSnapshot(zdf.filter($"id" < 50), t2)
    SnapshotTable.appendSnapshot(zdf.filter($"id" >= 50), t2)
    def fmt2() = spark.read.format("graft-snapshot").load(t2)
    val cut = java.sql.Timestamp.from(
      java.time.Instant.parse("2026-01-03T02:00:00Z"))
    val zq = fmt2().filter($"zts" >= lit(cut))
    assert(numFiles(zq) < numFiles(fmt2()), "tz timestamp pruned nothing")
    assert(zq.count() == 50L &&
      rows(zq) == rows(SnapshotTable.readSnapshot(spark, t2)
        .filter($"zts" >= lit(cut))))
    // Scala-API filtered reads agree through the same predicates
    val viaApi = SnapshotTable.readSnapshotFiltered(spark, t,
      Seq(SnapshotTable.SnapshotStrRange("d", "1994-01-05", "1994-01-10")))
    assert(rows(viaApi) == rows(rg))
  }

  test("graft-snapshot format: write path commits like the Scala API") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val base = tmp("graft_snap_write")
    val tFmt = s"$base/fmt"
    val tApi = s"$base/api"
    def mk(lo: Long, hi: Long) = (lo until hi)
      .map(i => (i, s"s${i % 3}", s"v$i")).toDF("id", "source", "v")
    // format write: explicit layout on overwrite, inherited on append
    mk(0, 90).write.format("graft-snapshot").mode("overwrite")
      .option("partitionCols", "source").save(tFmt)
    mk(90, 120).write.format("graft-snapshot").mode("append").save(tFmt)
    // API twin
    SnapshotTable.writeSnapshotPartitioned(mk(0, 90), tApi, "source")
    SnapshotTable.appendSnapshot(mk(90, 120), tApi)
    // manifest-for-manifest: same versions, same per-version file
    // counts, partition layout, stats column sets, and row counts
    assert(SnapshotTable.versions(spark, tFmt) ==
      SnapshotTable.versions(spark, tApi))
    def rows(t: String, v: Long) =
      SnapshotTable.readSnapshot(spark, t, v).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sortBy(_._1).toSeq
    Seq(1L, 2L).foreach(v => assert(rows(tFmt, v) == rows(tApi, v)))
    // the appended commit inherited the partition layout: a partition
    // equality prunes on BOTH tables identically
    def pruned(t: String) = SnapshotTable.readSnapshotWhere(
      spark, t, "source", "s1").inputFiles.length
    assert(pruned(tFmt) == pruned(tApi) &&
      pruned(tFmt) < SnapshotTable.readSnapshot(spark, tFmt)
        .inputFiles.length)
    // ErrorIfExists refuses a committed table; Ignore is a no-op
    intercept[IllegalStateException] {
      mk(0, 1).write.format("graft-snapshot")
        .mode("error").save(tFmt)
    }
    mk(0, 1).write.format("graft-snapshot").mode("ignore").save(tFmt)
    assert(SnapshotTable.latestVersion(spark, tFmt) == 2L)
    // the write returns a readable relation: a fresh format read sees
    // the appended state
    assert(spark.read.format("graft-snapshot").load(tFmt).count() == 120L)
  }

  test("snapshot manifest-log checkpointing: O(1) version resolution") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val t = tmp("graft_snap_hint") + "/tbl"
    def mk(lo: Long, hi: Long) =
      (lo until hi).map(i => (i, s"v$i")).toDF("id", "v")
    SnapshotTable.writeSnapshot(mk(0, 10), t)
    (1 until 12).foreach(i =>
      SnapshotTable.appendSnapshot(mk(i * 10L, i * 10L + 10L), t))
    // steady state: every resolution rides the hint — ZERO directory
    // listings across latestVersion polls, plain reads, pruned reads,
    // the format, and the change feed (the getOffset poll path)
    SnapshotTable.manifestListings.set(0L)
    (1 to 5).foreach(_ =>
      assert(SnapshotTable.latestVersion(spark, t) == 12L))
    assert(SnapshotTable.readSnapshot(spark, t).count() == 120L)
    assert(spark.read.format("graft-snapshot").load(t).count() == 120L)
    assert(SnapshotTable.changesBetween(spark, t, 10L).count() == 20L)
    assert(SnapshotTable.manifestListings.get() == 0L,
      s"hinted resolution paid ${SnapshotTable.manifestListings.get()} listings")
    // a deleted/corrupt hint falls back to ONE listing and self-repairs
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(t, "_manifest/_versionhint"),
      false)
    assert(SnapshotTable.versions(spark, t) == (1L to 12L))
    assert(SnapshotTable.manifestListings.get() == 1L)
    SnapshotTable.manifestListings.set(0L)
    assert(SnapshotTable.latestVersion(spark, t) == 12L &&
      SnapshotTable.manifestListings.get() == 0L) // repaired
    // a STALE hint (new commits since) probes forward, no listing
    SnapshotTable.appendSnapshot(mk(120, 130), t)
    fs.create(new org.apache.hadoop.fs.Path(t, "_manifest/_versionhint"),
      true) match { case o => o.write("1 11".getBytes("UTF-8")); o.close() }
    SnapshotTable.manifestListings.set(0L)
    assert(SnapshotTable.versions(spark, t) == (1L to 13L) &&
      SnapshotTable.manifestListings.get() == 0L)
    // vacuum retires manifests AND the hint window; time travel to the
    // kept pre-checkpoint versions still works, retired ones fail loudly
    SnapshotTable.vacuum(spark, t, keepVersions = 4, minAgeMs = 0L)
    SnapshotTable.manifestListings.set(0L)
    assert(SnapshotTable.versions(spark, t) == (10L to 13L))
    assert(SnapshotTable.readSnapshot(spark, t, 10L).count() == 100L)
    assert(SnapshotTable.manifestListings.get() == 0L)
    intercept[IllegalArgumentException] {
      SnapshotTable.readSnapshot(spark, t, 5L)
    }
    // change-feed restart across the checkpointed log is unaffected
    assert(SnapshotTable.changesBetween(spark, t, 10L).count() == 30L)
  }

  test("string-key DELETE WHERE and mergePruned prune files") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    import graft.sources.SnapshotTable.{SnapshotIn, SnapshotRange}
    val t = tmp("graft_snap_strkey") + "/tbl"
    // key-clustered commits: each commit's user-id range is disjoint,
    // so the recorded string stats give per-file key envelopes
    def mk(lo: Int, hi: Int) = (lo until hi)
      .map(i => (f"u$i%04d", i.toLong, s"v$i")).toDF("uid", "n", "v")
    SnapshotTable.writeSnapshot(mk(0, 100), t)
    SnapshotTable.appendSnapshot(mk(100, 200), t)
    SnapshotTable.appendSnapshot(mk(200, 300), t)
    val filesBefore = SnapshotTable.readSnapshot(spark, t).inputFiles.toSet
    // GDPR-style IN-set erasure on the STRING key: only the commit
    // holding those keys is rewritten; the other files carry verbatim
    val v = SnapshotTable.deleteWhereFiltered(spark, t,
      Seq(SnapshotIn("uid", Set("u0150", "u0160"))))
    assert(v == 4L)
    val after = SnapshotTable.readSnapshot(spark, t)
    assert(after.count() == 298L &&
      after.filter($"uid".isin("u0150", "u0160")).count() == 0L)
    val filesAfter = after.inputFiles.toSet
    val carried = filesBefore.intersect(filesAfter)
    assert(carried.nonEmpty, "delete rewrote every file (no pruning)")
    // CDF delete rows are exactly the erased keys
    val cdf = SnapshotTable.changesBetween(spark, t, 3L, 4L).collect()
      .map(r => (r.getString(0), r.getString(r.length - 2))).sorted.toSeq
    assert(cdf == Seq(("u0150", "delete"), ("u0160", "delete")))
    // multi-conjunct delete: range on n AND equality on uid prefix
    val v2 = SnapshotTable.deleteWhereFiltered(spark, t,
      Seq(SnapshotRange("n", BigDecimal(250), BigDecimal(260)),
        SnapshotIn("uid", Set("u0255"))))
    assert(v2 == 5L &&
      SnapshotTable.readSnapshot(spark, t).count() == 297L)
    // time travel to the pre-delete version still works
    assert(SnapshotTable.readSnapshot(spark, t, 3L).count() == 300L)
    // string-key PRUNED MERGE: updates touch one commit's key range
    val t2 = tmp("graft_snap_strmerge") + "/tbl"
    SnapshotTable.writeSnapshot(mk(0, 100), t2)
    SnapshotTable.appendSnapshot(mk(100, 200), t2)
    SnapshotTable.appendSnapshot(mk(200, 300), t2)
    val before2 = SnapshotTable.readSnapshot(spark, t2).inputFiles.toSet
    val upd = Seq(("u0120", 9120L, "V120"), ("u0130", 9130L, "V130"),
      ("u0999", 9999L, "VNEW")).toDF("uid", "n", "v")
    SnapshotTable.mergePruned(upd, t2, "uid")
    val m2 = SnapshotTable.readSnapshot(spark, t2)
    assert(m2.count() == 301L)
    assert(m2.filter($"uid" === "u0120").head().getLong(1) == 9120L)
    assert(m2.filter($"uid" === "u0999").count() == 1L)
    val after2 = m2.inputFiles.toSet
    assert(before2.intersect(after2).nonEmpty,
      "string-key merge rewrote every file (no pruning)")
    // merge CDF: pre/post images for matched keys, insert for the new
    val mcdf = SnapshotTable.changesBetween(spark, t2, 3L, 4L).collect()
      .map(r => (r.getString(0), r.getString(r.length - 2)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(mcdf == Seq(("u0120", "update_postimage"),
      ("u0120", "update_preimage"), ("u0130", "update_postimage"),
      ("u0130", "update_preimage"), ("u0999", "insert")))
  }

  test("snapshot table: UPDATE WHERE rewrites only matched rows in touched files") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    import graft.sources.SnapshotTable.{SnapshotIn, SnapshotRange}
    val t = tmp("graft_snap_upd") + "/tbl"
    // three id-clustered commits -> disjoint per-file id ranges, plus
    // a null-keyed row (never matched by any predicate)
    def frame(lo: Long, hi: Long) =
      (lo until hi).map(i => (Some(i), 10L * i, s"r$i")).toDF("id", "n", "v")
        .repartition(2)
    SnapshotTable.writeSnapshot(frame(0, 200), t)
    SnapshotTable.appendSnapshot(frame(200, 400), t)
    SnapshotTable.appendSnapshot(
      frame(400, 600).unionAll(
        Seq((Option.empty[Long], 7L, "null-key")).toDF("id", "n", "v")), t)
    val before = SnapshotTable.readSnapshot(spark, t)
    val beforeFiles = before.inputFiles.toSet
    // multi-conjunct update: id band ∧ string IN-set — only commit-2
    // files intersect the band; SET references another column
    val v = SnapshotTable.updateWhere(spark, t,
      Seq(SnapshotRange("id", BigDecimal(250), BigDecimal(299)),
        SnapshotIn("v", Set("r250", "r260", "r270"))),
      Map("n" -> (col("n") * 2 + 1), "v" -> concat(col("v"), lit("!"))))
    assert(v == 4L)
    val after = SnapshotTable.readSnapshot(spark, t)
    assert(after.count() == 601L, "UPDATE must not change the row count")
    // exactly the 3 matched rows updated, SET semantics exact
    val upd = after.filter($"v".endsWith("!")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(upd == Seq((250L, 5001L, "r250!"), (260L, 5201L, "r260!"),
      (270L, 5401L, "r270!")))
    // non-matching rows carried unchanged (incl. the null-keyed row)
    assert(after.filter($"id" === 255L).head().getLong(1) == 2550L)
    assert(after.filter($"id".isNull).head().getLong(1) == 7L)
    // untouched files carried VERBATIM; touched commit replaced
    val afterFiles = after.inputFiles.toSet
    assert((beforeFiles intersect afterFiles).nonEmpty,
      "disjoint commits must be carried, not rewritten")
    assert((beforeFiles -- afterFiles).nonEmpty, "touched files replaced")
    // pre-update version intact under time travel
    assert(SnapshotTable.readSnapshot(spark, t, 3)
      .filter($"id" === 250L).head().getString(2) == "r250")
    // the feed carries exactly the pre/post image pairs
    val feed = SnapshotTable.changesBetween(spark, t, 3, 4)
      .collect().map(r => (r.getString(r.length - 2), r.getLong(0),
        r.getLong(1))).sorted.toSeq
    assert(feed == Seq(("update_postimage", 250L, 5001L),
      ("update_postimage", 260L, 5201L), ("update_postimage", 270L, 5401L),
      ("update_preimage", 250L, 2500L), ("update_preimage", 260L, 2600L),
      ("update_preimage", 270L, 2700L)))
    // a no-match update publishes no commit (pruned OR confirmed-empty)
    assert(SnapshotTable.updateWhere(spark, t,
      Seq(SnapshotRange("id", BigDecimal(10000), BigDecimal(10001))),
      Map("n" -> lit(0L))) == 4L)
    assert(SnapshotTable.updateWhere(spark, t,
      Seq(SnapshotRange("id", BigDecimal(250), BigDecimal(299)),
        SnapshotIn("v", Set("no-such-row"))),
      Map("n" -> lit(0L))) == 4L)
    // schema cannot drift: SET is cast to the recorded type
    assert(SnapshotTable.readSnapshot(spark, t).schema ==
      SnapshotTable.readSnapshot(spark, t, 1).schema)
    // updating a PARTITION column re-routes rows to the new value
    val tp = tmp("graft_snap_updp") + "/tbl"
    val pdf = (0 until 90).map(i =>
      (i.toLong, Seq("a", "b", "c")(i % 3))).toDF("id", "b")
    SnapshotTable.writeSnapshotPartitioned(pdf, tp, "b")
    SnapshotTable.updateWhere(spark, tp,
      Seq(SnapshotTable.SnapshotEquals("b", "c")),
      Map("b" -> lit("a")))
    val ptab = SnapshotTable.readSnapshot(spark, tp)
    assert(ptab.filter($"b" === "c").count() == 0L)
    assert(ptab.filter($"b" === "a").count() == 60L)
    // the moved rows' files prune structurally under the NEW value
    val pruned = SnapshotTable.readSnapshotFiltered(spark, tp,
      Seq(SnapshotTable.SnapshotEquals("b", "b")))
    assert(pruned.inputFiles.length < ptab.inputFiles.length)
    assert(pruned.count() == 30L)
  }

  test("snapshot table: OPTIMIZE ZORDER prunes box queries on every clustering dimension") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    import graft.sources.SnapshotTable.SnapshotRange
    val t = tmp("graft_snap_zord") + "/tbl"
    // a 64×64 grid in row-major order: x-sorted files prune x but
    // every file spans ALL of y
    val grid = (0 until 4096).map(i =>
      (i.toLong, (i / 64).toLong, (i % 64).toLong)).toDF("id", "x", "y")
      .repartition(1).sortWithinPartitions("x", "y")
    SnapshotTable.writeSnapshot(grid, t)
    // z-order into ~16 small files (force many output files)
    val v = SnapshotTable.compactZorder(spark, t, Seq("x", "y"),
      targetBytes = 4L << 10, bitsPerCol = 6)
    assert(v == 2L)
    val full = SnapshotTable.readSnapshot(spark, t)
    assert(full.count() == 4096L, "zorder must not change the row set")
    val nFull = full.inputFiles.length
    assert(nFull > 4, s"need multiple z-files to show pruning, got $nFull")
    // rows unchanged => the change feed SKIPS the zorder commit
    assert(SnapshotTable.changesBetween(spark, t, 1L, 2L).count() == 0L)
    // a box query on EACH dimension independently prunes files
    def planned(c: String, lo: Int, hi: Int): Int =
      SnapshotTable.readSnapshotFiltered(spark, t,
        Seq(SnapshotRange(c, BigDecimal(lo), BigDecimal(hi))))
        .inputFiles.length
    assert(planned("x", 0, 7) < nFull, "x-box pruned nothing")
    assert(planned("y", 0, 7) < nFull,
      "y-box pruned nothing — single-column sort order, not z-order")
    // results identical to the unpruned read
    val box = SnapshotTable.readSnapshotFiltered(spark, t,
      Seq(SnapshotRange("x", BigDecimal(10), BigDecimal(20)),
        SnapshotRange("y", BigDecimal(30), BigDecimal(40))))
    val expect = full.filter($"x".between(10, 20) && $"y".between(30, 40))
    assert(box.count() == expect.count())
    assert(box.collect().map(_.getLong(0)).sorted.toSeq ==
      expect.collect().map(_.getLong(0)).sorted.toSeq)
    // the 2-D box plans fewer files than either 1-D slab (the z-curve
    // locality promise)
    assert(box.inputFiles.length <= planned("x", 10, 20))
    assert(box.inputFiles.length <= planned("y", 30, 40))
    // time travel to the pre-zorder layout still works
    assert(SnapshotTable.readSnapshot(spark, t, 1).count() == 4096L)
  }

  test("snapshot table: shallow CLONE branches zero-copy; RESTORE rolls back as a new commit") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val src = tmp("graft_snap_clsrc") + "/tbl"
    def frame(lo: Long, hi: Long) =
      (lo until hi).map(i => (i, s"r$i")).toDF("id", "v").repartition(2)
    SnapshotTable.writeSnapshot(frame(0, 100), src)
    SnapshotTable.appendSnapshot(frame(100, 200), src)
    // shallow clone @ latest: reads equal, ZERO data files copied
    val dst = tmp("graft_snap_cldst") + "/tbl"
    assert(SnapshotTable.cloneSnapshot(spark, src, dst) == 1L)
    val cl = SnapshotTable.readSnapshot(spark, dst)
    assert(cl.count() == 200L)
    assert(cl.inputFiles.toSet ==
      SnapshotTable.readSnapshot(spark, src).inputFiles.toSet,
      "shallow clone must reference the SOURCE files in place")
    // stats carried: a pruned read at the clone plans fewer files
    val pruned = SnapshotTable.readSnapshotFiltered(spark, dst,
      Seq(SnapshotTable.SnapshotRange("id", BigDecimal(0), BigDecimal(50))))
    assert(pruned.inputFiles.length < cl.inputFiles.length)
    assert(pruned.count() == 51L)
    // clone of an OLD version (time-travel branch)
    val dst1 = tmp("graft_snap_cldst1") + "/tbl"
    SnapshotTable.cloneSnapshot(spark, src, dst1, versionAsOf = Some(1L))
    assert(SnapshotTable.readSnapshot(spark, dst1).count() == 100L)
    // divergence: appending to the clone never touches the source
    SnapshotTable.appendSnapshot(frame(500, 510), dst)
    assert(SnapshotTable.readSnapshot(spark, dst).count() == 210L)
    assert(SnapshotTable.readSnapshot(spark, src).count() == 200L)
    assert(SnapshotTable.latestVersion(spark, src) == 2L)
    // cloning onto an existing table is rejected
    intercept[IllegalArgumentException] {
      SnapshotTable.cloneSnapshot(spark, src, dst)
    }
    // RESTORE the source to v1 — a NEW commit, history intact
    val rv = SnapshotTable.restore(spark, src, 1L)
    assert(rv == 3L)
    assert(SnapshotTable.readSnapshot(spark, src).count() == 100L)
    assert(SnapshotTable.readSnapshot(spark, src, 2).count() == 200L)
    // the rollback rides the change feed as file-diff deletes (the
    // v2 append's rows disappear; nothing was re-added)
    val feed = SnapshotTable.changesBetween(spark, src, 2L, 3L)
    assert(feed.count() == 100L)
    assert(feed.select("_change_type").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("delete"))
    assert(feed.agg(min($"id"), max($"id")).head() ==
      org.apache.spark.sql.Row(100L, 199L))
    // restore FORWARD again (undo the rollback): re-adds as inserts
    val rv2 = SnapshotTable.restore(spark, src, 2L)
    assert(rv2 == 4L)
    assert(SnapshotTable.readSnapshot(spark, src).count() == 200L)
    val feed2 = SnapshotTable.changesBetween(spark, src, 3L, 4L)
    assert(feed2.count() == 100L)
    assert(feed2.select("_change_type").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("insert"))
    // restore to the current state is a no-op (no commit)
    assert(SnapshotTable.restore(spark, src, 2L) == 4L)
    // an incremental MV applied over the feed self-heals through the
    // rollback: net algebra of v1..v4 equals the final state
    val net = SnapshotTable.changesBetween(spark, src, 0L)
      .withColumn("sgn", when($"_change_type".isin(
        "insert", "update_postimage"), 1).otherwise(-1))
      .groupBy($"id").agg(sum($"sgn").as("alive"))
      .filter($"alive" > 0)
    assert(net.count() == 200L)
  }
}
