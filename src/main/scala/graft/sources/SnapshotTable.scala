package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Versioned snapshot table (SURVEY.md §2.D D249) — the Delta/Iceberg-
  * class capability gap a warehouse user hits in week one: atomic
  * commits, snapshot isolation for readers, and time travel, built
  * from parquet data files plus a manifest-per-version commit log.
  * The reference persists models as PLAIN parquet directories
  * (reference: RapidsPCA.scala:218-228 — overwrite-in-place, readers
  * of a mid-write directory see torn state); this extends that story
  * the same way the Avro sink extended `_SUCCESS` discipline.
  *
  * Layout:
  * {{{
  *   <table>/data/c-<commitId>/part-*.parquet   immutable data files
  *   <table>/_manifest/v0000000001.manifest     one file per version
  * }}}
  *
  * A manifest is: line 1 the Spark schema JSON, following lines the
  * table-relative data-file paths of THAT version. Data files are
  * immutable once referenced — an overwrite publishes a manifest
  * listing only the new commit's files, an append publishes the old
  * list plus the new files — so every prior version stays readable
  * (time travel) until [[vacuum]] retires it.
  *
  * Commit protocol (why readers never see torn state):
  *  1. the writer lands data files under `data/c-<commitId>/`, a
  *     directory no manifest references yet — readers cannot see them;
  *  2. the writer then creates `_manifest/v{N+1}.manifest` with
  *     create(overwrite = false): create-if-absent is the atomicity
  *     primitive, so of two racing writers targeting the same version
  *     exactly ONE wins;
  *  3. the loser's data files are orphans (vacuum reclaims them); the
  *     loser RETRIES manifest publication at the next version number —
  *     last-commit-wins for overwrites, both-commits-land for appends
  *     (the retry re-reads the then-latest file list).
  *
  * Scale notes: the manifest holds file PATHS, not data — listing cost
  * is O(files), and readers plan a scan from the explicit file list
  * (no directory listing of `data/`, which at 100 TB holds millions of
  * files across dead commits). Readers pass the manifest's schema
  * explicitly so a read never pays an inference footer pass.
  */
object SnapshotTable {

  private def conf(spark: SparkSession): Configuration =
    spark.sparkContext.hadoopConfiguration

  private def manifestDir(path: String) = new HPath(path, "_manifest")

  private def manifestPath(path: String, v: Long) =
    new HPath(manifestDir(path), f"v$v%010d.manifest")

  private def versionOf(p: HPath): Option[Long] = {
    val n = p.getName
    if (n.startsWith("v") && n.endsWith(".manifest"))
      n.stripPrefix("v").stripSuffix(".manifest").toLongOption
    else None
  }

  /** Committed versions, ascending (empty for a nonexistent table). */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val dir = manifestDir(path)
    val fs = dir.getFileSystem(conf(spark))
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.flatMap(s => versionOf(s.getPath)).sorted
  }

  /** Latest committed version, or 0 for an empty/nonexistent table. */
  def latestVersion(spark: SparkSession, path: String): Long =
    versions(spark, path).lastOption.getOrElse(0L)

  private final case class Manifest(schema: StructType, files: Seq[String],
      batchId: Option[Long] = None)

  private def readManifest(fs: FileSystem, path: String, v: Long): Manifest = {
    val in = fs.open(manifestPath(path, v))
    val text = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    val lines = text.split("\n").toSeq.filter(_.nonEmpty)
    // '#'-prefixed lines are commit metadata (e.g. the streaming batch
    // tag); absent in pre-tag manifests, so old tables stay readable
    val (meta, body) = lines.tail.partition(_.startsWith("#"))
    val batch = meta.collectFirst {
      case l if l.startsWith("#batch=") => l.stripPrefix("#batch=").toLong
    }
    Manifest(DataType.fromJson(lines.head).asInstanceOf[StructType],
      body, batch)
  }

  /** Atomic publication; false = lost the race. The body is written
    * COMPLETELY to a writer-unique temp name and only then renamed
    * into place, so a reader (or a writer crash) can never observe a
    * torn or empty manifest — the version either exists whole or not
    * at all. The exists-check + rename is the mutex: on HDFS-like
    * stores rename-to-existing fails outright; on the local FS the
    * residual check-to-rename window is far narrower than the old
    * create-then-write one, and both sides' bodies are complete, so
    * the worst local-FS race outcome is last-writer-wins on ONE
    * version number (exactly the documented overwrite semantics). */
  private def tryPublish(fs: FileSystem, path: String, v: Long,
      m: Manifest): Boolean = {
    val target = manifestPath(path, v)
    if (fs.exists(target)) return false
    val tmp = new HPath(manifestDir(path),
      s".v$v.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try {
      val tag = m.batchId.map(b => s"#batch=$b").toSeq
      val body = (m.schema.json +: (tag ++ m.files)).mkString("\n")
      out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } finally out.close()
    if (fs.exists(target) || !fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      false
    } else true
  }

  /** Land one commit's data files; returns table-relative paths.
    * An empty frame commits zero files (a valid, empty version). */
  private def landDataFiles(df: DataFrame, path: String,
      commitId: String): Seq[String] = {
    val rel = s"data/c-$commitId"
    val dataDir = new HPath(path, rel)
    df.write.mode("errorifexists").parquet(dataDir.toString)
    val fs = dataDir.getFileSystem(conf(df.sparkSession))
    fs.listStatus(dataDir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => s"$rel/${s.getPath.getName}").sorted
  }

  /** Commit `df` as the table's next version. `overwrite = true`
    * replaces the visible contents; `false` appends to them. Returns
    * the committed version number. Readers concurrent with this call
    * see either the previous version or the new one, never a mix. */
  def writeSnapshot(df: DataFrame, path: String,
      overwrite: Boolean = true): Long =
    writeTagged(df, path, overwrite, batchId = None)

  private def writeTagged(df: DataFrame, path: String, overwrite: Boolean,
      batchId: Option[Long]): Long = {
    val spark = df.sparkSession
    val fs = new HPath(path).getFileSystem(conf(spark))
    fs.mkdirs(manifestDir(path))
    val commitId = java.util.UUID.randomUUID().toString
    val newFiles = landDataFiles(df, path, commitId)
    // publish loop: create-if-absent is the mutex; on a lost race,
    // re-resolve the latest version (appends must fold in the winner's
    // files) and retry at the next number
    var committed = -1L
    while (committed < 0) {
      val latest = latestVersion(spark, path)
      val base =
        if (overwrite || latest == 0) Seq.empty
        else readManifest(fs, path, latest).files
      if (!overwrite && latest > 0) {
        val prior = readManifest(fs, path, latest).schema
        require(prior == df.schema,
          s"append schema mismatch: table has $prior, frame has ${df.schema}")
      }
      if (tryPublish(fs, path, latest + 1,
          Manifest(df.schema, base ++ newFiles, batchId)))
        committed = latest + 1
    }
    committed
  }

  def appendSnapshot(df: DataFrame, path: String): Long =
    writeSnapshot(df, path, overwrite = false)

  /** The streaming batch tag of the latest commit, if it has one. */
  def latestBatchId(spark: SparkSession, path: String): Option[Long] = {
    val vs = versions(spark, path)
    if (vs.isEmpty) None
    else {
      val fs = new HPath(path).getFileSystem(conf(spark))
      readManifest(fs, path, vs.last).batchId
    }
  }

  /** Exactly-once streaming append: commit `df` as the next version
    * TAGGED with the micro-batch id. The tag rides INSIDE the atomic
    * manifest publication, so a foreachBatch RETRY of an
    * already-committed batch — Structured Streaming's failure mode
    * after a crash between epoch commit and checkpoint advance — is
    * detected from the latest manifest and skipped, not re-appended.
    * (Batch ids arrive in order per query, so checking the LATEST
    * tag suffices.) Returns the committed version, or None if the
    * batch had already landed. */
  def appendBatch(df: DataFrame, path: String, batchId: Long): Option[Long] = {
    if (latestBatchId(df.sparkSession, path).exists(_ >= batchId)) None
    else Some(writeTagged(df, path, overwrite = false, Some(batchId)))
  }

  /** Streaming sink: every micro-batch lands as one committed,
    * batch-tagged snapshot version — the CDC-to-versioned-table
    * landing pattern, exactly-once by [[appendBatch]]'s idempotence.
    * Caller owns the query lifecycle. */
  def streamAppend(df: DataFrame, path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) =>
        appendBatch(batch.toDF(), path, id); ()
      }
      .outputMode("append")
      .start()

  /** Read a committed version (default -1 = latest). The scan plans
    * from the manifest's explicit file list with its recorded schema —
    * no directory listing, no schema inference. */
  def readSnapshot(spark: SparkSession, path: String,
      version: Long = -1L): DataFrame = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"no committed versions under $path")
    val v = if (version < 0) vs.last else version
    require(vs.contains(v), s"version $v not in committed set $vs")
    val fs = new HPath(path).getFileSystem(conf(spark))
    val m = readManifest(fs, path, v)
    if (m.files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        m.schema)
    else
      spark.read.schema(m.schema)
        .parquet(m.files.map(f => new HPath(path, f).toString): _*)
  }

  /** Copy-on-write upsert (MERGE-lite): commit a version whose
    * contents are the current snapshot with `updates` rows replacing
    * same-key rows and new-key rows appended — the CDC-apply step
    * (q33's semantics) landed as a TABLE operation, so readers time
    * travel across merge generations. The rewrite is full-snapshot:
    * right for the dimension-sized tables merges target (SCD feeds,
    * registries); a data-scale MERGE needs file-level pruning of
    * untouched files, deliberately out of scope here. Returns the
    * committed version. */
  def merge(updates: DataFrame, path: String,
      keyCols: Seq[String]): Long = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val spark = updates.sparkSession
    if (versions(spark, path).isEmpty)
      return writeSnapshot(updates, path)
    val cur = readSnapshot(spark, path)
    // names + types must line up; nullability may differ (a parquet
    // read-back is nullable even when the writing frame was not)
    require(cur.schema.map(f => (f.name, f.dataType)) ==
        updates.schema.map(f => (f.name, f.dataType)),
      s"merge schema mismatch: table has ${cur.schema}, " +
        s"updates have ${updates.schema}")
    val survivors = cur.join(
      updates.select(keyCols.map(org.apache.spark.sql.functions.col): _*),
      keyCols, "left_anti")
    writeSnapshot(survivors.unionAll(updates), path)
  }

  /** Default vacuum grace: unreferenced files younger than this are
    * presumed to belong to an IN-FLIGHT commit (landed but not yet
    * published) and are left alone — the Delta/Iceberg retention
    * idea, sized to any sane commit duration. */
  val vacuumMinAgeMs: Long = 10 * 60 * 1000L

  /** Retire history: keep the newest `keepVersions` manifests, delete
    * older ones plus every data file no kept manifest references
    * (orphans from lost commit races included) that is older than
    * `minAgeMs`. The age floor is what makes vacuum safe to run
    * concurrently with writers: a commit's files land BEFORE its
    * manifest publishes, so a freshly-landed unreferenced file may be
    * seconds from becoming referenced — deleting it would publish a
    * manifest pointing at nothing. Readers of retired versions fail
    * loudly on the missing manifest rather than half-reading deleted
    * files. */
  def vacuum(spark: SparkSession, path: String, keepVersions: Int = 1,
      minAgeMs: Long = vacuumMinAgeMs): Unit = {
    require(keepVersions >= 1, "must keep at least one version")
    val fs = new HPath(path).getFileSystem(conf(spark))
    val vs = versions(spark, path)
    if (vs.isEmpty) return
    val (drop, keep) = vs.splitAt(math.max(0, vs.length - keepVersions))
    val live = keep.flatMap(v => readManifest(fs, path, v).files).toSet
    val cutoff = System.currentTimeMillis() - minAgeMs
    // delete old-enough unreferenced data files (then empty commit dirs)
    val dataDir = new HPath(path, "data")
    if (fs.exists(dataDir)) {
      fs.listStatus(dataDir).foreach { cd =>
        if (cd.isDirectory) {
          fs.listStatus(cd.getPath).foreach { f =>
            val rel = s"data/${cd.getPath.getName}/${f.getPath.getName}"
            if (!live.contains(rel) && f.getModificationTime < cutoff)
              fs.delete(f.getPath, false)
          }
          if (fs.listStatus(cd.getPath).isEmpty) fs.delete(cd.getPath, false)
        }
      }
    }
    drop.foreach(v => fs.delete(manifestPath(path, v), false))
  }
}
