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

  /** Per-file column stats: file → (col → (min, max)) as decimal
    * strings (Long.toString / Double.toString — both round-trip). */
  private type FileStats = Map[String, Map[String, (String, String)]]

  private final case class Manifest(schema: StructType, files: Seq[String],
      batchId: Option[Long] = None, stats: FileStats = Map.empty)

  /** One `#stats=` manifest line per file:
    * `#stats=<rel>|<col>=<min>,<max>|...` — rel paths are
    * writer-generated (UUID commit dirs + part names) and column names
    * are schema identifiers, so the `|`/`=`/`,` delimiters are safe. */
  private def statsLine(rel: String, cols: Map[String, (String, String)]) =
    s"#stats=$rel" + cols.toSeq.sortBy(_._1)
      .map { case (c, (mn, mx)) => s"|$c=$mn,$mx" }.mkString

  private def parseStatsLine(l: String): (String, Map[String, (String, String)]) = {
    val parts = l.stripPrefix("#stats=").split("\\|").toSeq
    (parts.head, parts.tail.flatMap { p =>
      val eq = p.indexOf('=')
      val comma = p.indexOf(',', eq + 1)
      if (eq < 0 || comma < 0) None
      else Some(p.substring(0, eq) ->
        (p.substring(eq + 1, comma), p.substring(comma + 1)))
    }.toMap)
  }

  private def readManifest(fs: FileSystem, path: String, v: Long): Manifest = {
    val in = fs.open(manifestPath(path, v))
    val text = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    val lines = text.split("\n").toSeq.filter(_.nonEmpty)
    // '#'-prefixed lines are commit metadata (the streaming batch tag,
    // per-file column stats); absent in pre-tag manifests, so old
    // tables stay readable
    val (meta, body) = lines.tail.partition(_.startsWith("#"))
    val batch = meta.collectFirst {
      case l if l.startsWith("#batch=") => l.stripPrefix("#batch=").toLong
    }
    val stats: FileStats = meta.filter(_.startsWith("#stats="))
      .map(parseStatsLine).toMap
    Manifest(DataType.fromJson(lines.head).asInstanceOf[StructType],
      body, batch, stats)
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
      val statLines = m.files.flatMap(f =>
        m.stats.get(f).filter(_.nonEmpty).map(statsLine(f, _)))
      val body = (m.schema.json +: (tag ++ statLines ++ m.files))
        .mkString("\n")
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

  /** Column types with manifest min/max stats (the numeric atomics —
    * the classic skipping keys; date/timestamp/string skipping is a
    * straightforward extension via their underlying representations). */
  private def isStatType(t: DataType): Boolean = t match {
    case org.apache.spark.sql.types.ByteType |
         org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.LongType |
         org.apache.spark.sql.types.FloatType |
         org.apache.spark.sql.types.DoubleType => true
    case _ => false
  }

  /** One bounded job over the just-landed files computing per-file
    * min/max of every stat-typed column — the Delta-style write-side
    * stats pass (one row per landed file, grouped on
    * `input_file_name`; cost is a re-scan of THIS commit's files
    * only, never the table). */
  private def collectStats(df: DataFrame, path: String, rel: String,
      files: Seq[String]): FileStats = {
    import org.apache.spark.sql.functions.{col, input_file_name, max, min}
    val statCols = df.schema.fields.toSeq
      .filter(f => isStatType(f.dataType)).map(_.name)
    if (statCols.isEmpty || files.isEmpty) return Map.empty
    val dataDir = new HPath(path, rel)
    val aggs = statCols.flatMap(c => Seq(
      min(col(c)).cast("string").as(s"mn_$c"),
      max(col(c)).cast("string").as(s"mx_$c")))
    val rows = df.sparkSession.read.schema(df.schema)
      .parquet(dataDir.toString)
      .groupBy(input_file_name().as("f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    rows.map { r =>
      val name = r.getString(0).split('/').last
      val cols = statCols.zipWithIndex.flatMap { case (c, i) =>
        val mn = r.getString(1 + 2 * i)
        val mx = r.getString(2 + 2 * i)
        if (mn == null || mx == null) None else Some(c -> (mn, mx))
      }.toMap
      s"$rel/$name" -> cols
    }.toMap
  }

  /** Commit `df` as the table's next version. `overwrite = true`
    * replaces the visible contents; `false` appends to them. Returns
    * the committed version number. Readers concurrent with this call
    * see either the previous version or the new one, never a mix.
    *
    * Batch-tag semantics: an untagged APPEND (or merge) coexists with
    * a maintaining stream, so it carries the stream's replay tag
    * forward; an untagged full OVERWRITE REPURPOSES the table (its
    * contents no longer derive from the stream), so it resets the tag
    * — a replacement stream with a fresh checkpoint starts clean. */
  def writeSnapshot(df: DataFrame, path: String,
      overwrite: Boolean = true): Long =
    writeTagged(df, path, overwrite, batchId = None,
      carryTag = !overwrite)

  /** Schema-evolution union: the table's column order first, the
    * frame's NEW columns appended. Same-name columns must agree on
    * type; a column either side might not populate (new column — old
    * files lack it; dropped-from-frame column — new files lack it)
    * becomes nullable, which is exactly how the parquet reader fills
    * the holes. */
  private def unionSchema(table: StructType, frame: StructType): StructType = {
    frame.fields.foreach { f =>
      table.fields.find(_.name == f.name).foreach { tf =>
        require(tf.dataType == f.dataType,
          s"schema evolution type conflict on '${f.name}': " +
            s"table has ${tf.dataType}, frame has ${f.dataType}")
      }
    }
    val kept = table.fields.map { tf =>
      frame.fields.find(_.name == tf.name) match {
        case Some(f) => tf.copy(nullable = tf.nullable || f.nullable)
        case None => tf.copy(nullable = true)
      }
    }
    val extra = frame.fields
      .filterNot(f => table.fieldNames.contains(f.name))
      .map(_.copy(nullable = true))
    StructType(kept ++ extra)
  }

  private def writeTagged(df: DataFrame, path: String, overwrite: Boolean,
      batchId: Option[Long], evolve: Boolean = false,
      carryTag: Boolean = true): Long = {
    val spark = df.sparkSession
    val fs = new HPath(path).getFileSystem(conf(spark))
    fs.mkdirs(manifestDir(path))
    val commitId = java.util.UUID.randomUUID().toString
    val newFiles = landDataFiles(df, path, commitId)
    val newStats = collectStats(df, path, s"data/c-$commitId", newFiles)
    // only commits that FOLD IN prior state (appends/evolution) or
    // carry its tag open the prior manifest — a plain overwrite stays
    // immune to concurrent vacuum retiring that manifest
    val needsPrior = !overwrite || carryTag
    // publish loop: create-if-absent is the mutex; on a lost race,
    // re-resolve the latest version (appends must fold in the winner's
    // files and stats) and retry at the next number
    var committed = -1L
    while (committed < 0) {
      val latest = latestVersion(spark, path)
      val prior =
        if (latest == 0 || !needsPrior) None
        else
          // a concurrent vacuum can retire `latest` between the listing
          // and this read — treat it as a lost race and re-resolve
          try Some(readManifest(fs, path, latest))
          catch { case _: java.io.FileNotFoundException => None }
      if (latest == 0 || !needsPrior || prior.isDefined) {
        val (schema, base, baseStats) =
          if (overwrite || latest == 0)
            (df.schema, Seq.empty[String], Map.empty: FileStats)
          else if (evolve)
            (unionSchema(prior.get.schema, df.schema),
              prior.get.files, prior.get.stats)
          else {
            val m = prior.get
            // names + types must line up; nullability may differ (a
            // parquet read-back is nullable even when the writing frame
            // was not — the merge() tolerance, applied here too); the
            // TABLE's recorded schema stays authoritative
            require(m.schema.map(f => (f.name, f.dataType)) ==
                df.schema.map(f => (f.name, f.dataType)),
              s"append schema mismatch: table has ${m.schema}, " +
                s"frame has ${df.schema}")
            (m.schema, m.files, m.stats)
          }
        // carry the max seen batch tag forward through untagged
        // APPENDS/MERGES (an operator write between a tagged commit and
        // its foreachBatch retry must not blind the replay guard);
        // untagged OVERWRITES repurpose the table and reset it
        val tag =
          if (carryTag) (batchId.toSeq ++ prior.flatMap(_.batchId)).maxOption
          else batchId
        if (tryPublish(fs, path, latest + 1,
            Manifest(schema, base ++ newFiles, tag, baseStats ++ newStats)))
          committed = latest + 1
      }
    }
    committed
  }

  def appendSnapshot(df: DataFrame, path: String): Long =
    writeSnapshot(df, path, overwrite = false)

  /** D270: schema-evolving append — commit `df` whose schema may ADD
    * columns to the table (recorded schema becomes the union; old
    * files read the new columns as null) or OMIT existing ones (new
    * files read them as null). Same-name type conflicts are rejected
    * before anything commits. This is the Delta `mergeSchema` move:
    * at 100 TB a new feature column must not force a table rewrite —
    * the manifest's recorded schema evolves, the immutable data files
    * do not. */
  def appendEvolve(df: DataFrame, path: String): Long =
    writeTagged(df, path, overwrite = false, batchId = None, evolve = true)

  /** Versions with their manifest commit times (ascending). */
  def versionTimes(spark: SparkSession, path: String): Seq[(Long, Long)] = {
    val dir = manifestDir(path)
    val fs = dir.getFileSystem(conf(spark))
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .flatMap(s => versionOf(s.getPath).map(_ -> s.getModificationTime))
      .sortBy(_._1)
  }

  /** TIMESTAMP AS OF: the newest version committed at or before
    * `tsMillis` (manifest publication time — the rename is the commit
    * instant). Fails loudly when the table did not exist yet. */
  def versionAsOf(spark: SparkSession, path: String, tsMillis: Long): Long = {
    val eligible = versionTimes(spark, path).filter(_._2 <= tsMillis)
    require(eligible.nonEmpty,
      s"no version committed at or before $tsMillis under $path")
    eligible.map(_._1).max
  }

  def readSnapshotAsOf(spark: SparkSession, path: String,
      tsMillis: Long): DataFrame =
    readSnapshot(spark, path, versionAsOf(spark, path, tsMillis))

  /** The highest streaming batch tag committed so far. Untagged
    * APPENDS/MERGES carry the previous tag forward, so an operator
    * write interleaved between a tagged commit and its foreachBatch
    * retry cannot blind the replay guard; an untagged full OVERWRITE
    * repurposes the table and RESETS the tag, so a replacement stream
    * with a fresh checkpoint starts clean. Batch ids are per-query:
    * one table is maintained by one stream (the D255 contract). */
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

  /** Exactly-once streaming OVERWRITE: commit `df` as the next version
    * replacing the visible contents, tagged with the micro-batch id —
    * [[appendBatch]]'s idempotence contract for view-refresh sinks,
    * where each batch publishes the WHOLE refreshed view (no survivor
    * anti-join needed: the new version's keys are a superset by
    * construction). */
  def overwriteBatch(df: DataFrame, path: String,
      batchId: Long): Option[Long] = {
    if (latestBatchId(df.sparkSession, path).exists(_ >= batchId)) None
    else Some(writeTagged(df, path, overwrite = true, Some(batchId)))
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

  /** D264: manifest-stats data skipping — read `version` filtered to
    * `column ∈ [lo, hi]`, planning ONLY the data files whose recorded
    * per-file [min, max] intersects the range (files without stats —
    * legacy manifests, all-null columns — are read: pruning is
    * conservative, never lossy). The exact filter still applies on
    * top, so the result is IDENTICAL to filtering [[readSnapshot]];
    * the stats only delete I/O. At 100 TB file counts this is the
    * difference between a scan and a seek: time-keyed or id-clustered
    * commits give near-disjoint per-file ranges, so a point/range
    * lookup plans O(1) files out of millions — decided entirely from
    * the manifest, zero parquet footer reads. Bounds compare as
    * BigDecimal against the recorded decimal strings (exact past
    * 2⁵³ where a double round-trip would mis-prune). */
  def readSnapshotRange(spark: SparkSession, path: String, column: String,
      lo: BigDecimal, hi: BigDecimal, version: Long = -1L): DataFrame = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"no committed versions under $path")
    val v = if (version < 0) vs.last else version
    require(vs.contains(v), s"version $v not in committed set $vs")
    val fs = new HPath(path).getFileSystem(conf(spark))
    val m = readManifest(fs, path, v)
    require(m.schema.fieldNames.contains(column),
      s"no column $column in ${m.schema.fieldNames.mkString(", ")}")
    def keep(f: String): Boolean =
      m.stats.get(f).flatMap(_.get(column)) match {
        case Some((mn, mx)) =>
          (try Some((BigDecimal(mn), BigDecimal(mx)))
           catch { case _: NumberFormatException => None }) // NaN etc.
            .forall { case (a, b) => b >= lo && a <= hi }
        case None => true
      }
    val files = m.files.filter(keep)
    val base =
      if (files.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], m.schema)
      else spark.read.schema(m.schema)
        .parquet(files.map(f => new HPath(path, f).toString): _*)
    // typed column/literal comparison (not SQL-text interpolation):
    // survives identifier-unfriendly column names, and a long column
    // vs a decimal literal widens to DECIMAL — exact past 2^53, where
    // a double literal would silently round
    import org.apache.spark.sql.functions.{col, lit}
    base.filter(col(column) >= lit(lo) && col(column) <= lit(hi))
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
      keyCols: Seq[String]): Long =
    mergeTagged(updates, path, keyCols, batchId = None)

  private def mergeTagged(updates: DataFrame, path: String,
      keyCols: Seq[String], batchId: Option[Long]): Long = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val spark = updates.sparkSession
    if (versions(spark, path).isEmpty)
      return writeTagged(updates, path, overwrite = true, batchId)
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
    writeTagged(survivors.unionAll(updates), path, overwrite = true, batchId)
  }

  /** Exactly-once streaming MERGE: the [[appendBatch]] idempotence
    * contract applied to upserts — a foreachBatch retry of an
    * already-merged micro-batch is detected from the latest manifest's
    * batch tag and skipped (the tag rides inside the same atomic
    * manifest publication as the merge itself, so there is no window
    * where the data landed but the tag did not). */
  def mergeBatch(updates: DataFrame, path: String, keyCols: Seq[String],
      batchId: Long): Option[Long] = {
    if (latestBatchId(updates.sparkSession, path).exists(_ >= batchId)) None
    else Some(mergeTagged(updates, path, keyCols, Some(batchId)))
  }

  /** D274: stats-pruned copy-on-write MERGE — the file-level pruning
    * [[merge]] documents as its scale extension, now that manifests
    * carry per-file column stats (D264). Only data files whose
    * recorded [min, max] on `keyCol` intersects the updates' key
    * range are rewritten (survivor anti-join ∪ updates); every other
    * file is carried into the new manifest VERBATIM, stats included —
    * at 100 TB a CDC batch touching one day's keys rewrites a handful
    * of files, not the table. Files without stats are conservatively
    * treated as touched. The key-range rule is range-based, so sparse
    * update keys inside a wide range still rewrite the whole range —
    * the standard Delta-style trade (exactness would need per-key
    * bloom pruning). Concurrency: last-commit-wins like [[merge]];
    * on a lost publish race the WHOLE merge re-runs against the new
    * latest (the losers' landed files become vacuum orphans). */
  def mergePruned(updates: DataFrame, path: String, keyCol: String): Long = {
    val spark = updates.sparkSession
    if (versions(spark, path).isEmpty)
      return writeSnapshot(updates, path)
    val fs = new HPath(path).getFileSystem(conf(spark))
    import org.apache.spark.sql.functions.{col, max, min}
    val r = updates.agg(min(col(keyCol)), max(col(keyCol))).head()
    if (r.isNullAt(0)) return latestVersion(spark, path) // empty: no-op
    val lo = BigDecimal(r.get(0).toString)
    val hi = BigDecimal(r.get(1).toString)
    var committed = -1L
    while (committed < 0) {
      val latest = latestVersion(spark, path)
      val m =
        try readManifest(fs, path, latest)
        catch { case _: java.io.FileNotFoundException => null } // re-resolve
      if (m != null) {
        require(m.schema.map(f => (f.name, f.dataType)) ==
            updates.schema.map(f => (f.name, f.dataType)),
          s"merge schema mismatch: table has ${m.schema}, " +
            s"updates have ${updates.schema}")
        def touchedFile(f: String): Boolean =
          m.stats.get(f).flatMap(_.get(keyCol)) match {
            case Some((mn, mx)) =>
              (try Some((BigDecimal(mn), BigDecimal(mx)))
               catch { case _: NumberFormatException => None })
                .forall { case (a, b) => b >= lo && a <= hi }
            case None => true // no stats: conservatively rewrite
          }
        val (touched, untouched) = m.files.partition(touchedFile)
        val touchedDf =
          if (touched.isEmpty)
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], m.schema)
          else spark.read.schema(m.schema)
            .parquet(touched.map(f => new HPath(path, f).toString): _*)
        val survivors = touchedDf.join(
          updates.select(col(keyCol)), Seq(keyCol), "left_anti")
        val rewritten = survivors.unionAll(
          updates.select(m.schema.fieldNames.map(col): _*))
        val commitId = java.util.UUID.randomUUID().toString
        val newFiles = landDataFiles(rewritten, path, commitId)
        val newStats =
          collectStats(rewritten, path, s"data/c-$commitId", newFiles)
        val untouchedSet = untouched.toSet
        val keepStats = m.stats.filter { case (f, _) => untouchedSet(f) }
        if (tryPublish(fs, path, latest + 1,
            Manifest(m.schema, untouched ++ newFiles,
              m.batchId, keepStats ++ newStats)))
          committed = latest + 1
      }
    }
    committed
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
    // delete old-enough unreferenced data FILES (subdirectories — e.g.
    // an in-flight write's _temporary — are left to their writer), then
    // drained commit dirs; empty-dir races with a concurrent writer are
    // benign, so the delete result is ignored rather than required
    val dataDir = new HPath(path, "data")
    if (fs.exists(dataDir)) {
      fs.listStatus(dataDir).foreach { cd =>
        if (cd.isDirectory) {
          fs.listStatus(cd.getPath).foreach { f =>
            val rel = s"data/${cd.getPath.getName}/${f.getPath.getName}"
            if (f.isFile && !live.contains(rel) &&
                f.getModificationTime < cutoff)
              fs.delete(f.getPath, false)
          }
          if (fs.listStatus(cd.getPath).isEmpty) {
            fs.delete(cd.getPath, false); ()
          }
        }
      }
    }
    // reclaim temp manifests orphaned by writer crashes (tryPublish
    // deletes its temp only on a LOST race; a crash before rename
    // leaves it forever otherwise)
    fs.listStatus(manifestDir(path)).foreach { f =>
      if (f.isFile && f.getPath.getName.startsWith(".v") &&
          f.getModificationTime < cutoff)
        fs.delete(f.getPath, false)
    }
    drop.foreach(v => fs.delete(manifestPath(path, v), false))
  }
}
