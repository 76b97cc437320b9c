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
      batchId: Option[Long] = None, stats: FileStats = Map.empty,
      partCol: Option[String] = None, dataChange: Boolean = true)

  /** Column references by NAME must not re-parse as nested-field paths
    * (a name with a dot) — backtick-quote everywhere a schema name
    * feeds `col(...)`. */
  private def qcol(name: String) =
    org.apache.spark.sql.functions.col(s"`${name.replace("`", "``")}`")

  /** Manifest-line field escaping: column names (any legal Spark
    * identifier, `|`/`=`/`,` included) and stat VALUES (string
    * partition keys since D276) travel inside delimiter-structured
    * `#stats=` lines, so the delimiters, '%', and line breaks are
    * %XX-escaped. Decoding a legacy un-escaped numeric value is the
    * identity ('%' never appears in decimal strings), so pre-escape
    * manifests stay readable. */
  private def esc(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case c @ ('%' | '|' | '=' | ',' | '\n' | '\r') =>
        sb.append(f"%%${c.toInt}%02X")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def unesc(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '%' && i + 2 < s.length) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** One `#stats=` manifest line per file:
    * `#stats=<rel>|<col>=<min>,<max>|...`; rel paths are
    * writer-generated (UUID commit dirs + part names) so they carry no
    * delimiters, and names/values are %XX-escaped ([[esc]]). */
  private def statsLine(rel: String, cols: Map[String, (String, String)]) =
    s"#stats=$rel" + cols.toSeq.sortBy(_._1)
      .map { case (c, (mn, mx)) => s"|${esc(c)}=${esc(mn)},${esc(mx)}" }
      .mkString

  private def parseStatsLine(l: String): (String, Map[String, (String, String)]) = {
    val parts = l.stripPrefix("#stats=").split("\\|").toSeq
    (parts.head, parts.tail.flatMap { p =>
      val eq = p.indexOf('=')
      val comma = p.indexOf(',', eq + 1)
      if (eq < 0 || comma < 0) None
      else Some(unesc(p.substring(0, eq)) ->
        (unesc(p.substring(eq + 1, comma)), unesc(p.substring(comma + 1))))
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
    val partCol = meta.collectFirst {
      case l if l.startsWith("#partcol=") =>
        unesc(l.stripPrefix("#partcol="))
    }
    Manifest(DataType.fromJson(lines.head).asInstanceOf[StructType],
      body, batch, stats, partCol,
      dataChange = !meta.contains("#nodatachange"))
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
      val part = m.partCol.map(c => s"#partcol=${esc(c)}").toSeq
      val change = if (m.dataChange) Seq.empty else Seq("#nodatachange")
      val statLines = m.files.flatMap(f =>
        m.stats.get(f).filter(_.nonEmpty).map(statsLine(f, _)))
      val body = (m.schema.json +:
        (tag ++ part ++ change ++ statLines ++ m.files)).mkString("\n")
      out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } finally out.close()
    if (fs.exists(target) || !fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      false
    } else true
  }

  /** The duplicated-partition-key directory column: partitioned
    * commits write `data/c-<id>/__graft_pv=<v>/part-*.parquet` so
    * every data file holds exactly ONE partition value, but the real
    * column stays IN the files (the directory key is a write-side
    * routing duplicate), so readers never depend on path inference. */
  private val PvDir = "__graft_pv"

  /** Land one commit's data files; returns table-relative paths.
    * An empty frame commits zero files (a valid, empty version).
    * With `partitionBy`, files are split so each holds one partition
    * value (the structural-pruning invariant D276 reads rely on). */
  private def landDataFiles(df: DataFrame, path: String,
      commitId: String, partitionBy: Option[String] = None): Seq[String] = {
    val rel = s"data/c-$commitId"
    val dataDir = new HPath(path, rel)
    partitionBy match {
      case Some(p) =>
        df.withColumn(PvDir, qcol(p))
          .write.mode("errorifexists").partitionBy(PvDir)
          .parquet(dataDir.toString)
      case None =>
        df.write.mode("errorifexists").parquet(dataDir.toString)
    }
    val fs = dataDir.getFileSystem(conf(df.sparkSession))
    val it = fs.listFiles(dataDir, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    val marker = s"/c-$commitId/"
    while (it.hasNext) {
      val s = it.next()
      val p = s.getPath.toUri.getPath
      if (s.getPath.getName.endsWith(".parquet")) {
        val i = p.indexOf(marker)
        require(i >= 0, s"landed file $p escaped commit dir $rel")
        buf += s"$rel/${p.substring(i + marker.length)}"
      }
    }
    buf.toSeq.sorted
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

  /** Conservative file-range vs query-range intersection test. For
    * INTEGRAL columns the recorded decimal strings are exact, so the
    * BigDecimal compare is too. For FLOAT/DOUBLE columns the compare
    * runs in double space with the file bounds widened by one ulp
    * each way — the residual filter also compares in double space, so
    * a query bound falling strictly between the stats string's decimal
    * value and the binary extremum can never prune a file whose rows
    * would pass the filter (NaN extrema loosen to ±∞: Spark's max is
    * NaN whenever ANY value is NaN, which says nothing about the
    * rest). Unparseable stats keep the file. */
  private def statsIntersect(mn: String, mx: String, lo: BigDecimal,
      hi: BigDecimal, floating: Boolean): Boolean =
    if (floating) {
      try {
        val mnD = mn.toDouble
        val mxD = mx.toDouble
        val fileLo =
          if (mnD.isNaN) Double.NegativeInfinity else math.nextDown(mnD)
        val fileHi =
          if (mxD.isNaN) Double.PositiveInfinity else math.nextUp(mxD)
        fileHi >= math.nextDown(lo.toDouble) &&
          fileLo <= math.nextUp(hi.toDouble)
      } catch { case _: NumberFormatException => true }
    } else {
      (try Some((BigDecimal(mn), BigDecimal(mx)))
       catch { case _: NumberFormatException => None })
        .forall { case (a, b) => b >= lo && a <= hi }
    }

  /** One bounded job over the just-landed files computing per-file
    * min/max of every stat-typed column — the Delta-style write-side
    * stats pass (one row per landed file, grouped on
    * `input_file_name`; cost is a re-scan of THIS commit's files
    * only, never the table). `forceCols` (the partition column) is
    * included whatever its type — its per-file min == max by the
    * [[landDataFiles]] layout, which is what equality pruning reads.
    * Files are read by EXPLICIT path (not the directory) so the
    * partitioned `__graft_pv=` subdirs never trigger inference. */
  private def collectStats(spark: SparkSession, schema: StructType,
      path: String, commitRel: String, files: Seq[String],
      forceCols: Seq[String] = Seq.empty): FileStats = {
    import org.apache.spark.sql.functions.{input_file_name, max, min}
    val statCols = (schema.fields.toSeq
      .filter(f => isStatType(f.dataType)).map(_.name) ++ forceCols)
      .distinct.filter(schema.fieldNames.contains)
    if (statCols.isEmpty || files.isEmpty) return Map.empty
    val aggs = statCols.zipWithIndex.flatMap { case (c, i) => Seq(
      min(qcol(c)).cast("string").as(s"mn_$i"),
      max(qcol(c)).cast("string").as(s"mx_$i")) }
    val marker = "/" + commitRel.stripPrefix("data/") + "/"
    val rows = spark.read.schema(schema)
      .parquet(files.map(f => new HPath(path, f).toString): _*)
      .groupBy(input_file_name().as("f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    rows.map { r =>
      // key by the path suffix below the commit dir (partitioned
      // commits may reuse a part file name across value dirs); the
      // URI getPath decodes the %-encoding input_file_name applies
      val p = new java.net.URI(r.getString(0)).getPath
      val i = p.indexOf(marker)
      require(i >= 0, s"stats row for $p outside commit $commitRel")
      val cols = statCols.indices.flatMap { j =>
        val mn = r.getString(1 + 2 * j)
        val mx = r.getString(2 + 2 * j)
        if (mn == null || mx == null) None
        else Some(statCols(j) -> (mn, mx))
      }.toMap
      s"$commitRel/${p.substring(i + marker.length)}" -> cols
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
      carryTag: Boolean = true, partitionBy: Option[String] = None): Long = {
    val spark = df.sparkSession
    val fs = new HPath(path).getFileSystem(conf(spark))
    fs.mkdirs(manifestDir(path))
    // only commits that FOLD IN prior state (appends/evolution) or
    // carry its tag open the prior manifest — a plain overwrite stays
    // immune to concurrent vacuum retiring that manifest
    val needsPrior = !overwrite || carryTag
    // the commit's partition column: explicit beats inherited; a plain
    // (tag-resetting) overwrite REPURPOSES the table and resets it,
    // like the batch tag. Resolved best-effort before landing — on the
    // rare race where a concurrent commit changes it, the landed files
    // are merely less prunable, never wrong (pruning is stats-driven
    // and conservative).
    val partCol: Option[String] = partitionBy.orElse {
      if (!needsPrior) None
      else {
        val l = latestVersion(spark, path)
        if (l == 0) None
        else try readManifest(fs, path, l).partCol
        catch { case _: java.io.FileNotFoundException => None }
      }
    }
    val landPart = partCol.filter(df.schema.fieldNames.contains)
    val commitId = java.util.UUID.randomUUID().toString
    val newFiles = landDataFiles(df, path, commitId, landPart)
    val newStats = collectStats(spark, df.schema, path, s"data/c-$commitId",
      newFiles, forceCols = landPart.toSeq)
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
        val mPart = partitionBy.orElse(
          if (needsPrior) prior.flatMap(_.partCol) else None)
        if (tryPublish(fs, path, latest + 1,
            Manifest(schema, base ++ newFiles, tag,
              baseStats ++ newStats, mPart)))
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

  /** D276: partitioned snapshot writes — commit `df` laid out so every
    * data file holds exactly ONE value of `partitionCol` (hive-style
    * `__graft_pv=` routing dirs inside the commit dir; the real column
    * stays in the files). The manifest records the partition column
    * and, via the forced per-file stats, each file's single value —
    * so [[readSnapshotWhere]] prunes STRUCTURALLY from the manifest
    * alone, the dominant warehouse layout for time-partitioned facts
    * at 100 TB. Appends without an explicit partition column inherit
    * the table's ([[writeTagged]]); a plain [[writeSnapshot]]
    * overwrite resets it, like the batch tag. Works for any column
    * type (dates and strings included — partition values are recorded
    * as escaped strings, not numeric stats). */
  def writeSnapshotPartitioned(df: DataFrame, path: String,
      partitionCol: String, overwrite: Boolean = true): Long = {
    require(df.schema.fieldNames.contains(partitionCol),
      s"no partition column $partitionCol in " +
        df.schema.fieldNames.mkString(", "))
    writeTagged(df, path, overwrite, batchId = None,
      carryTag = !overwrite, partitionBy = Some(partitionCol))
  }

  /** Partition-pruned (equality) read: plan only the data files whose
    * recorded single value of `column` equals `value` (the Spark
    * string form, i.e. `CAST(col AS STRING)`). Files without stats,
    * or with a mixed [min, max] (unpartitioned files appended to a
    * partitioned table), are kept — pruning is conservative, never
    * lossy — and the exact filter still applies on top, so the result
    * is IDENTICAL to filtering [[readSnapshot]]. Composes with
    * [[readSnapshotRange]]-style stats skipping: both prune from the
    * manifest with zero parquet footer reads. */
  def readSnapshotWhere(spark: SparkSession, path: String, column: String,
      value: String, version: Long = -1L): DataFrame = {
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
        case Some((mn, mx)) => mn != mx || mn == value
        case None => true
      }
    val files = m.files.filter(keep)
    val base =
      if (files.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], m.schema)
      else spark.read.schema(m.schema)
        .parquet(files.map(f => new HPath(path, f).toString): _*)
    import org.apache.spark.sql.functions.lit
    base.filter(qcol(column).cast("string") === lit(value))
  }

  /** D277: small-file compaction (OPTIMIZE) — bin-pack the current
    * version's sub-`targetBytes` files into ~targetBytes files and
    * commit the result as the next version with recomputed stats.
    * The row set is UNCHANGED (`#nodatachange` in the manifest, so
    * the change feed skips it); files already at or above the target
    * are carried verbatim, stats included; on a partitioned table the
    * repacking shuffles on the partition column so the
    * one-value-per-file invariant survives. Prior versions stay
    * readable (time travel) until [[vacuum]] reclaims the replaced
    * files. This is the maintenance a streaming-append table needs at
    * 100 TB: a day of micro-batches is thousands of manifest entries
    * and tiny parquet files, and scan planning is O(files). Returns
    * the committed version, or the current one when there is nothing
    * to pack. Carries the batch tag, so a maintaining stream's replay
    * guard is unaffected.
    *
    * `sortCol` is the Delta `OPTIMIZE … ZORDER BY` idea: without it,
    * the repack shuffles rows arbitrarily, so every packed file spans
    * the whole key range and the per-file stats that made range reads
    * a seek stop pruning. With it, the repack RANGE-partitions (and
    * sorts within files) on that column, so the packed files carry
    * near-disjoint [min, max] ranges and D264 skipping survives the
    * compaction — on a clustering key (event time, id) this is the
    * difference between OPTIMIZE preserving and destroying the
    * table's seek behavior. A multi-dimension clustering key is one
    * `zorder8` column away (D40). */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L << 20,
      sortCol: Option[String] = None): Long = {
    require(targetBytes > 0, "targetBytes must be positive")
    val fs = new HPath(path).getFileSystem(conf(spark))
    var committed = -1L
    while (committed < 0) {
      val latest = latestVersion(spark, path)
      if (latest == 0) return 0L
      val m =
        try readManifest(fs, path, latest)
        catch { case _: java.io.FileNotFoundException => null } // re-resolve
      if (m != null) {
        val sized = m.files.map(f =>
          f -> fs.getFileStatus(new HPath(path, f)).getLen)
        val (big, small) = sized.partition(_._2 >= targetBytes)
        val smallBytes = small.map(_._2).sum
        val bins = math.max(1,
          math.ceil(smallBytes.toDouble / targetBytes).toInt)
        if (small.length <= bins) return latest // already packed
        val landPart = m.partCol.filter(m.schema.fieldNames.contains)
        sortCol.foreach(c => require(m.schema.fieldNames.contains(c),
          s"no sort column $c in ${m.schema.fieldNames.mkString(", ")}"))
        val df = spark.read.schema(m.schema)
          .parquet(small.map(f => new HPath(path, f._1).toString): _*)
        // partition value first, then the clustering key: the
        // partitioned landing splits per value anyway, so the range
        // partitioning only has to keep each value's keys contiguous
        val shuffleKeys = (landPart.toSeq ++ sortCol.toSeq).map(qcol)
        val packed = (sortCol, shuffleKeys) match {
          case (Some(_), ks) =>
            df.repartitionByRange(bins, ks: _*)
              .sortWithinPartitions(ks: _*)
          case (None, _) => landPart match {
            case Some(p) => df.repartition(bins, qcol(p))
            case None => df.repartition(bins)
          }
        }
        val commitId = java.util.UUID.randomUUID().toString
        val newFiles = landDataFiles(packed, path, commitId, landPart)
        val newStats = collectStats(spark, m.schema, path,
          s"data/c-$commitId", newFiles, forceCols = landPart.toSeq)
        val bigSet = big.map(_._1).toSet
        val keepStats = m.stats.filter { case (f, _) => bigSet(f) }
        if (tryPublish(fs, path, latest + 1,
            Manifest(m.schema, big.map(_._1) ++ newFiles, m.batchId,
              keepStats ++ newStats, m.partCol, dataChange = false)))
          committed = latest + 1
        // lost race: a concurrent commit changed the file set — the
        // landed pack is an orphan (vacuum reclaims it); re-plan
        // against the new latest
      }
    }
    committed
  }

  /** D278 (batch half): the table's change feed — rows ADDED by each
    * data-changing commit in `(fromVersion, toVersion]`, each with a
    * `_commit_version` column, in commit order. A version's additions
    * are its manifest's files minus its predecessor's (data files are
    * immutable, so file-set deltas ARE the row deltas for the
    * append-only maintenance pattern the table is built for — D255
    * streaming appends, D267 incremental MVs). Compaction commits
    * (`#nodatachange`) rewrite files without changing rows and are
    * skipped. COPY-ON-WRITE commits (merge) surface their rewritten
    * files as additions — the upsert-as-append reading Delta's CDF
    * calls out, documented not hidden. `fromVersion = 0` reads from
    * the beginning; `toVersion = -1` means latest. Old versions must
    * not have been vacuumed past `fromVersion`. */
  def changesBetween(spark: SparkSession, path: String, fromVersion: Long,
      toVersion: Long = -1L): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"no committed versions under $path")
    val to = if (toVersion < 0) vs.last else toVersion
    require(to <= vs.last, s"version $to not committed yet (latest ${vs.last})")
    require(fromVersion == 0 || vs.contains(fromVersion),
      s"change-feed base version $fromVersion is not committed " +
        s"(vacuumed?); available: ${vs.headOption.getOrElse(0L)}..${vs.last}")
    val fs = new HPath(path).getFileSystem(conf(spark))
    val range = vs.filter(v => v > fromVersion && v <= to)
    val outSchema = StructType(
      (if (range.nonEmpty) readManifest(fs, path, range.last).schema
       else readManifest(fs, path, vs.last).schema).fields :+
        org.apache.spark.sql.types.StructField("_commit_version",
          org.apache.spark.sql.types.LongType, nullable = false))
    if (range.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
    var prev: Set[String] =
      if (fromVersion == 0) Set.empty
      else readManifest(fs, path, fromVersion).files.toSet
    val slices = range.flatMap { v =>
      val mv = readManifest(fs, path, v)
      val added = mv.files.filterNot(prev)
      prev = mv.files.toSet
      if (!mv.dataChange || added.isEmpty) None
      else Some(
        spark.read
          .schema(StructType(outSchema.fields.dropRight(1)))
          .parquet(added.map(f => new HPath(path, f).toString): _*)
          .withColumn("_commit_version", lit(v)))
    }
    if (slices.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
    else slices.reduce(_.unionAll(_))
  }

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
    val floating = m.schema(column).dataType match {
      case org.apache.spark.sql.types.FloatType |
           org.apache.spark.sql.types.DoubleType => true
      case _ => false
    }
    def keep(f: String): Boolean =
      m.stats.get(f).flatMap(_.get(column)) match {
        case Some((mn, mx)) =>
          statsIntersect(mn, mx, lo, hi, floating)
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
    // survives identifier-unfriendly column names (backtick-quoted),
    // and a long column vs a decimal literal widens to DECIMAL — exact
    // past 2^53, where a double literal would silently round
    import org.apache.spark.sql.functions.lit
    base.filter(qcol(column) >= lit(lo) && qcol(column) <= lit(hi))
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
      updates.select(keyCols.map(k => qcol(k).as(k)): _*),
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
    require(updates.schema.fieldNames.contains(keyCol),
      s"no key column $keyCol in ${updates.schema.fieldNames.mkString(", ")}")
    val keyType = updates.schema(keyCol).dataType
    require(isStatType(keyType),
      s"mergePruned needs a numeric key column (stats-prunable); " +
        s"$keyCol is $keyType — use merge() for non-numeric keys")
    if (versions(spark, path).isEmpty)
      return writeSnapshot(updates, path)
    val fs = new HPath(path).getFileSystem(conf(spark))
    import org.apache.spark.sql.functions.{floor, lit, max, min, when}
    // Bucketed update-key ranges, not one global envelope: two updated
    // keys at opposite ends of the key space must rewrite only the
    // files THEIR buckets touch, so the "CDC touches one day" promise
    // survives sparse updates. One bounded pass: global [lo, hi], then
    // per-equi-width-bucket ACTUAL [min, max] (empty buckets simply
    // don't appear — the gaps between them are what saves the rewrite).
    val kd = qcol(keyCol).cast("double")
    val g = updates.agg(min(kd).as("lo"), max(kd).as("hi")).head()
    if (g.isNullAt(0)) return latestVersion(spark, path) // empty: no-op
    val gLo = g.getDouble(0)
    val gHi = g.getDouble(1)
    val buckets = 64
    val width = math.max((gHi - gLo) / buckets, java.lang.Double.MIN_NORMAL)
    val perBucket: Array[(String, String)] = updates
      .groupBy(when(kd.isNaN, lit(buckets.toLong))
        .otherwise(floor((kd - lit(gLo)) / lit(width))).as("b"))
      .agg(min(qcol(keyCol)).cast("string").as("mn"),
        max(qcol(keyCol)).cast("string").as("mx"))
      .collect()
      .map(r => (r.getString(1), r.getString(2)))
    val floating = keyType match {
      case org.apache.spark.sql.types.FloatType |
           org.apache.spark.sql.types.DoubleType => true
      case _ => false
    }
    // per-bucket bounds stay strings so float NaN/Infinity buckets
    // parse on the same path as file stats (they loosen to ±∞)
    def intersectsBucket(fmn: String, fmx: String): Boolean =
      perBucket.exists { case (blo, bhi) =>
        if (floating) {
          try {
            def low(s: String) = {
              val d = s.toDouble
              if (d.isNaN) Double.NegativeInfinity else math.nextDown(d)
            }
            def high(s: String) = {
              val d = s.toDouble
              if (d.isNaN) Double.PositiveInfinity else math.nextUp(d)
            }
            high(fmx) >= low(blo) && low(fmn) <= high(bhi)
          } catch { case _: NumberFormatException => true }
        } else {
          try statsIntersect(fmn, fmx, BigDecimal(blo), BigDecimal(bhi),
            floating = false)
          catch { case _: NumberFormatException => true }
        }
      }
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
            case Some((mn, mx)) => intersectsBucket(mn, mx)
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
          updates.select(qcol(keyCol).as(keyCol)), Seq(keyCol), "left_anti")
        val rewritten = survivors.unionAll(
          updates.select(m.schema.fieldNames.toSeq.map(qcol): _*))
        val commitId = java.util.UUID.randomUUID().toString
        val landPart = m.partCol.filter(m.schema.fieldNames.contains)
        val newFiles = landDataFiles(rewritten, path, commitId, landPart)
        val newStats = collectStats(spark, m.schema, path,
          s"data/c-$commitId", newFiles, forceCols = landPart.toSeq)
        val untouchedSet = untouched.toSet
        val keepStats = m.stats.filter { case (f, _) => untouchedSet(f) }
        if (tryPublish(fs, path, latest + 1,
            Manifest(m.schema, untouched ++ newFiles,
              m.batchId, keepStats ++ newStats, m.partCol)))
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
