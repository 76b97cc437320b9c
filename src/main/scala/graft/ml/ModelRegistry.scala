package graft.ml

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable

/** Estimator-artifact version registry (SURVEY.md §2.D D253) — the
  * refit-governance layer the estimator family was missing: s24/t40
  * MEASURE drift and c21 DECIDES retrains, but nothing recorded which
  * artifact version a scoring job should load. The registry is itself
  * a [[SnapshotTable]] (append-only, atomic commits, time travel), so
  * "what did `loadLatest` resolve to last Tuesday" is answered by
  * reading the registry at an older snapshot version — lineage for
  * free from the table format.
  *
  * One row per registration: (name, seq, kind, artifact_path, note).
  * `seq` increments per name; `latestPath` resolves the max-seq row.
  * Registrations of DIFFERENT names never conflict (the snapshot
  * commit protocol serializes them losslessly). Two writers
  * registering the SAME name concurrently can mint the same seq —
  * both rows land (append-only, nothing is lost) and `latestPath`
  * breaks the tie deterministically by artifact path; serialize
  * same-name registration in the caller if strict ordering matters
  * (the c21 pattern: one retrain decider per index).
  *
  * Scale notes: a registry holds one row per MODEL VERSION — thousands
  * of rows, not data-scale — so reads are a single small snapshot
  * scan; the artifact payloads stay wherever their writers put them
  * (the registry stores paths, never bytes). */
object ModelRegistry {

  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("name",
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("seq",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("kind",
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("artifact_path",
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("note",
      org.apache.spark.sql.types.StringType, nullable = true)))

  /** Register a persisted artifact under `name`; returns its seq. */
  def register(spark: SparkSession, registry: String, name: String,
      kind: String, artifactPath: String, note: String = ""): Long = {
    val seq = latestSeq(spark, registry, name) + 1
    val row = spark.createDataFrame(
      java.util.List.of(Row(name, seq, kind, artifactPath, note)), schema)
    SnapshotTable.writeSnapshot(row, registry, overwrite = false)
    seq
  }

  /** All registrations, newest first (empty frame for a new registry). */
  def entries(spark: SparkSession, registry: String,
      name: Option[String] = None): DataFrame = {
    val all =
      if (SnapshotTable.versions(spark, registry).isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], schema)
      else SnapshotTable.readSnapshot(spark, registry)
    name.fold(all)(n => all.filter(col("name") === n))
      .orderBy(col("name"), col("seq").desc, col("artifact_path"))
  }

  private def latestSeq(spark: SparkSession, registry: String,
      name: String): Long = {
    val top = entries(spark, registry, Some(name)).limit(1).collect()
    if (top.isEmpty) 0L else top.head.getLong(1)
  }

  /** The artifact path `name` currently resolves to, if any. */
  def latestPath(spark: SparkSession, registry: String,
      name: String): Option[String] = {
    val top = entries(spark, registry, Some(name)).limit(1).collect()
    top.headOption.map(_.getString(3))
  }

  /** Time travel: what `latestPath` resolved to at an older registry
    * snapshot version — the lineage question ("which model scored
    * batch N") the append-only log answers exactly. */
  def pathAtVersion(spark: SparkSession, registry: String, name: String,
      registryVersion: Long): Option[String] = {
    val top = SnapshotTable.readSnapshot(spark, registry, registryVersion)
      .filter(col("name") === name)
      .orderBy(col("seq").desc, col("artifact_path"))
      .limit(1).collect()
    top.headOption.map(_.getString(3))
  }
}
