package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Write paths and non-parquet readers (SURVEY.md §2.B D1 extension —
  * the reference persists models as parquet; a pipeline engine also
  * needs dataset sinks and delimited/JSON ingestion).
  *
  * Scale rules baked in:
  *  - partitioned writes go through `partitionBy` so downstream reads
  *    prune whole directories (`PartitionFilters` in the scan, checked
  *    in SinksSpec);
  *  - `sortWithinPartitions` before the write clusters row groups so
  *    parquet min/max stats prune within files too;
  *  - `maxRecordsPerFile` bounds file size regardless of task count —
  *    without it a skewed partition writes one giant file;
  *  - CSV/JSON readers take an EXPLICIT schema: schema inference is a
  *    full extra pass over the data (at 100 TB, a full extra job) and
  *    can silently widen types between runs.
  */
object Sinks {

  /** Partitioned, optionally clustered parquet dataset write. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String] = Nil,
      maxRecordsPerFile: Long = 5000000L): Unit = {
    val clustered =
      if (sortCols.isEmpty) df
      else df.sortWithinPartitions(sortCols.map(df.col): _*)
    clustered.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** CSV reader with a required schema (no inference pass). */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** JSON-lines reader with a required schema (no inference pass). */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC round-trip — the second columnar interchange format a lake
    * speaks (Hive-era estates are ORC-first); same pushdown/pruning
    * properties as parquet, so a reader migrating ORC data onto this
    * engine keeps its scan behavior. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Streaming parquet sink: append mode + checkpoint, the
    * exactly-once landing pattern for event ingestion. Caller owns
    * `query.processAllAvailable()`/`stop()`. */
  def streamToParquet(df: DataFrame, path: String,
      checkpoint: String): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()
}
