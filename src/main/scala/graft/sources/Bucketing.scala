package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support (SURVEY.md §2 scale design, D10): persist the
  * fact tables bucketed on their join key so fact⋈fact joins read
  * co-located buckets and skip the shuffle entirely — the standard
  * 100 TB pattern where lineitem⋈orders would otherwise move both
  * tables across the cluster on every query.
  *
  * `bucketBy` requires the session catalog (`saveAsTable`); plain
  * `.parquet(path)` cannot record bucket metadata. Bucket counts should
  * be sized so one bucket ≈ one task's worth of data at the deployed
  * scale; the join needs equal bucket counts on both sides.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted catalog table (idempotent). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Bucket lineitem + orders on the order key with matching bucket
    * counts, returning the table names. */
  def bucketFacts(spark: SparkSession, dir: String,
      buckets: Int = 16): (String, String) = {
    writeBucketed(Tables.lineitem(spark, dir), "lineitem_bucketed",
      "l_orderkey", buckets)
    writeBucketed(Tables.orders(spark, dir), "orders_bucketed",
      "o_orderkey", buckets)
    ("lineitem_bucketed", "orders_bucketed")
  }
}
