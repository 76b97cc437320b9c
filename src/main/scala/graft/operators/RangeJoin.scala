package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Banded range join — `l.key = r.key AND r.t ∈ [l.t − w, l.t]` — the
  * second join family Spark has no native operator for (SURVEY.md §2
  * extension; the naive formulation is an inequality join that Catalyst
  * executes as a nested loop).
  *
  * Execution shape (chosen for 100 TB): both sides bucket time by the
  * band width w, so a right row in bucket b can only match left rows in
  * buckets {b, b+1}; the left side probes (b−1, b) via a 2-way explode
  * and the join becomes a plain equi-join on (key, bucket) — shuffle
  * keyed on values, each right row shuffled ONCE, each left row twice,
  * exact predicate applied post-join. Quadratic work is confined to
  * rows of the same key within ±w, which is the output size itself.
  */
object RangeJoin {

  /** Pairs (all left columns + `payload` right columns) where
    * `right.rightTime ∈ [left.leftTime − windowSec, left.leftTime]`
    * (inclusive) and keys match. Times must be timestamps. */
  def rangeJoin(left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      payload: Seq[String], windowSec: Long): DataFrame = {
    val l = left
      .withColumn("__b0", floor(unix_timestamp(col(leftTime)) / windowSec))
      .withColumn("__b", explode(array(col("__b0") - 1, col("__b0"))))
      .drop("__b0")
    val r = right.select(
      col(rightKey).as("__rkey") +:
        floor(unix_timestamp(col(rightTime)) / windowSec).as("__b") +:
        col(rightTime).as("__rt") +: payload.map(col): _*)
    l.join(r, col(leftKey) === col("__rkey") && l("__b") === r("__b"))
      .filter(col("__rt") >= col(leftTime) - expr(s"INTERVAL $windowSec SECONDS") &&
        col("__rt") <= col(leftTime))
      .drop("__b", "__rkey", "__rt")
  }

  /** D10-extension query: preceding events by the same user within 30
    * minutes of each event (self range join — the attribution-window /
    * co-occurrence shape), per event type. The fixture's orders predate
    * its events by decades, so the self-domain is the non-vacuous one. */
  def q20Range(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = 30L * 60
    val events = Tables.events(spark, dir)
      .select($"event_id", $"ts", $"user_id", $"event_type")
    val prior = Tables.events(spark, dir)
      .select($"event_id".as("p_id"), $"ts".as("p_ts"), $"user_id".as("p_user"),
        $"value".as("p_value"))
    rangeJoin(events, "user_id", "ts", prior, "p_user", "p_ts",
      Seq("p_id", "p_value"), w)
      .filter($"p_id" =!= $"event_id")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_pairs"),
        round(avg($"p_value"), 4).as("avg_prior_value"))
      .orderBy($"event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_range" -> q20Range)

  val oracle: Map[String, String] = Map(
    "q20_range" ->
      """SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_pairs,
           round(avg(p.value), 4) AS avg_prior_value
         FROM events e JOIN events p
           ON e.user_id = p.user_id
          AND p.event_id != e.event_id
          AND p.ts >= e.ts - INTERVAL 30 MINUTES
          AND p.ts <= e.ts
         GROUP BY e.event_type ORDER BY e.event_type""")
}
