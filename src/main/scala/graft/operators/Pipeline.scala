package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** End-to-end corpus-cleaning pipeline — the composition a training-data
  * engineer actually runs, built entirely from the engine's own
  * operators (D20 quality gate → D17 exact dedup → D18 near-dup
  * removal → summary):
  *
  *  1. score every document with [[TextAnalysis.qualityScore]] and keep
  *     quality ≥ 0.5;
  *  2. collapse exact duplicates among survivors (min doc_id per
  *     normalized-content hash — d1's rule, applied to the filtered set);
  *  3. remove near-duplicates: for every shingle-Jaccard ≥ 0.5 pair
  *     (d5's LSH-bucketed pairs — never all-pairs) whose BOTH endpoints
  *     survived step 2, drop the higher id (single pass, not transitive
  *     closure — deterministic and oracle-replayable);
  *  4. report surviving doc counts and total quality per (lang, source).
  *
  * Every stage is a narrow filter or a partial-aggregated shuffle; the
  * only pair-wise work is inherited from d5's candidate set, which LSH
  * banding keeps linear-ish in the corpus. The whole chain is replayed
  * verbatim in the DuckDB oracle.
  */
object Pipeline {

  def c1CleanCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val s1 = Tables.documents(spark, dir)
      .withColumn("quality", TextAnalysis.qualityScore($"text"))
      .filter($"quality" >= 0.5)
    // exact dedup among survivors: content_hash is near-unique, so the
    // window min is a regular hash-partitioned shuffle, no hot keys
    val s2 = s1
      .withColumn("content_hash",
        md5(regexp_replace(trim(lower($"text")), "\\s+", " ")))
      .withColumn("keep_id",
        min($"doc_id").over(Window.partitionBy($"content_hash")))
      .filter($"doc_id" === $"keep_id")
      .select($"doc_id", $"lang", $"source", $"quality")
    val ids = s2.select($"doc_id")
    val livePairs = Dedup.d5Jaccard(spark, dir)
      .join(ids.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"), "left_semi")
      .join(ids.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"), "left_semi")
    val s3 = s2.join(livePairs.select($"doc_b".as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    // sum, not avg: the sum of 4dp-rounded scores has ≤4 decimal places,
    // so round(·,4) can never land on a cross-engine rounding boundary
    // (an avg of a small group can — observed at sf0.01)
    s3.groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"),
        round(sum($"quality"), 4).as("sum_quality"))
      .orderBy($"lang", $"source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c1_clean_corpus" -> c1CleanCorpus)

  val oracle: Map[String, String] = Map(
    "c1_clean_corpus" ->
      s"""${Dedup.jaccardCte},
          qual AS (SELECT doc_id, text, lang, source,
                     ${TextAnalysis.qualityScoreSql} AS quality
                   FROM documents),
          s1 AS (SELECT doc_id, lang, source, quality,
                   md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS ch
                 FROM qual WHERE quality >= 0.5),
          keepers AS (SELECT min(doc_id) AS doc_id FROM s1 GROUP BY ch),
          s2 AS (SELECT s1.doc_id, lang, source, quality
                 FROM s1 JOIN keepers USING (doc_id)),
          drops AS (SELECT DISTINCT doc_b AS doc_id FROM jp
                    WHERE doc_a IN (SELECT doc_id FROM s2)
                      AND doc_b IN (SELECT doc_id FROM s2)),
          s3 AS (SELECT * FROM s2
                 WHERE doc_id NOT IN (SELECT doc_id FROM drops))
          SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
            round(sum(quality), 4) AS sum_quality
          FROM s3 GROUP BY 1, 2 ORDER BY 1, 2""")
}
