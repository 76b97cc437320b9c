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

  /** Component-aware corpus dedup — c1's step 3 drops EVERY pair
    * member that ever appears as a doc_b, which can delete a whole
    * near-dup family; the cluster-correct rule keeps exactly one
    * representative per connected component, and picks the BEST one:
    *
    *  1. quality-gate the corpus (≥ 0.5, as c1);
    *  2. assign every document its near-dup component ([[Dedup.componentAssignment]] —
    *     LSH pairs → min-label propagation, never all-pairs);
    *  3. per component, keep the highest-quality member (ties → lowest
    *     doc_id; both engines order on the same 4-dp score so the
    *     choice is deterministic);
    *  4. per-(lang, source) survivor counts + total quality.
    *
    * The per-component top-1 is a window over `cluster_id` — a
    * high-cardinality key (≈ one per document), so the rank
    * parallelizes with the cluster; no q9-style low-cardinality trap. */
  def c2ComponentDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val gated = Tables.documents(spark, dir)
      .withColumn("quality", TextAnalysis.qualityScore($"text"))
      .filter($"quality" >= 0.5)
      .select($"doc_id", $"lang", $"source", $"quality")
    val assigned = gated
      .join(Dedup.componentAssignment(spark, dir).select($"doc_id", $"cluster_id"),
        "doc_id")
    val w = Window.partitionBy($"cluster_id")
      .orderBy($"quality".desc, $"doc_id")
    assigned
      .withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"),
        round(sum($"quality"), 4).as("sum_quality"))
      .orderBy($"lang", $"source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c1_clean_corpus" -> c1CleanCorpus,
    "c2_component_dedup" -> c2ComponentDedup)

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
          FROM s3 GROUP BY 1, 2 ORDER BY 1, 2""",
    "c2_component_dedup" ->
      s"""${Dedup.componentsCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
          gated AS (SELECT doc_id, lang, source,
                      ${TextAnalysis.qualityScoreSql} AS quality
                    FROM documents),
          ok AS (SELECT g.doc_id, g.lang, g.source, g.quality, a.cluster_id
                 FROM gated g JOIN assign a USING (doc_id)
                 WHERE g.quality >= 0.5),
          ranked AS (SELECT *, row_number() OVER (PARTITION BY cluster_id
                       ORDER BY quality DESC, doc_id) AS rk FROM ok)
          SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
            round(sum(quality), 4) AS sum_quality
          FROM ranked WHERE rk = 1 GROUP BY 1, 2 ORDER BY 1, 2""")
}
