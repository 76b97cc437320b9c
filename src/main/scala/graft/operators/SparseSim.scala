package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Sparse (term-space) cosine similarity join over the document corpus
  * — the lexical twin of the dense-embedding paths in
  * `operators/Similarity.scala` (s1/s2/s3) and the classic TF-IDF
  * companion to `TextAnalysis.t6Tfidf`.
  *
  * Scale design:
  *  - **df-banded posting lists.** Terms with df < 2 cannot produce a
  *    pair and terms with df > [[dfCap]] are stopword-like and would
  *    each fan the self-join out df² ways, so both bands are pruned
  *    BEFORE the join — the per-term pair blow-up is capped at
  *    [[dfCap]]², exactly the d7_decontaminate DF-cap shape. Cosine is
  *    defined over the pruned vector space (standard stopword-dropped
  *    similarity).
  *  - **id-only shuffles.** The dot-product aggregation shuffles
  *    (doc_a, doc_b, partial sum) triples thanks to map-side partial
  *    aggregation; document text never crosses the wire after
  *    tokenization.
  *  - **No broadcast of vocabulary- or corpus-sized tables.** The df
  *    table is vocabulary-sized and the norm table corpus-sized
  *    (t6's OOM note applies); both stay shuffle joins on their keys.
  *
  * Exactness: weights are FIXED-POINT BIGINTs — floor(1e4·tf·ln(N/df))
  * — so dots and norms are exact integer sums with no summation-order
  * float drift (the g1/q37 integer-replay trick); the final cosine is
  * one deterministic double op chain (×, √, ÷) on identical integer
  * inputs in both engines. ln() is IEEE-identical across engines (t6
  * precedent).
  */
object SparseSim {

  /** Posting-list document-frequency band: df ∈ [2, dfCap]. */
  val dfCap = 50
  /** Fixed-point scale for TF-IDF weights. */
  val wScale = 10000.0
  /** Cosine emission threshold (on the 4-dp rounded value). */
  val minCosine = 0.50

  /** (doc_id, term, w) fixed-point weighted posting lists over the
    * df-banded vocabulary. */
  def postings(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.count()
    val tf = docs
      .select($"doc_id", explode(TextAnalysis.tokens($"text")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dfKept = tf.groupBy($"term").agg(count(lit(1)).as("df"))
      .filter($"df" >= 2 && $"df" <= dfCap)
    tf.join(dfKept, "term")
      .select($"doc_id", $"term",
        floor(lit(wScale) * $"tf" * log(lit(nDocs.toDouble) / $"df"))
          .cast("long").as("w"))
  }

  /** D49: all document pairs with pruned-space TF-IDF cosine ≥
    * [[minCosine]] — (doc_a, doc_b, cosine), doc_a < doc_b. */
  def s8SparseCosine(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = postings(spark, dir)
    val n2 = w.groupBy($"doc_id").agg(sum($"w" * $"w").as("n2"))
    val dot = w.as("a").join(w.as("b"),
        $"a.term" === $"b.term" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(sum($"a.w" * $"b.w").as("dot"))
    val cos: Column = round($"dot".cast("double") /
      sqrt($"na".cast("double") * $"nb".cast("double")), 4)
    dot
      .join(n2.select($"doc_id".as("doc_a"), $"n2".as("na")), "doc_a")
      .join(n2.select($"doc_id".as("doc_b"), $"n2".as("nb")), "doc_b")
      .withColumn("cosine", cos)
      .filter($"cosine" >= minCosine)
      .select($"doc_a", $"doc_b", $"cosine")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s8_sparse_cosine" -> s8SparseCosine)

  val oracle: Map[String, String] = Map(
    "s8_sparse_cosine" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
            FROM documents),
          tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                 FROM tok GROUP BY doc_id, term),
          df AS (SELECT term, count(*) AS df FROM tf GROUP BY term
                 HAVING count(*) >= 2 AND count(*) <= $dfCap),
          w AS (SELECT tf.doc_id, tf.term,
                  CAST(floor($wScale * tf.tf *
                    ln((SELECT count(*) FROM documents) * 1.0 / df.df)) AS BIGINT) AS w
                FROM tf JOIN df USING (term)),
          n2 AS (SELECT doc_id, sum(w * w) AS n2 FROM w GROUP BY doc_id),
          dot AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    sum(a.w * b.w) AS dot
                  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
          SELECT doc_a, doc_b,
            round(CAST(dot AS DOUBLE) /
              sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)), 4) AS cosine
          FROM dot JOIN n2 na ON dot.doc_a = na.doc_id
                   JOIN n2 nb ON dot.doc_b = nb.doc_id
          WHERE round(CAST(dot AS DOUBLE) /
              sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)), 4) >= $minCosine""")
}
