package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deduplication operators (SURVEY.md §2.B D17–D18).
  *
  * Exact dedup is a hash-groupBy; near-dup detection is MinHash over
  * word 3-shingles with LSH banding, plus SimHash and exact n-gram
  * Jaccard on the LSH candidate pairs.
  *
  * Hash choice: every hash is `md5` (identical bytes in Spark and
  * DuckDB), and MinHash minima are taken over the md5 *hex strings*
  * (lexicographic min) rather than converted integers — this keeps the
  * whole pipeline oracle-checkable bit-for-bit in SQL while remaining a
  * uniform hash for the MinHash estimator. Salted copies
  * (`md5(i + ":" + shingle)`) give the k independent permutations.
  *
  * Scale design (100 TB): everything here is shingle-local or
  * signature-local — no all-pairs comparison ever happens. LSH banding
  * turns near-dup search into a groupBy on band hashes followed by a
  * self-equi-join on (band index, band hash), i.e., a shuffle keyed by
  * band value whose cost is linear in corpus size plus the (small)
  * candidate-pair set. Hot buckets (a band value shared by thousands of
  * docs) would quadratically blow up the within-bucket join, so buckets
  * are capped at [[maxBucket]] docs — standard practice, and the cap is
  * logged via the `bucket_size` column rather than applied silently.
  */
object Dedup {

  /** Number of MinHash components (salted md5 permutations). */
  val numHashes = 8
  /** LSH bands: 4 bands × 2 rows — P(candidate) = 1-(1-j²)⁴. */
  val numBands = 4
  val rowsPerBand: Int = numHashes / numBands
  /** Within-bucket join guard for skewed band values. */
  val maxBucket = 1000

  /** Lowercased whitespace tokens of the document text. */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Word 3-shingles as strings (docs are ≥10 tokens; see FIXTURES.md). */
  def shingles(text: Column): Column = {
    val t = tokens(text)
    transform(sequence(lit(1), size(t) - 2),
      i => concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2)))
  }

  /** MinHash component i: lexicographic min of salted md5 hex digests. */
  def minhash(sh: Column, i: Int): Column =
    array_min(transform(sh, s => md5(concat(lit(s"$i:"), s))))

  /** DuckDB rendering of [[shingles]] / [[minhash]] for the oracles. */
  private val shinglesSql =
    """list_transform(generate_series(1, len(string_split(lower(text), ' ')) - 2),
       i -> string_split(lower(text), ' ')[i] || ' ' ||
            string_split(lower(text), ' ')[i+1] || ' ' ||
            string_split(lower(text), ' ')[i+2])"""
  private def minhashSql(i: Int) =
    s"list_min(list_transform(sh, s -> md5('$i:' || s)))"

  /** D17: exact dedup by normalized-text hash → representative id +
    * multiplicity per content group. */
  def d1ExactDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("content_hash",
        md5(regexp_replace(trim(lower($"text")), "\\s+", " ")))
      .groupBy($"content_hash")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy($"content_hash")
  }

  /** D17: distinct-projection dedup (dropDuplicates semantics made
    * deterministic by projecting only the dedup keys). */
  def d2DistinctMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"lang", $"source").distinct()
      .orderBy($"lang", $"source")
  }

  /** D18: per-document MinHash signature (8 salted-md5 minima over word
    * 3-shingles). One narrow map — no shuffle, no explode. */
  def d3Minhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sigCols = (0 until numHashes).map(i => minhash($"sh", i).as(s"sig$i"))
    Tables.documents(spark, dir)
      .withColumn("sh", shingles($"text"))
      .select($"doc_id" +: sigCols: _*)
      .orderBy($"doc_id")
  }

  /** Signature + band-hash frame used by the LSH queries. */
  private def banded(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val withSigs = Tables.documents(spark, dir)
      .withColumn("sh", shingles($"text"))
      .select($"doc_id" +: (0 until numHashes).map(i => minhash($"sh", i).as(s"sig$i")): _*)
    val bandCols = (0 until numBands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"sig${b * rowsPerBand + r}"))
      md5(concat_ws("|", parts: _*)).as(s"band$b")
    }
    withSigs.select(($"doc_id" +: (0 until numHashes).map(i => col(s"sig$i"))) ++ bandCols: _*)
  }

  /** D18: LSH candidate pairs — explode to (band index, band hash),
    * self-join within buckets, estimate similarity as the fraction of
    * equal signature components. The join key is the band hash, so the
    * shuffle is linear in corpus size; `est_sim` needs no second pass
    * because the full signatures ride along. */
  def d4LshPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sigs = banded(spark, dir)
    val bands = sigs.select($"doc_id",
      posexplode(array((0 until numBands).map(b => col(s"band$b")): _*)).as(Seq("band_idx", "band_hash")))
    // cap pathological buckets (skew guard; none expected on this corpus)
    val bucketOk = bands.groupBy($"band_idx", $"band_hash")
      .agg(count(lit(1)).as("bucket_size"))
      .filter($"bucket_size" <= maxBucket)
    val inBuckets = bands.join(bucketOk, Seq("band_idx", "band_hash"))
    val a = inBuckets.select($"band_idx", $"band_hash", $"doc_id".as("doc_a"))
    val b = inBuckets.select($"band_idx", $"band_hash", $"doc_id".as("doc_b"))
    val cand = a.join(b, Seq("band_idx", "band_hash"))
      .filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b").distinct()
    val sa = sigs.select($"doc_id".as("doc_a") +:
      (0 until numHashes).map(i => col(s"sig$i").as(s"a$i")): _*)
    val sb = sigs.select($"doc_id".as("doc_b") +:
      (0 until numHashes).map(i => col(s"sig$i").as(s"b$i")): _*)
    val eq = (0 until numHashes)
      .map(i => when(col(s"a$i") === col(s"b$i"), 1.0).otherwise(0.0))
      .reduce(_ + _)
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .select($"doc_a", $"doc_b", round(eq / numHashes, 4).as("est_sim"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** D18: exact shingle-set Jaccard on the LSH candidate pairs —
    * explode distinct shingles, count intersection via an equi-join on
    * the shingle, union by inclusion–exclusion. Only candidate pairs
    * are scored, so the quadratic step never touches the full corpus. */
  def d5Jaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docSh = Tables.documents(spark, dir)
      .select($"doc_id", explode(array_distinct(shingles($"text"))).as("s"))
    val card = docSh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val cand = d4LshPairs(spark, dir).select($"doc_a", $"doc_b")
    val inter = docSh.select($"doc_id".as("doc_a"), $"s")
      .join(cand, "doc_a")
      .join(docSh.select($"doc_id".as("doc_b"), $"s"), Seq("doc_b", "s"))
      .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(card.select($"doc_id".as("doc_a"), $"n".as("n_a")), "doc_a")
      .join(card.select($"doc_id".as("doc_b"), $"n".as("n_b")), "doc_b")
      .select($"doc_a", $"doc_b",
        round($"n_inter" / ($"n_a" + $"n_b" - $"n_inter"), 4).as("jaccard"))
      .filter($"jaccard" >= 0.5)
      .orderBy($"doc_a", $"doc_b")
  }

  /** D18: 32-bit SimHash from md5-derived token hashes — explode
    * tokens, one conditional sum per bit (partial-aggregated), then
    * reassemble the fingerprint. */
  def d6Simhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", explode(tokens($"text")).as("t"))
      .withColumn("h", conv(substring(md5($"t"), 1, 8), 16, 10).cast("long"))
    val bitSums = (0 until 32).map { i =>
      sum(when(shiftright($"h", i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"bit$i")
    }
    val agg = toks.groupBy($"doc_id").agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 32)
      .map(i => when(col(s"bit$i") > 0, lit(1L) * (1L << i)).otherwise(0L))
      .reduce(_ + _)
    agg.select($"doc_id", fp.as("simhash")).orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d1_exact_dedup" -> d1ExactDedup,
    "d2_distinct_meta" -> d2DistinctMeta,
    "d3_minhash" -> d3Minhash,
    "d4_lsh_pairs" -> d4LshPairs,
    "d5_jaccard" -> d5Jaccard,
    "d6_simhash" -> d6Simhash)

  private def sigSelect(prefix: String) =
    (0 until numHashes).map(i => s"${minhashSql(i)} AS ${prefix}$i").mkString(", ")

  private val bandSelect = (0 until numBands).map { b =>
    val parts = (0 until rowsPerBand).map(r => s"sig${b * rowsPerBand + r}")
    s"md5(${parts.mkString(" || '|' || ")}) AS band$b"
  }.mkString(", ")

  /** Shared oracle CTE: signatures + bands, mirroring [[banded]]. */
  private val sigCte =
    s"""WITH sh AS (SELECT doc_id, $shinglesSql AS sh FROM documents),
        sig AS (SELECT doc_id, ${sigSelect("sig")} FROM sh),
        band AS (SELECT doc_id, ${(0 until numHashes).map(i => s"sig$i").mkString(", ")}, $bandSelect FROM sig),
        bucket AS (SELECT doc_id, band_idx, band_hash FROM band
                   UNPIVOT (band_hash FOR band_idx IN (${(0 until numBands).map(b => s"band$b").mkString(", ")}))),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM bucket a JOIN bucket b
                   ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
                  AND a.doc_id < b.doc_id)"""

  val oracle: Map[String, String] = Map(
    "d1_exact_dedup" ->
      """SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS content_hash,
         min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies
         FROM documents GROUP BY 1 ORDER BY content_hash""",
    "d2_distinct_meta" ->
      "SELECT DISTINCT lang, source FROM documents ORDER BY lang, source",
    "d3_minhash" ->
      s"""WITH sh AS (SELECT doc_id, $shinglesSql AS sh FROM documents)
          SELECT doc_id, ${sigSelect("sig")} FROM sh ORDER BY doc_id""",
    "d4_lsh_pairs" ->
      s"""$sigCte
          SELECT c.doc_a, c.doc_b,
            round((${(0 until numHashes).map(i =>
              s"CASE WHEN sa.sig$i = sb.sig$i THEN 1.0 ELSE 0.0 END").mkString(" + ")}) / $numHashes.0, 4) AS est_sim
          FROM cand c JOIN sig sa ON c.doc_a = sa.doc_id
                      JOIN sig sb ON c.doc_b = sb.doc_id
          ORDER BY doc_a, doc_b""",
    "d5_jaccard" ->
      s"""$sigCte,
          dsh AS (SELECT DISTINCT doc_id, unnest(sh) AS s
                  FROM (SELECT doc_id, $shinglesSql AS sh FROM documents)),
          card AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY 1),
          inter AS (SELECT c.doc_a, c.doc_b, count(*) AS n_inter
                    FROM cand c JOIN dsh a ON a.doc_id = c.doc_a
                                JOIN dsh b ON b.doc_id = c.doc_b AND a.s = b.s
                    GROUP BY 1, 2)
          SELECT i.doc_a, i.doc_b,
                 round(n_inter * 1.0 / (ca.n + cb.n - n_inter), 4) AS jaccard
          FROM inter i JOIN card ca ON i.doc_a = ca.doc_id
                       JOIN card cb ON i.doc_b = cb.doc_id
          WHERE round(n_inter * 1.0 / (ca.n + cb.n - n_inter), 4) >= 0.5
          ORDER BY doc_a, doc_b""",
    "d6_simhash" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents),
          h AS (SELECT doc_id, CAST('0x' || substring(md5(t), 1, 8) AS BIGINT) AS h FROM tok),
          bits AS (SELECT doc_id,
            ${(0 until 32).map(i =>
              s"sum(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS bit$i").mkString(", ")}
            FROM h GROUP BY doc_id)
          SELECT doc_id, CAST(${(0 until 32).map(i =>
            s"(CASE WHEN bit$i > 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")} AS BIGINT) AS simhash
          FROM bits ORDER BY doc_id""")
}
