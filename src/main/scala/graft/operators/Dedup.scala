package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.sources.Tables
import graft.CacheScope.ScopedPersist

/** Deduplication operators (SURVEY.md §2.B D17–D18).
  *
  * Exact dedup is a hash-groupBy; near-dup detection is MinHash over
  * word 3-shingles with LSH banding, plus SimHash and exact n-gram
  * Jaccard on the LSH candidate pairs.
  *
  * Hash design: one `md5` per shingle, split into two 32-bit words
  * (h1, h2); MinHash component i is `min((h1 + i·h2) mod 2³²)` — the
  * standard two-universal derived family (one strong hash, k cheap
  * combinations) so signature cost is ONE digest per shingle instead of
  * k. Everything is replayable bit-for-bit in DuckDB SQL.
  *
  * Execution shape (chosen for 100 TB, verified via .explain):
  *  - shingling is a pure array expression (`slice` + `zip_with`) whose
  *    array arguments are bound once per row — linear in tokens, not
  *    quadratic (Spark evaluates higher-order lambdas interpreted, so
  *    any outer expression referenced INSIDE a lambda re-evaluates per
  *    element; all lambdas here touch only their bound variables);
  *  - signatures go through explode → project (codegen'd md5) →
  *    groupBy(doc_id) with map-side partial `min`, so the shuffle
  *    carries one row of 8 longs per (partition, doc) — not the text;
  *  - LSH banding turns near-dup search into a self-equi-join keyed on
  *    (band index, band hash): linear scan + a shuffle of the (small)
  *    candidate set. Hot band values are capped at [[maxBucket]] docs
  *    (skew guard) before the pair join.
  */
object Dedup {

  /** Number of MinHash components (derived from one md5 per shingle). */
  val numHashes = 8
  /** LSH bands: 4 bands × 2 rows — P(candidate) = 1-(1-j²)⁴. */
  val numBands = 4
  val rowsPerBand: Int = numHashes / numBands
  /** Within-bucket join guard for skewed band values. */
  val maxBucket = 1000
  /** Modulus for the derived hash family (2³²). */
  val hashMod = 4294967296L

  /** Lowercased whitespace tokens of the document text. */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Word 3-shingles as strings. Array arguments (`slice` of the token
    * array) are evaluated once per row; the zip lambdas only touch bound
    * variables — O(tokens) per document. */
  def shingles(text: Column): Column = {
    def t = tokens(text)
    val n = greatest(size(t) - 2, lit(0))
    zip_with(
      zip_with(slice(t, lit(1), n), slice(t, lit(2), n),
        (a, b) => concat(a, lit(" "), b)),
      slice(t, lit(3), n), (ab, c) => concat(ab, lit(" "), c))
  }

  /** (doc_id, shingle) rows — the explode that all signature work hangs
    * off. Duplicates preserved (min() is idempotent; d5 dedups). */
  def shingleRows(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", explode(shingles($"text")).as("s"))
  }

  /** Per-document MinHash signature columns sig0..sig{k-1} from a
    * (doc_id, s) shingle frame: one md5 per shingle, k derived
    * components, partial-aggregated min per doc. `min` is insensitive
    * to duplicate shingles, so callers may pass raw or distinct rows. */
  def signaturesOf(shRows: DataFrame): DataFrame = {
    import shRows.sparkSession.implicits._
    val sigCols = (0 until numHashes).map(i =>
      min(($"h1" + lit(i) * $"h2") % hashMod).as(s"sig$i"))
    shRows
      .select($"doc_id", md5($"s").as("h"))
      .select($"doc_id",
        conv(substring($"h", 1, 8), 16, 10).cast("long").as("h1"),
        conv(substring($"h", 9, 8), 16, 10).cast("long").as("h2"))
      .groupBy($"doc_id")
      .agg(sigCols.head, sigCols.tail: _*)
  }

  def signatures(spark: SparkSession, dir: String): DataFrame =
    signaturesOf(shingleRows(spark, dir))

  /** Shared persisted (distinct shingle rows, signatures) per
    * (session, dir): d3/d4/d5 all hang off the same two frames, so the
    * corpus is shingled and hashed once per session — a session-scoped
    * materialized view over immutable fixture data. */
  private val sigCache = scala.collection.concurrent.TrieMap
    .empty[(String, String), (DataFrame, DataFrame)]
  def sharedSigs(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    // Keyed by identityHashCode (sessionUUID is private[sql] on Spark
    // 4.1.2). identityHashCode could in principle be reused after the
    // original session is GC'd, but the isStopped eviction below removes
    // stale entries first — a reused hash can only be observed after the
    // old session was stopped, at which point its entry is gone.
    sigCache.filterInPlace((_, v) =>
      !v._1.sparkSession.sparkContext.isStopped)
    sigCache.getOrElseUpdate((System.identityHashCode(spark).toString, dir), {
      val sh = shingleRows(spark, dir).distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      val sg = signaturesOf(sh).persist(StorageLevel.MEMORY_AND_DISK)
      (sh, sg)
    })
  }
  /** Test hook: live entry count (stopped-session entries evicted). */
  private[graft] def sigCacheSize: Int = sigCache.size

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

  /** D18: per-document MinHash signature. */
  def d3Minhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sharedSigs(spark, dir)._2.orderBy($"doc_id")
  }

  /** Band-hash columns band0..band{b-1} over signature columns. */
  private def withBands(sigs: DataFrame): DataFrame = {
    val bandCols = (0 until numBands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"sig${b * rowsPerBand + r}"))
      md5(concat_ws("|", parts: _*)).as(s"band$b")
    }
    sigs.select(col("doc_id") +:
      (0 until numHashes).map(i => col(s"sig$i")) ++: bandCols: _*)
  }

  /** (doc_id, band_idx, band_hash) bucket rows from a signature frame
    * — the LSH index that both the pair join (d4/d5) and the
    * incremental probe (d11) hang off. */
  private[graft] def bandRows(sigs: DataFrame): DataFrame = {
    import sigs.sparkSession.implicits._
    withBands(sigs).select($"doc_id",
      posexplode(array((0 until numBands).map(b => col(s"band$b")): _*))
        .as(Seq("band_idx", "band_hash")))
  }

  /** LSH candidate (doc_a < doc_b) pairs from a signature frame. The
    * caller persists `sigs` when it is consumed more than once. */
  private def candidates(sigs: DataFrame): DataFrame = {
    import sigs.sparkSession.implicits._
    val bands = bandRows(sigs)
    // cap pathological buckets (skew guard; none expected on this corpus)
    val bucketOk = bands.groupBy($"band_idx", $"band_hash")
      .agg(count(lit(1)).as("bucket_size"))
      .filter($"bucket_size" <= maxBucket)
    val inBuckets = bands.join(bucketOk, Seq("band_idx", "band_hash"))
    val a = inBuckets.select($"band_idx", $"band_hash", $"doc_id".as("doc_a"))
    val b = inBuckets.select($"band_idx", $"band_hash", $"doc_id".as("doc_b"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b").distinct()
  }

  /** D18: LSH candidate pairs with signature-overlap similarity. */
  def d4LshPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sigs = sharedSigs(spark, dir)._2 // read 3× (bands + both sides)
    val sa = sigs.select($"doc_id".as("doc_a") +:
      (0 until numHashes).map(i => col(s"sig$i").as(s"a$i")): _*)
    val sb = sigs.select($"doc_id".as("doc_b") +:
      (0 until numHashes).map(i => col(s"sig$i").as(s"b$i")): _*)
    val eq = (0 until numHashes)
      .map(i => when(col(s"a$i") === col(s"b$i"), 1.0).otherwise(0.0))
      .reduce(_ + _)
    candidates(sigs).join(sa, "doc_a").join(sb, "doc_b")
      .select($"doc_a", $"doc_b", round(eq / numHashes, 4).as("est_sim"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** D18: exact shingle-set Jaccard on the LSH candidate pairs —
    * explode distinct shingles, count intersection via an equi-join on
    * the shingle, union by inclusion–exclusion. Only candidate pairs
    * are scored, so the quadratic step never touches the full corpus. */
  def d5Jaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    jaccardPairsBuild(spark, dir).orderBy($"doc_a", $"doc_b")
  }

  /** The unsorted d5 pair set — c1/c11/c17/c18 and the component
    * assignment consume it under semi-joins, where d5's presentation
    * sort is wasted work. NOT a session-persisted view: round-15
    * measured that a cached pairs InMemoryRelation gets plan-matched
    * INTO c17's large composed tree by the CacheManager and costs c17
    * ~4.5 s of wall (the cache boundary blocks the semi-join pushdown
    * the uncached subtree enjoys), more than the ~1 s it saves across
    * the smaller consumers. */
  private[operators] def sharedJaccardPairs(spark: SparkSession,
      dir: String): DataFrame = jaccardPairsBuild(spark, dir)

  private[operators] def jaccardPairsBuild(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (docSh, sigs) = sharedSigs(spark, dir)
    val cand = candidates(sigs)
      .scopedPersist() // id filter + intersection + output
    // candidates are rare: broadcast their ids and score only those docs,
    // so the corpus-wide shingle frame is never shuffled for the join
    val candIds = cand
      .select(explode(array($"doc_a", $"doc_b")).as("doc_id")).distinct()
    val shCand = docSh.join(broadcast(candIds), "doc_id")
      .scopedPersist() // card + both join sides
    val card = shCand.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val inter = shCand.select($"doc_id".as("doc_a"), $"s")
      .join(cand, "doc_a")
      .join(shCand.select($"doc_id".as("doc_b"), $"s"), Seq("doc_b", "s"))
      .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(card.select($"doc_id".as("doc_a"), $"n".as("n_a")), "doc_a")
      .join(card.select($"doc_id".as("doc_b"), $"n".as("n_b")), "doc_b")
      .select($"doc_a", $"doc_b",
        round($"n_inter" / ($"n_a" + $"n_b" - $"n_inter"), 4).as("jaccard"))
      .filter($"jaccard" >= 0.5)
  }

  /** D171: idf-WEIGHTED Jaccard over the d4 LSH candidate pairs —
    * resemblance where rare shingles count more. Weight
    * w(s) = N div df(s) (integer division, exact on both engines):
    * a hapax shingle weighs N, corpus-wide boilerplate weighs ~1, so
    * the measure separates template near-dups (shared boilerplate
    * inflates PLAIN Jaccard) from true content overlap — the weighted
    * variant a production near-dup pass thresholds on when templated
    * corpora (web boilerplate, license headers) poison the unweighted
    * score. W∩ and the per-doc totals are exact BIGINT sums;
    * W∪ = W_a + W_b − W∩ by inclusion–exclusion; the ratio is one
    * double division rounded 4-dp.
    *
    * Scale shape: scores ONLY the d4 capped candidate set with the d5
    * broadcast-candidate-ids discipline (the corpus shingle frame is
    * never shuffled for the join); weights come from one
    * map-side-combined df pass. */
  def d23WeightedJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (docSh, sigs) = sharedSigs(spark, dir)
    val nDocs = Tables.documents(spark, dir).count()
    val cand = candidates(sigs)
      .scopedPersist() // id filter + intersection + output
    val candIds = cand
      .select(explode(array($"doc_a", $"doc_b")).as("doc_id")).distinct()
    val wgt = docSh.groupBy($"s").agg(count(lit(1)).as("df"))
      .select($"s", expr(s"CAST($nDocs AS BIGINT) div df").as("w"))
    val shw = docSh.join(broadcast(candIds), "doc_id")
      .join(wgt, "s")
      .scopedPersist() // totals + both join sides
    val tot = shw.groupBy($"doc_id").agg(sum($"w").as("wt"))
    val inter = shw.select($"doc_id".as("doc_a"), $"s", $"w")
      .join(cand, "doc_a")
      .join(shw.select($"doc_id".as("doc_b"), $"s"), Seq("doc_b", "s"))
      .groupBy($"doc_a", $"doc_b").agg(sum($"w").as("w_inter"))
    inter
      .join(tot.select($"doc_id".as("doc_a"), $"wt".as("w_a")), "doc_a")
      .join(tot.select($"doc_id".as("doc_b"), $"wt".as("w_b")), "doc_b")
      .select($"doc_a", $"doc_b", $"w_inter",
        ($"w_a" + $"w_b" - $"w_inter").as("w_union"),
        round($"w_inter".cast("double") /
          ($"w_a" + $"w_b" - $"w_inter").cast("double"), 4).as("w_jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** D112: MinHash estimator fidelity audit — for every LSH candidate
    * pair, the k=[[numHashes]] signature-overlap estimate (d4's
    * `est_sim`) next to the EXACT shingle Jaccard (d5's measurand,
    * unfiltered) and their absolute error. The "measure, don't guess"
    * gate on the sketch itself: before trusting d4's estimates at
    * corpus scale, quantify how wrong a k=8 sketch actually is on this
    * corpus (E[err] ~ √(j(1−j)/k) ≈ 0.17 at j=0.5 — if the observed
    * error is materially worse, the hash family is broken, not noisy).
    *
    * Scale shape: everything reuses the session-cached shingle and
    * signature frames ([[sharedSigs]]); exact Jaccard is computed only
    * on the candidate set (the d5 broadcast-ids discipline), and the
    * error is arithmetic on two already-4-dp numbers. */
  def d17MinhashFidelity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (docSh, sigs) = sharedSigs(spark, dir)
    val cand = candidates(sigs)
      .scopedPersist() // ids + est join + true join
    val candIds = cand
      .select(explode(array($"doc_a", $"doc_b")).as("doc_id")).distinct()
    val shCand = docSh.join(broadcast(candIds), "doc_id")
      .scopedPersist()
    val card = shCand.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val inter = shCand.select($"doc_id".as("doc_a"), $"s")
      .join(cand, "doc_a")
      .join(shCand.select($"doc_id".as("doc_b"), $"s"), Seq("doc_b", "s"))
      .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("n_inter"))
    val sa = sigs.select($"doc_id".as("doc_a") +:
      (0 until numHashes).map(i => col(s"sig$i").as(s"a$i")): _*)
    val sb = sigs.select($"doc_id".as("doc_b") +:
      (0 until numHashes).map(i => col(s"sig$i").as(s"b$i")): _*)
    val eq = (0 until numHashes)
      .map(i => when(col(s"a$i") === col(s"b$i"), 1.0).otherwise(0.0))
      .reduce(_ + _)
    cand
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .join(card.select($"doc_id".as("doc_a"), $"n".as("n_a")), "doc_a")
      .join(card.select($"doc_id".as("doc_b"), $"n".as("n_b")), "doc_b")
      .join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("ni", coalesce($"n_inter", lit(0L)))
      .select($"doc_a", $"doc_b",
        round(eq / numHashes, 4).as("est_sim"),
        round($"ni" / ($"n_a" + $"n_b" - $"ni"), 4).as("true_jaccard"))
      .withColumn("abs_err", round(abs($"est_sim" - $"true_jaccard"), 4))
      .orderBy($"doc_a", $"doc_b")
  }

  /** The (bands, rowsPerBand) configurations [[d18LshTuning]] sweeps —
    * every factorization of the k=[[numHashes]] signature. */
  val lshSweep: Seq[(Int, Int)] = Seq((8, 1), (4, 2), (2, 4))

  /** d18 tuning-sample size: FIXED, not proportional (the
    * ivfTrainSample argument): a banding configuration's
    * recall/precision estimate converges long before corpus size
    * matters, while the widest sweep config's candidate set is
    * inherently ~quadratic in corpus size (single-component collisions
    * scale with n² at any fixed background Jaccard). The round-8 ×10
    * scale audit measured the unsampled instrument at >80× growth;
    * sampling makes the sweep corpus-size-INDEPENDENT after one
    * hash-ordered top-N pass. */
  val tuneSample = 4096

  /** D117: LSH banding-parameter sweep — for each (b, r) factorization
    * of the k=8 signature, the candidate-pair count, how many of the
    * TRUE near-dup pairs (exact Jaccard ≥ 0.5) each configuration
    * recovers, and the recall/precision that implies. The tuning
    * instrument BEHIND d4's fixed 4×2 choice: the b·r tradeoff
    * (more bands → higher recall, more candidates) measured on the
    * actual corpus instead of assumed from the S-curve formula.
    *
    * Ground truth = exact Jaccard ≥ 0.5 scored over the MOST
    * PERMISSIVE configuration's candidates ((8,1): any shared
    * component); exact all-pairs truth is corpus² and is precisely
    * what LSH exists to avoid — the bounded proxy is the standard
    * practice and is documented in the output's semantics.
    *
    * Scale shape: the sweep runs on a deterministic hash-ordered
    * [[tuneSample]]-doc sample (fixed size — see the constant's doc;
    * one TakeOrdered corpus pass, then everything downstream is
    * corpus-size-independent), with signatures from the session cache;
    * each config is one band explode + bucket self-join with the SAME
    * [[maxBucket]] skew cap as the d4 production path (an instrument
    * should measure the capped pipeline that actually ships); exact
    * scoring touches only the (8,1) candidate set (d5 broadcast-ids
    * discipline). The 3-row summary assembles driver-side from scalar
    * counts (the p11 bounded-driver-data pattern). */
  def d18LshTuning(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sampleIds = Tables.documents(spark, dir)
      .orderBy(md5($"doc_id".cast("string")), $"doc_id")
      .limit(tuneSample).select($"doc_id")
    val (docShAll, sigsAll) = sharedSigs(spark, dir)
    val docSh = docShAll.join(broadcast(sampleIds), "doc_id")
    val sigs = sigsAll.join(broadcast(sampleIds), "doc_id")
    lshSweepRows(docSh, sigs)
      .toDF("bands", "rows_per_band", "n_candidates", "n_true_found",
        "recall", "precision")
      .orderBy($"bands".desc)
  }

  /** The [[d18LshTuning]] sweep core, shared with the
    * `GraftMinHash` Estimator's fit (which runs it over a USER
    * dataset instead of the fixture table): given a SAMPLE-bounded
    * (doc_id, s) shingle frame and its sig0..sig{k−1} signature
    * frame, evaluate every [[lshSweep]] banding configuration with
    * the production [[maxBucket]] skew cap and return one
    * (bands, rowsPerBand, nCandidates, nTrueFound, recall, precision)
    * tuple per configuration. Truth = exact Jaccard ≥ 0.5 over the
    * most permissive configuration's candidates (the documented
    * bounded proxy — exact all-pairs truth is sample² and is what LSH
    * exists to avoid). Caller bounds the inputs; everything here is
    * sample-sized. */
  private[graft] def lshSweepRows(docSh: DataFrame, sigs: DataFrame)
      : Seq[(Int, Int, Long, Long, Double, Double)] = {
    val spark = docSh.sparkSession
    import spark.implicits._
    // ONE fused banded pass over every sweep configuration (round-15
    // optimization, guide §2.4): the old per-config pipeline re-ran
    // bands → bucket census → self-join → distinct once per (b, r)
    // and paid two driver actions per config (2 + 2·|sweep| jobs,
    // each multi-exchange). Keying the identical computation by a
    // config ordinal `ci` runs the census/join/distinct ONCE over the
    // union of all configs' bands (8+4+2 band hashes per doc vs 8,
    // then 4, then 2) and reduces the readout to three aggregate
    // actions total. Per-config semantics are unchanged: every
    // grouping/join key carries `ci`, so buckets, the maxBucket skew
    // cap, and pair dedup never mix configurations.
    val entries = lshSweep.zipWithIndex.flatMap { case ((b, r), ci) =>
      (0 until b).map { i =>
        val parts = (0 until r).map(j => col(s"sig${i * r + j}"))
        struct(lit(ci).as("ci"), lit(i).as("bi"),
          md5(concat_ws("|", parts: _*)).as("bh"))
      }
    }
    val bands = sigs.select($"doc_id", explode(array(entries: _*)).as("e"))
      .select($"doc_id", $"e.ci".as("ci"), $"e.bi".as("bi"), $"e.bh".as("bh"))
    val ok = bands.groupBy($"ci", $"bi", $"bh").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" <= maxBucket).select($"ci", $"bi", $"bh")
    val keep = bands.join(ok, Seq("ci", "bi", "bh"))
    val pairs = keep.select($"ci", $"bi", $"bh", $"doc_id".as("doc_a"))
      .join(keep.select($"ci", $"bi", $"bh", $"doc_id".as("doc_b")),
        Seq("ci", "bi", "bh"))
      .filter($"doc_a" < $"doc_b")
      .select($"ci", $"doc_a", $"doc_b").distinct()
      .scopedPersist()
    // truth stays defined over the most permissive configuration's
    // candidates, exactly as before
    val widestCi = lshSweep.indexWhere { case (b, r) => b == 8 && r == 1 }
    val widest = pairs.filter($"ci" === widestCi).select($"doc_a", $"doc_b")
    val candIds = widest
      .select(explode(array($"doc_a", $"doc_b")).as("doc_id")).distinct()
    val shCand = docSh.join(broadcast(candIds), "doc_id")
      .scopedPersist()
    val card = shCand.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val truth = shCand.select($"doc_id".as("doc_a"), $"s")
      .join(widest, "doc_a")
      .join(shCand.select($"doc_id".as("doc_b"), $"s"), Seq("doc_b", "s"))
      .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("n_inter"))
      .join(card.select($"doc_id".as("doc_a"), $"n".as("n_a")), "doc_a")
      .join(card.select($"doc_id".as("doc_b"), $"n".as("n_b")), "doc_b")
      .filter(round($"n_inter" / ($"n_a" + $"n_b" - $"n_inter"), 4) >= 0.5)
      .select($"doc_a", $"doc_b")
      .scopedPersist()
    val nTruth = truth.count()
    val nCand: Map[Int, Long] = pairs.groupBy($"ci")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nFound: Map[Int, Long] = pairs
      .join(truth, Seq("doc_a", "doc_b"), "left_semi")
      .groupBy($"ci").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    def r4(v: Double) =
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    lshSweep.zipWithIndex.map { case ((b, r), ci) =>
      val c = nCand.getOrElse(ci, 0L)
      val f = nFound.getOrElse(ci, 0L)
      (b, r, c, f,
        if (nTruth > 0) r4(f.toDouble / nTruth.toDouble) else 0.0,
        if (c > 0) r4(f.toDouble / c.toDouble) else 0.0)
    }
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

  /** 16-bit bands over the d25 64-bit simhash: Hamming ≤
    * [[simhashMaxHam]] = bands − 1 pairs are GUARANTEED to share a
    * band (pigeonhole — the Manku/Jarvelin/Sarlós web-dedup recall
    * argument). */
  val simhashBands = 4
  val simhashMaxHam = 3

  /** 64-bit simhash per document (d6's construction widened: two
    * 32-bit md5-derived token halves so no value ever exceeds the
    * signed-long cast range; bit 63 rides the sign bit, which is just
    * a bit pattern to XOR/popcount). */
  private[operators] def simhash64(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val toks = docs.select($"doc_id", explode(tokens($"text")).as("t"))
      .withColumn("hlo", conv(substring(md5($"t"), 1, 8), 16, 10).cast("long"))
      .withColumn("hhi", conv(substring(md5($"t"), 9, 8), 16, 10).cast("long"))
    val bitSums = (0 until 64).map { i =>
      val h = if (i < 32) $"hlo" else $"hhi"
      val off = if (i < 32) i else i - 32
      sum(when(shiftright(h, off).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"bit$i")
    }
    val agg = toks.groupBy($"doc_id").agg(bitSums.head, bitSums.tail: _*)
    // ascending i keeps every partial sum ≤ 2^63−1 before the single
    // negative (bit-63) term lands — no overflow in either engine
    val fp = (0 until 64)
      .map(i => when(col(s"bit$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    agg.select($"doc_id", fp.as("sim"))
  }

  /** D271: simhash Hamming near-dup pairs — the PAIRING stage d6's
    * fingerprints exist for: band the 64-bit simhash into
    * [[simhashBands]] 16-bit keys, bucket-join on any equal band
    * (pigeonhole: every Hamming ≤ [[simhashMaxHam]] pair shares one),
    * and verify candidates by the EXACT Hamming distance (XOR +
    * popcount). Complements d3/d4's MinHash (token-SET similarity)
    * with the bit-level signal that survives small token
    * substitutions, and d19's winnowing (ordered n-grams).
    *
    * Scale shape: one token explode + partial-aggregated 64-column
    * bit census per doc; the candidate join is banding + bucket
    * self-join with the d4 [[maxBucket]] hot-bucket cap (a 16-bit
    * band has 65,536 values — a boilerplate-heavy corpus WILL
    * concentrate, and the cap is the same documented recall trade d4
    * makes); verification touches candidate pairs only, carrying two
    * longs each. Never all-pairs. */
  def d25SimhashPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.CacheScope.ScopedPersist
    val sims = simhash64(Tables.documents(spark, dir)
      .select($"doc_id", $"text")).scopedPersist()
    val banded = sims.select($"doc_id", $"sim",
        explode(typedLit((0 until simhashBands).toArray)).as("b"))
      .withColumn("bv", expr("shiftright(sim, b * 16) & 65535"))
    val ok = banded.groupBy($"b", $"bv").agg(count(lit(1)).as("n"))
      .filter($"n" <= maxBucket).select($"b", $"bv")
    val keyed = banded.join(ok, Seq("b", "bv"))
      .select($"b", $"bv", $"doc_id", $"sim")
    val pairs = keyed.as("x").join(keyed.as("y"),
        $"x.b" === $"y.b" && $"x.bv" === $"y.bv" &&
          $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"),
        $"x.sim".as("sa"), $"y.sim".as("sb"))
      .distinct()
    pairs.select($"doc_a", $"doc_b",
        expr("CAST(bit_count(sa ^ sb) AS INT)").as("hamming"))
      .filter($"hamming" <= simhashMaxHam)
      .orderBy($"doc_a", $"doc_b")
  }

  /** Deterministic train/test split modulus for d7 (test = 5%). */
  val testModulus = 20
  /** Test-side document-frequency cap per shingle for d7: an n-gram
    * present in more than this many TEST documents is boilerplate, not
    * contamination signal — and it is exactly the hot join key that
    * would skew the probe, so dropping it is both hygiene and the skew
    * guard (same role as [[maxBucket]] for LSH buckets). */
  val maxShingleDf = 100

  /** D18-extension: train/test decontamination — for every train
    * document, the test documents it shares ≥ [[minSharedShingles]]
    * distinct word 3-grams with (the eval-leakage scan every training
    * corpus needs before a model sees it).
    *
    * Shape: the corpus is exploded ONCE (the shared persisted shingle
    * frame d3–d5 also use); the test side (5% of docs) is DF-capped,
    * then train⋈test is a plain equi-join on the shingle — keyed on
    * values, never all-pairs, with AQE's runtime bloom/skew handling
    * applicable because it is a standard shuffle join. The pair
    * aggregate carries (train, test, count) only. */
  val minSharedShingles = 2
  def d7Decontaminate(spark: SparkSession, dir: String): DataFrame =
    decontaminatePairs(sharedSigs(spark, dir)._1) // distinct (doc_id, s)

  /** Core of [[d7Decontaminate]] over any DISTINCT (doc_id, s) frame. */
  def decontaminatePairs(sh: DataFrame): DataFrame = {
    import sh.sparkSession.implicits._
    val test = sh.filter($"doc_id" % testModulus === 0)
      .select($"doc_id".as("test_id"), $"s")
    val okShingles = test.groupBy($"s")
      .agg(count(lit(1)).as("df")).filter($"df" <= maxShingleDf)
      .select($"s") // vocabulary-sized: stays a shuffle join (no broadcast)
    val train = sh.filter($"doc_id" % testModulus =!= 0)
      .select($"doc_id".as("train_id"), $"s")
    train.join(test.join(okShingles, "s"), "s")
      .groupBy($"train_id", $"test_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter($"n_shared" >= minSharedShingles)
      .orderBy($"train_id", $"test_id")
  }

  /** Containment threshold for [[d12Containment]]. */
  val containmentMin = 0.5

  /** D74: shingle CONTAINMENT pairs — Broder's asymmetric near-dup
    * measure (|A∩B| / min(|A|,|B|)): a short document quoted inside a
    * long one has low Jaccard RESEMBLANCE (d5 misses it by design) but
    * high containment. MinHash/LSH approximates resemblance only, so
    * candidates come from the d7 rare-shingle route instead: explode
    * distinct (doc, shingle), keep shingles with df ≤ [[maxShingleDf]]
    * (the skew cap), self-equi-join on the shingle — fan-out ≤ df² per
    * rare shingle, never all-pairs.
    *
    * The exact intersection is split by shingle rarity so candidate
    * pairs are never joined back to the full corpus (that back-join is
    * |cand|·shingles-per-doc rows — ~60M at sf0.1, the operator's old
    * bottleneck): the RARE part of |A∩B| falls out of the candidate
    * self-join itself (groupBy pair instead of distinct — same
    * shuffle), and n_shared ≤ n_rare + min(common_a, common_b) gives
    * an exact upper-bound prune against the broadcast per-doc stats,
    * so only pairs that can still reach [[containmentMin]] pay the
    * COMMON-shingle (df > cap, boilerplate — a vanishing fraction of
    * any real corpus) intersection join. Ratios are exact integer
    * divisions rounded at 4 dp; the ≥ threshold compare happens on
    * the raw ratio identically in both engines.
    *
    * Exact-duplicate collapse (round-8 scale audit): every shingle
    * stat above is CONTENT-determined, so the whole pair pipeline runs
    * on one representative per distinct content (df stays corpus-level
    * — identical rare sets) and the results expand back to all member
    * pairs afterwards; the output is bitwise what the direct pipeline
    * produces (same oracle, same spec replay), but a duplication
    * factor k no longer multiplies pair work by k² — the ×10 audit
    * (×10 exact copies) measured the direct form at >450 s vs ~3 s
    * collapsed. Within-group pairs (identical contents) short-circuit:
    * they exist iff the content has ≥ 1 rare shingle, with
    * n_shared = n_a = n_b = n and containment exactly 1.0 — the same
    * emission rule the pair pipeline would apply. */
  def d12Containment(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sh = sharedSigs(spark, dir)._1 // distinct (doc_id, s)
    // exact-dup collapse: one representative doc per distinct content
    val h = Tables.documents(spark, dir).select($"doc_id",
      md5(regexp_replace(trim(lower($"text")), "\\s+", " ")).as("ch"))
    val reps = h.groupBy($"ch").agg(min($"doc_id").as("doc_id"))
      .scopedPersist() // shingle filter + expansion
    val shR = sh.join(reps.select($"doc_id"), "doc_id")
    // df over the FULL corpus (collapse must not change the rare set)
    val rare = sh.groupBy($"s").agg(count(lit(1)).as("df"))
      .filter($"df" <= maxShingleDf).select($"s")
    val rsh = shR.join(rare, "s")
      .scopedPersist() // pair join + within-group
    // rare-side intersection counts come straight off the candidate
    // self-join — the pair aggregate replaces the old distinct()
    val rpair = rsh.select($"s", $"doc_id".as("doc_a"))
      .join(rsh.select($"s", $"doc_id".as("doc_b")), "s")
      .filter($"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("n_rare"))
    // boilerplate shingles (df > cap); tiny by construction
    val csh = shR.join(rare, Seq("s"), "left_anti")
      .scopedPersist() // stats + both join sides
    val sizes = shR.groupBy($"doc_id").agg(count(lit(1)).as("n"))
      .join(csh.groupBy($"doc_id").agg(count(lit(1)).as("c")),
        Seq("doc_id"), "left")
      .withColumn("c", coalesce($"c", lit(0L)))
      .scopedPersist() // prune + within-group n
    // n_shared ≤ n_rare + min(c_a, c_b): drop pairs that cannot reach
    // the threshold before paying the common-intersection join
    val pruned = rpair
      .join(broadcast(sizes.select($"doc_id".as("doc_a"),
        $"n".as("n_a"), $"c".as("c_a"))), "doc_a")
      .join(broadcast(sizes.select($"doc_id".as("doc_b"),
        $"n".as("n_b"), $"c".as("c_b"))), "doc_b")
      .filter(($"n_rare" + least($"c_a", $"c_b")).cast("double")
        >= lit(containmentMin) * least($"n_a", $"n_b"))
      .scopedPersist() // cinter probe + final join
    val cinter = pruned.select($"doc_a", $"doc_b")
      .join(csh.select($"doc_id".as("doc_a"), $"s"), "doc_a")
      .join(csh.select($"doc_id".as("doc_b"), $"s"), Seq("doc_b", "s"))
      .groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("n_c"))
    // representative-level results between DISTINCT contents
    val repPairs = pruned
      .join(cinter, Seq("doc_a", "doc_b"), "left")
      .withColumn("n_shared", $"n_rare" + coalesce($"n_c", lit(0L)))
      .withColumn("c",
        $"n_shared".cast("double") / least($"n_a", $"n_b"))
      .filter($"c" >= containmentMin)
      .select($"doc_a", $"doc_b", $"n_shared", $"n_a", $"n_b", $"c")
    // expand cross-content pairs to every member combination; a member
    // pair that flips the id order swaps the (n_a, n_b) sides
    val chOf = reps.select($"doc_id", $"ch")
    val members = h.select($"ch", $"doc_id".as("mid"))
    val cross = repPairs
      .join(chOf.select($"doc_id".as("doc_a"), $"ch".as("ch_a")), "doc_a")
      .join(chOf.select($"doc_id".as("doc_b"), $"ch".as("ch_b")), "doc_b")
      .join(members.select($"ch".as("ch_a"), $"mid".as("ida")), "ch_a")
      .join(members.select($"ch".as("ch_b"), $"mid".as("idb")), "ch_b")
      .select(
        least($"ida", $"idb").as("doc_a"),
        greatest($"ida", $"idb").as("doc_b"),
        $"n_shared",
        when($"ida" < $"idb", $"n_a").otherwise($"n_b").as("n_a"),
        when($"ida" < $"idb", $"n_b").otherwise($"n_a").as("n_b"),
        $"c")
    // within-group pairs: identical contents pair iff the content has
    // >= 1 rare shingle (the emission rule); containment is exactly 1
    val withRare = rsh.select($"doc_id").distinct()
      .join(chOf, "doc_id")
      .join(sizes.select($"doc_id", $"n"), "doc_id")
      .select($"ch", $"n")
    val within = members.join(withRare, "ch")
      .select($"ch", $"mid".as("ida"), $"n")
      .join(members.select($"ch", $"mid".as("idb")), "ch")
      .filter($"ida" < $"idb")
      .select($"ida".as("doc_a"), $"idb".as("doc_b"),
        $"n".as("n_shared"), $"n".as("n_a"), $"n".as("n_b"),
        ($"n".cast("double") / $"n").as("c"))
    cross.unionByName(within)
      .select($"doc_a", $"doc_b", $"n_shared", $"n_a", $"n_b",
        round($"c", 4).as("containment"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** D76: per-document contamination score — for every TEST document
    * (the d7 modulus split), the fraction of its distinct word 3-grams
    * that appear in ANY train document. d7/d10 list contaminated
    * PAIRS; this is the per-doc decision metric an eval-hygiene gate
    * actually thresholds on ("drop test docs more than X% covered by
    * the training corpus").
    *
    * Shape: the train side collapses to its distinct shingle
    * vocabulary first, so the probe is a left-semi-style join where
    * each test shingle matches AT MOST ONCE — zero fan-out, no df cap
    * needed (unlike the pair queries, boilerplate shingles cannot
    * skew the output, only the join; AQE skew handling covers that).
    * Everything else is per-doc partial aggregation. */
  def d13ContaminationScore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sh = sharedSigs(spark, dir)._1 // distinct (doc_id, s)
    val testSh = sh.filter($"doc_id" % testModulus === 0)
    val trainVocab = sh.filter($"doc_id" % testModulus =!= 0)
      .select($"s").distinct()
    val hit = testSh.join(trainVocab, Seq("s"), "left_semi")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_contaminated"))
    testSh.groupBy($"doc_id").agg(count(lit(1)).as("n_shingles"))
      .join(hit, Seq("doc_id"), "left")
      .withColumn("n_contaminated", coalesce($"n_contaminated", lit(0L)))
      .select($"doc_id", $"n_shingles", $"n_contaminated",
        round($"n_contaminated".cast("double") / $"n_shingles", 4)
          .as("contamination"))
      .orderBy($"doc_id")
  }

  /** Bloom false-positive rate for [[d10BloomDecontaminate]] — output
    * is exact regardless (survivors are verified by the real join);
    * the rate only sets how much doomed train traffic leaks into the
    * shuffle. */
  val bloomFpp = 0.01

  /** D18-extension: Bloom-prefiltered decontamination — the same
    * leakage semantics as d7, rolled up per train document, with the
    * train side pruned BEFORE the shuffle by a Bloom filter built over
    * the test shingle vocabulary.
    *
    * Why this exists: d7's join shuffles every train shingle. At 100 TB
    * the train side is ~everything and the test/eval side is a fixed
    * sliver, so the right plan inverts the asymmetry — build a Bloom
    * filter on the small side (one distributed aggregate, bit-array
    * merge on the driver), broadcast it, and drop the ≥99% of train
    * shingles that cannot match while they are still map-side local.
    * Only might-contain survivors (true leaks + [[bloomFpp]] false
    * positives) reach the exchange; the equi-join then verifies
    * exactly, so false positives cost traffic, never correctness. */
  def d10BloomDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sh = sharedSigs(spark, dir)._1 // distinct (doc_id, s)
    val test = sh.filter($"doc_id" % testModulus === 0)
      .select($"doc_id".as("test_id"), $"s")
    // row count upper-bounds the distinct-shingle count — a cheap scan
    // of the persisted frame; oversizing only widens the bit array
    val bloom = test.stat.bloomFilter("s", math.max(test.count(), 1000L), bloomFpp)
    val bc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((s: String) => bc.value.mightContain(s))
    val train = sh.filter($"doc_id" % testModulus =!= 0)
      .select($"doc_id".as("train_id"), $"s")
      .filter(mightContain($"s"))
    val okShingles = test.groupBy($"s")
      .agg(count(lit(1)).as("df")).filter($"df" <= maxShingleDf)
      .select($"s")
    train.join(test.join(okShingles, "s"), "s")
      .groupBy($"train_id", $"test_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter($"n_shared" >= minSharedShingles)
      .groupBy($"train_id")
      .agg(count(lit(1)).as("n_test_docs"),
        sum($"n_shared").as("n_shared_total"))
      .orderBy($"train_id")
  }

  /** Incoming-batch modulus for [[d11IncrementalDedup]] — doc_id %
    * [[ingestModulus]] == 0 plays the "newly arrived" batch, the rest
    * the already-ingested corpus. */
  val ingestModulus = 5

  /** D18-extension: INCREMENTAL ingest dedup — classify each incoming
    * document against the existing corpus WITHOUT re-deduping the
    * corpus itself: `exact_dup` if its normalized-text hash already
    * exists, else `near_dup` if any of its LSH band buckets is already
    * occupied (the d4 banding as a persistent index probe), else
    * `new`.
    *
    * Scale shape: this is the production steady-state of d1/d4 — the
    * O(corpus) work happened at index-build time; per batch, both
    * probes are semi-joins of |batch| keys against key-only index
    * tables (hash → ids never widen, no text moves), so daily ingest
    * costs O(batch), not O(corpus). Verdict precedence exact > near
    * mirrors the cheap-check-first cascade a real pipeline runs. */
  def d11IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hashes = Tables.documents(spark, dir)
      .select($"doc_id",
        md5(regexp_replace(trim(lower($"text")), "\\s+", " ")).as("ch"))
    incrementalVerdicts(hashes, bandRows(sharedSigs(spark, dir)._2))
  }

  /** Core of d11 over prebuilt index frames: `hashes` = (doc_id, ch),
    * `buckets` = (doc_id, band_idx, band_hash); the incoming batch is
    * doc_id % [[ingestModulus]] == 0. Extracted so the spec can inject
    * synthetic exact duplicates (the fixture corpus has none). */
  private[graft] def incrementalVerdicts(hashes: DataFrame,
      buckets: DataFrame): DataFrame = {
    import hashes.sparkSession.implicits._
    val isNew = col("doc_id") % ingestModulus === 0
    val exactHit = hashes.filter(isNew)
      .join(hashes.filter(!isNew).select($"ch").distinct(), Seq("ch"), "left_semi")
      .select($"doc_id").withColumn("is_exact", lit(true))
    val nearHit = buckets.filter(isNew)
      .join(buckets.filter(!isNew).select($"band_idx", $"band_hash").distinct(),
        Seq("band_idx", "band_hash"), "left_semi")
      .select($"doc_id").distinct().withColumn("is_near", lit(true))
    hashes.filter(isNew).select($"doc_id")
      .join(exactHit, Seq("doc_id"), "left")
      .join(nearHit, Seq("doc_id"), "left")
      .select($"doc_id",
        when($"is_exact", "exact_dup")
          .when($"is_near", "near_dup")
          .otherwise("new").as("verdict"))
      .orderBy($"doc_id")
  }

  /** Iteration cap for [[d8Components]] label propagation — generous:
    * rounds needed = max component diameter, and near-dup clusters are
    * small, dense clumps (diameter ≤ a few hops). */
  val maxLabelIters = 30

  /** D18-extension: near-dup CLUSTER ASSIGNMENT — connected components
    * over the d5 jaccard-confirmed pairs, the step that turns pairwise
    * near-dup evidence into an actionable "keep one doc per cluster"
    * decision (d5 alone can say {a,b} and {b,c} are near-dups; only the
    * component {a,b,c} tells you to keep exactly one of the three).
    *
    * Algorithm: min-label propagation to fixpoint. labels start as
    * label(v)=v; each round every node takes the min of its own and all
    * neighbors' labels — one co-partitioned shuffle join keyed on node
    * id per round, O(max component diameter) rounds. Convergence is
    * detected by the sum of labels (strictly decreasing until fixed),
    * one scalar per round on the driver. Near-dup components are tiny
    * and dense, so this terminates in a few rounds at any corpus size;
    * components only ever receive labels (never text), so the loop's
    * shuffle volume is 2·|pairs| longs per round.
    *
    * Every round is `localCheckpoint`ed: each `next` references the
    * previous labels twice (union + join side), so WITHOUT lineage
    * truncation the logical tree triples per round and Catalyst
    * analysis/canonicalization — not execution — becomes the cost
    * (measured 30s+ at sf0.1 with persist-only; 0.1s/round
    * checkpointed). The iterative-algorithm rule: persist caches data,
    * only checkpointing caps plan growth. A long-lived production job
    * would use reliable `checkpoint()` (HDFS) for executor-loss
    * recovery; the truncation effect is identical.
    *
    * Output: every document with its cluster id (= min doc_id of its
    * component; singletons are their own cluster) and an is_rep flag
    * marking the one kept representative per cluster. */
  def d8Components(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    componentAssignment(spark, dir).orderBy($"doc_id")
  }

  /** Session-scoped cache of the component assignment — the
    * propagation loop's checkpointed result frames stay valid for the
    * session's lifetime, so d8 and c2 share one computation per
    * (session, dir), the same materialized-view treatment d3-d5 give
    * the signature frames. */
  private val compCache = scala.collection.concurrent.TrieMap
    .empty[(String, String), DataFrame]

  /** Unsorted (doc_id, cluster_id, is_rep) assignment — the composable
    * form ([[Pipeline]]'s c2 consumes it under a join, where a sort
    * would be wasted work at any scale). */
  def componentAssignment(spark: SparkSession, dir: String): DataFrame = {
    compCache.filterInPlace((_, v) => !v.sparkSession.sparkContext.isStopped)
    compCache.getOrElseUpdate(
      (System.identityHashCode(spark).toString, dir),
      computeComponentAssignment(spark, dir))
  }

  private def computeComponentAssignment(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = sharedJaccardPairs(spark, dir).select($"doc_a", $"doc_b")
    val edges = pairs.union(pairs.select($"doc_b", $"doc_a"))
      .toDF("u", "v").localCheckpoint()
    var labels = edges.select($"u").distinct()
      .select($"u", $"u".as("cluster")).localCheckpoint()
    var prevSum = labels.agg(coalesce(sum($"cluster"), lit(0L))).as[Long].head()
    var converged = edges.isEmpty
    var iters = 0
    while (!converged && iters < maxLabelIters) {
      val next = labels
        .union(edges.join(labels.withColumnRenamed("u", "v"), "v")
          .select($"u", $"cluster"))
        .groupBy($"u").agg(min($"cluster").as("cluster"))
        .localCheckpoint()
      val sum2 = next.agg(coalesce(sum($"cluster"), lit(0L))).as[Long].head()
      labels = next
      converged = sum2 == prevSum
      prevSum = sum2
      iters += 1
    }
    require(converged, s"label propagation did not converge in $maxLabelIters rounds")
    Tables.documents(spark, dir).select($"doc_id")
      .join(labels.withColumnRenamed("u", "doc_id"), Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"cluster", $"doc_id").as("cluster_id"))
      .withColumn("is_rep", ($"doc_id" === $"cluster_id").cast("int"))
  }

  /** Shared oracle CTE chain (built on [[jaccardCte]], which must be
    * prefixed with WITH RECURSIVE by the consumer) ending in
    * `assign(doc_id, cluster_id)` — the connected-component assignment
    * replay used by d8 and the c2 pipeline oracle. */
  // lazy: jaccardCte is declared later in this object (init order)
  private[operators] lazy val componentsCte: String =
    s"""$jaccardCte,
        edges AS (SELECT doc_a AS u, doc_b AS v FROM jp
                  UNION ALL SELECT doc_b AS u, doc_a AS v FROM jp),
        r(u, v) AS (SELECT u, u AS v FROM (SELECT DISTINCT u FROM edges)
                    UNION
                    SELECT r.u, e.v FROM r JOIN edges e ON r.v = e.u),
        comp AS (SELECT u, min(v) AS cluster_id FROM r GROUP BY u),
        assign AS (SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
                   FROM documents d LEFT JOIN comp c ON d.doc_id = c.u)"""

  /** Tokens per synthetic "line" for [[d15LineDedup]] — the fixture
    * text has no newlines, so consecutive 5-token chunks stand in for
    * the paragraph/line segmentation a real corpus gives for free. */
  val lineLen = 5
  /** A line present in ≥ this many DISTINCT documents is boilerplate. */
  val lineDupDocs = 2

  /** D84: cross-document duplicated-line removal with reassembly — the
    * CCNet/RefinedWeb line-dedup pass (strip nav bars, cookie banners,
    * licence blocks that repeat across pages) as a TRANSFORM: each
    * document is segmented into lines, lines whose exact text occurs
    * in ≥ [[lineDupDocs]] distinct documents are dropped corpus-wide,
    * and the survivors are reassembled in order. A line repeated only
    * WITHIN one document is kept (that is d1/t8 territory, not
    * boilerplate).
    *
    * Scale shape: segmentation is a pure array expression over a
    * pre-projected token column (the lambda touches only the bound
    * index and a per-row attribute — O(tokens) per doc); the
    * line-frequency census groups by md5(line) with a distinct-doc
    * pre-aggregation, so the wide shuffle carries 16-byte digests, not
    * text; the drop is a semi-join-shaped anti-join of lines against
    * the (small) boilerplate set; reassembly shuffles each kept line
    * once — unavoidable, it IS the output. */
  def d15LineDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", tokens($"text").as("tk"))
    val lines = toks.select($"doc_id",
        posexplode(transform(
          sequence(lit(0), (ceil(size($"tk") / lit(5.0)) - 1).cast("int")),
          i => concat_ws(" ", slice($"tk", i * lineLen + 1, lit(lineLen))))))
      .select($"doc_id", $"pos".as("line_id"), $"col".as("line"))
    val boiler = lines.select(md5($"line").as("h"), $"doc_id").distinct()
      .groupBy($"h").agg(count(lit(1)).as("dfc"))
      .filter($"dfc" >= lineDupDocs)
      .select($"h")
    val kept = lines.join(boiler, md5(lines("line")) === boiler("h"),
      "left_anti")
    val reassembled = kept.groupBy($"doc_id").agg(
      count(lit(1)).as("n_kept"),
      concat_ws(" ", transform(
        array_sort(collect_list(struct($"line_id", $"line"))),
        s => s.getField("line"))).as("clean_text"))
    toks.select($"doc_id",
        (ceil(size($"tk") / lit(5.0))).cast("long").as("n_lines"))
      .join(reassembled, Seq("doc_id"), "left")
      .select($"doc_id", $"n_lines",
        coalesce($"n_kept", lit(0L)).as("n_kept"),
        coalesce($"clean_text", lit("")).as("clean_text"))
      .orderBy($"doc_id")
  }

  /** D96: duplicate-count loss reweighting — the soft alternative to
    * dropping exact dups (keep every copy, weight each by 1/n_copies
    * so the GROUP contributes one document's worth of gradient; the
    * standard fix when upsampling-by-duplication was intentional but
    * loss should stay unbiased). Emits every document with its group
    * multiplicity, weight, and the is_canonical flag (min doc_id, the
    * d1/c2 convention).
    *
    * Determinism: weight = 1/n is one IEEE division of exact integers,
    * 4-dp; everything else is integer/flag.
    *
    * Scale shape: d1's hash-groupBy census (16-byte digests on the
    * shuffle) joined back to the corpus keyed on the digest — one
    * partial-agg groupBy + one shuffle join, no text wider than the
    * projection anywhere. */
  def d16DupWeights(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hashed = Tables.documents(spark, dir)
      .select($"doc_id", md5(regexp_replace(trim(lower($"text")),
        "\\s+", " ")).as("content_hash"))
    val census = hashed.groupBy($"content_hash")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
    hashed.join(census, "content_hash")
      .select($"doc_id", $"content_hash", $"n_copies",
        round(lit(1.0) / $"n_copies".cast("double"), 4).as("weight"),
        ($"doc_id" === $"keep_id").cast("int").as("is_canonical"))
      .orderBy($"doc_id")
  }

  /** D191: duplicate-rate growth curve — at ten ingestion-order
    * checkpoints (doc_id deciles of the id range, t34's cutoffs), the
    * cumulative fraction of documents whose exact normalized content
    * already appeared at a lower id: the crawl curator's "is the
    * source saturating" readout for DUPLICATES (t34 answers it for
    * vocabulary; c12 gives the final-state accounting, this gives the
    * trajectory — a rising curve says stop crawling, you're re-
    * fetching).
    *
    * Exactness: a document is a dup iff doc_id > min(doc_id) of its
    * d16 content hash — pure integer predicates; dup_frac is one 4-dp
    * division.
    *
    * Scale shape: the t34 pattern on the d16 census — one content-hash
    * first-occurrence aggregate (hash-domain-sized, partial-
    * aggregated), one doc-keyed join, ONE map-side aggregate holding
    * all ten conditional sums, 10-row result assembled driver-side
    * from the scalar frame (no window, no explode, no cross join). */
  def d24DupGrowth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", md5(regexp_replace(trim(lower($"text")),
        "\\s+", " ")).as("ch"))
    val b = docs.agg(min($"doc_id"), max($"doc_id")).head()
    val (mn, mx) = (b.getLong(0), b.getLong(1))
    val span = mx - mn + 1
    val cuts = (1 to 10).map(i => mn - 1 + span * i / 10)
    val first = docs.groupBy($"ch").agg(min($"doc_id").as("fd"))
    val j = docs.join(first, "ch")
      .select($"doc_id", ($"doc_id" > $"fd").cast("long").as("dup"))
    val aggs = cuts.flatMap(c => Seq(
      sum(when($"doc_id" <= c, 1L).otherwise(0L)),
      sum(when($"doc_id" <= c, $"dup").otherwise(0L))))
    val row = j.agg(aggs.head, aggs.tail: _*).head()
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    (1 to 10).map { i =>
      val (n, d) = (row.getLong(2 * (i - 1)), row.getLong(2 * i - 1))
      (i.toLong, cuts(i - 1), n, d, r4(d.toDouble / n.toDouble))
    }.toDF("decile", "cutoff_id", "n_docs", "n_dupes", "dup_frac")
      .orderBy($"decile")
  }

  /** d20 exact-substring gram width (characters). */
  val subK = 40
  /** d20 train-side sampling stride: only every [[subStride]]-th
    * offset of a TRAIN document is indexed; the probe side hashes
    * every offset, so any shared verbatim run of at least
    * subK + subStride − 1 characters is GUARANTEED to match (the
    * asymmetric index of Lee et al., ACL 2022 "Deduplicating Training
    * Data Makes Language Models Better", suffix-array semantics
    * re-expressed as a sampled hash join). */
  val subStride = 8

  /** D130: exact-substring contamination pairs — (train, eval) doc
    * pairs sharing a ≥ subK+subStride−1 character VERBATIM run. The
    * shingle routes (d7/d13) catch paraphrase-level overlap; this is
    * the stricter "the eval answer string is literally inside a
    * training document" leak check, with char-level precision.
    *
    * Scale shape: the train index is 1/[[subStride]] of train chars
    * (sampled offsets only) — the probe side hashes all its offsets,
    * but eval sets are small by construction (d7's asymmetry). Both
    * sides are (id, hash) projections — no text ever shuffles; the
    * match join is equi on the 16-byte hash. `n_grams` counts
    * DISTINCT matched grams per pair. */
  def d20SubstringContamination(spark: SparkSession, dir: String): DataFrame =
    substringPairs(Tables.documents(spark, dir))

  /** Core of [[d20SubstringContamination]] over any (doc_id, text)
    * frame — split out so specs can drive constructed corpora through
    * the exact prod path. */
  private[graft] def substringPairs(docsIn: DataFrame): DataFrame = {
    val spark = docsIn.sparkSession
    import spark.implicits._
    val docs = docsIn.filter(length($"text") >= subK)
    val test = docs.filter($"doc_id" % testModulus === 0)
      .select($"doc_id".as("test_id"),
        explode(sequence(lit(1), length($"text") - subK + 1)).as("i"),
        $"text")
      .select($"test_id", md5(expr(s"substring(text, i, $subK)")).as("h"))
    val train = docs.filter($"doc_id" % testModulus =!= 0)
      .select($"doc_id".as("train_id"),
        explode(sequence(lit(1), length($"text") - subK + 1, lit(subStride))).as("i"),
        $"text")
      .select($"train_id", md5(expr(s"substring(text, i, $subK)")).as("h"))
    train.join(test, Seq("h"))
      .groupBy($"train_id", $"test_id")
      .agg(countDistinct($"h").as("n_grams"))
      .orderBy($"train_id", $"test_id")
  }

  /** Winnowing window size: one fingerprint per [[winnowW]] consecutive
    * 3-shingle hashes (Schleimer, Wilkerson, Aiken, SIGMOD 2003). */
  val winnowW = 4
  /** Minimum shared fingerprints for a d19 pair to be reported. */
  val winnowMinShared = 2L

  /** D123: winnowing fingerprint near-dup pairs — the MOSS local
    * fingerprinting scheme as a third candidate generator next to
    * MinHash-LSH (d4) and SimHash (d6). Each document keeps the MIN
    * 3-shingle hash in every window of [[winnowW]] consecutive
    * shingles; unlike MinHash's corpus-independent random sample, the
    * winnowing GUARANTEE is positional — any shared run of at least
    * w+k−1 tokens produces at least one shared fingerprint, so long
    * verbatim overlaps can never be missed.
    *
    * Scale shape: the fingerprint pass is one posexplode + a window
    * PARTITIONED BY doc_id (high-cardinality — parallelizes with the
    * corpus, the c2 discipline); pairs come from a fingerprint
    * self-equi-join guarded by the d4 [[maxBucket]] skew cap (never
    * binding on the fixtures; the oracle, like d4's, replays the
    * uncapped semantics). ~n/w fingerprints per n-gram document keep
    * the index a fraction of corpus size. */
  def d19Winnowing(spark: SparkSession, dir: String): DataFrame =
    winnowPairs(Tables.documents(spark, dir))

  /** Core winnowing pipeline over any (doc_id, text) frame — split out
    * so specs can drive synthetic corpora through the exact prod path. */
  private[graft] def winnowPairs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val grams = docs
      .select($"doc_id", posexplode(shingles($"text")).as(Seq("pos0", "s")))
      .select($"doc_id", ($"pos0" + 1).as("i"),
        conv(substring(md5($"s"), 1, 8), 16, 10).cast("long").as("h"))
    val wWin = Window.partitionBy($"doc_id").orderBy($"i")
      .rowsBetween(Window.currentRow, winnowW - 1)
    val wCnt = Window.partitionBy($"doc_id")
    val fps = grams
      .withColumn("fp", min($"h").over(wWin))
      .withColumn("ng", count(lit(1)).over(wCnt))
      .filter($"i" <= $"ng" - (winnowW - 1))
      .select($"doc_id", $"fp").distinct()
    val ok = fps.groupBy($"fp").agg(count(lit(1)).as("nfp"))
      .filter($"nfp" <= maxBucket).select($"fp")
    val inB = fps.join(ok, Seq("fp"))
    val a = inB.select($"fp", $"doc_id".as("doc_a"))
    val b = inB.select($"fp", $"doc_id".as("doc_b"))
    a.join(b, Seq("fp")).filter($"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("n_shared"))
      .filter($"n_shared" >= winnowMinShared)
      .orderBy($"doc_a", $"doc_b")
  }

  // ---------------------------------------------------------------- d21

  /** D138: fuzzy-descriptor near-duplicate clusters — entity
    * resolution over the full part descriptor (name + brand + type):
    * two catalog entries match when their descriptors have the same
    * word count and differ in AT MOST ONE word slot (word-hamming ≤ 1
    * — re-listings under a different brand, one-field typos).
    *
    * Scale shape, in two stages (the canonical dedupe pipeline):
    * (1) CANONICALIZE — identical descriptors collapse to one
    * representative (min key) + a group count in a single partial-
    * aggregated groupBy, so the fuzzy stage runs over the DISTINCT
    * descriptor space, which is bounded by the catalog VOCABULARY
    * (names × brands × types), never by corpus rows — without this the
    * pair output itself grows quadratically in SF. (2) MATCH — the
    * DELETION-NEIGHBORHOOD blocking of FastSS/PassJoin at word
    * granularity: each distinct descriptor emits w signatures (md5 of
    * descriptor-minus-word-i, word count, i) and two descriptors are
    * word-hamming ≤ 1 IFF they share a signature (drop-the-differing-
    * slot pigeonhole — exact, not probabilistic, so verification can
    * never reject a candidate). Fan-out ×w, signature buckets bounded
    * by vocabulary adjacency. The oracle IS the independent quadratic
    * formulation over the canonical groups (the q53 discipline), so
    * the gate checks the blocking itself. */
  def fuzzyNamePairs(names: DataFrame): DataFrame = {
    import names.sparkSession.implicits._
    // stage 1: canonicalize — one representative per distinct descriptor
    val groups = names.groupBy($"name")
      .agg(min($"key").as("key"), count(lit(1)).as("n"))
      .withColumn("words", split($"name", " "))
      .withColumn("wc", size($"words"))
    // stage 2: deletion-neighborhood blocking over the distinct space
    val sigs = groups
      .select($"key", $"n", $"words", $"wc",
        posexplode($"words").as(Seq("pos", "dropped")))
      .select($"key", $"n", $"words",
        md5(concat_ws(":",
          concat_ws(" ", concat(slice($"words", lit(1), $"pos"),
            slice($"words", $"pos" + 2, $"wc"))),
          $"wc", $"pos")).as("sig"))
    sigs.as("a").join(sigs.as("b"),
        $"a.sig" === $"b.sig" && $"a.key" < $"b.key")
      .select($"a.key".as("part_a"), $"b.key".as("part_b"),
        $"a.n".as("n_a"), $"b.n".as("n_b"),
        expr("size(filter(zip_with(a.words, b.words, (x, y) -> x != y), v -> v))")
          .as("n_diff"))
      .distinct()
      .orderBy($"part_a", $"part_b")
  }

  def d21FuzzyNames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    fuzzyNamePairs(Tables.part(spark, dir)
      .select($"p_partkey".as("key"),
        concat_ws(" ", $"p_name", $"p_brand", $"p_type").as("name")))
  }

  // ---------------------------------------------------------------- d22

  /** D168: near-dup cluster census — the size histogram of the
    * connected-component clusters d8/c2 deduplicate by: one row per
    * cluster size with the cluster count and document mass, the
    * "how duplicated is this corpus, and in what shape" observability
    * readout (a fat tail here is what motivates d16's reweighting and
    * c2's keep-best selection).
    *
    * All counts exact integers; reuses the session-cached component
    * assignment (singletons are size-1 clusters), so the census adds
    * two partial-aggregated rollups to work d8/c2 already did.
    * Output is bounded by the LARGEST CLUSTER SIZE, never corpus
    * rows. */
  def d22ClusterCensus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    componentAssignment(spark, dir)
      .groupBy($"cluster_id").agg(count(lit(1)).as("sz"))
      .groupBy($"sz".as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .select($"cluster_size", $"n_clusters",
        ($"cluster_size" * $"n_clusters").as("n_docs"))
      .orderBy($"cluster_size")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d22_cluster_census" -> d22ClusterCensus,
    "d21_fuzzy_names" -> d21FuzzyNames,
    "d19_winnowing" -> d19Winnowing,
    "d20_substring_contamination" -> d20SubstringContamination,
    "d16_dup_weights" -> d16DupWeights,
    "d24_dup_growth" -> d24DupGrowth,
    "d15_line_dedup" -> d15LineDedup,
    "d1_exact_dedup" -> d1ExactDedup,
    "d2_distinct_meta" -> d2DistinctMeta,
    "d3_minhash" -> d3Minhash,
    "d4_lsh_pairs" -> d4LshPairs,
    "d5_jaccard" -> d5Jaccard,
    "d6_simhash" -> d6Simhash,
    "d7_decontaminate" -> d7Decontaminate,
    "d10_bloom_decontaminate" -> d10BloomDecontaminate,
    "d11_incremental_dedup" -> d11IncrementalDedup,
    "d8_components" -> d8Components,
    "d12_containment" -> d12Containment,
    "d13_contamination_score" -> d13ContaminationScore,
    "d17_minhash_fidelity" -> d17MinhashFidelity,
    "d18_lsh_tuning" -> d18LshTuning,
    "d23_weighted_jaccard" -> d23WeightedJaccard,
    "d25_simhash_pairs" -> d25SimhashPairs)

  // ---- DuckDB oracle SQL (replays the identical hash pipeline) ----

  private[operators] val shinglesSql =
    """list_transform(generate_series(1, len(string_split(lower(text), ' ')) - 2),
       i -> string_split(lower(text), ' ')[i] || ' ' ||
            string_split(lower(text), ' ')[i+1] || ' ' ||
            string_split(lower(text), ' ')[i+2])"""

  private val sigAgg = (0 until numHashes)
    .map(i => s"min((h1 + $i * h2) % $hashMod) AS sig$i").mkString(", ")

  /** Shared oracle CTE chain: shingles → (h1,h2) → signatures. */
  private val sigCte =
    s"""WITH shl AS (SELECT doc_id, unnest($shinglesSql) AS s FROM documents),
        hh AS (SELECT doc_id,
                 CAST('0x' || substring(md5(s), 1, 8) AS BIGINT) AS h1,
                 CAST('0x' || substring(md5(s), 9, 8) AS BIGINT) AS h2
               FROM shl),
        sig AS (SELECT doc_id, $sigAgg FROM hh GROUP BY doc_id)"""

  private val bandSelect = (0 until numBands).map { b =>
    val parts = (0 until rowsPerBand)
      .map(r => s"CAST(sig${b * rowsPerBand + r} AS VARCHAR)")
    s"md5(${parts.mkString(" || '|' || ")}) AS band$b"
  }.mkString(", ")

  private val candCte =
    s"""$sigCte,
        band AS (SELECT doc_id, ${(0 until numHashes).map(i => s"sig$i").mkString(", ")}, $bandSelect FROM sig),
        bucket AS (SELECT doc_id, band_idx, band_hash FROM band
                   UNPIVOT (band_hash FOR band_idx IN (${(0 until numBands).map(b => s"band$b").mkString(", ")}))),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM bucket a JOIN bucket b
                   ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
                  AND a.doc_id < b.doc_id)"""

  /** Shared CTE chain ending in `jpa(doc_a, doc_b, jaccard)` — exact
    * Jaccard for EVERY candidate pair (left join: a banding collision
    * with zero shared shingles scores 0). */
  private[operators] val jaccardAllCte: String =
    s"""$candCte,
        dsh AS (SELECT DISTINCT doc_id, unnest($shinglesSql) AS s FROM documents),
        card AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY 1),
        inter AS (SELECT c.doc_a, c.doc_b, count(*) AS n_inter
                  FROM cand c JOIN dsh a ON a.doc_id = c.doc_a
                              JOIN dsh b ON b.doc_id = c.doc_b AND a.s = b.s
                  GROUP BY 1, 2),
        jpa AS (SELECT c.doc_a, c.doc_b,
                 round(COALESCE(i.n_inter, 0) * 1.0 /
                   (ca.n + cb.n - COALESCE(i.n_inter, 0)), 4) AS jaccard
               FROM cand c
                 LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
                 JOIN card ca ON c.doc_a = ca.doc_id
                 JOIN card cb ON c.doc_b = cb.doc_id)"""

  /** Shared CTE chain ending in `jp(doc_a, doc_b, jaccard)` — the
    * jaccard ≥ 0.5 near-dup pairs (also consumed by the c1 pipeline
    * oracle in [[Pipeline]]). */
  private[operators] val jaccardCte: String =
    s"""$jaccardAllCte,
        jp AS (SELECT doc_a, doc_b, jaccard FROM jpa WHERE jaccard >= 0.5)"""

  /** One sweep configuration's banding + candidate CTEs. */
  private def sweepCandSql(b: Int, r: Int): String = {
    val bandExprs = (0 until b).map { i =>
      val parts = (0 until r).map(j => s"CAST(sig${i * r + j} AS VARCHAR)")
      s"md5(${parts.mkString(" || '|' || ")}) AS band$i"
    }.mkString(", ")
    val bandList = (0 until b).map(i => s"band$i").mkString(", ")
    s"""bkt_${b}_$r AS (SELECT doc_id, band_idx, band_hash FROM
            (SELECT doc_id, $bandExprs FROM sigt)
            UNPIVOT (band_hash FOR band_idx IN ($bandList))),
        ok_${b}_$r AS (SELECT band_idx, band_hash FROM bkt_${b}_$r
            GROUP BY 1, 2 HAVING count(*) <= $maxBucket),
        cand_${b}_$r AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bkt_${b}_$r a
            JOIN ok_${b}_$r o ON o.band_idx = a.band_idx
              AND o.band_hash = a.band_hash
            JOIN bkt_${b}_$r b
              ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
             AND a.doc_id < b.doc_id)"""
  }

  /** One sweep configuration's stats CTE (needs `truth` defined). */
  private def sweepStSql(b: Int, r: Int): String =
    s"""st_${b}_$r AS (SELECT
            (SELECT CAST(count(*) AS BIGINT) FROM cand_${b}_$r)
              AS n_candidates,
            (SELECT CAST(count(*) AS BIGINT) FROM cand_${b}_$r c
              WHERE EXISTS (SELECT 1 FROM truth t
                WHERE t.doc_a = c.doc_a AND t.doc_b = c.doc_b))
              AS n_true_found)"""

  private def sweepRowSql(b: Int, r: Int): String =
    s"""SELECT $b AS bands, $r AS rows_per_band, n_candidates, n_true_found,
        CASE WHEN (SELECT nt FROM tn) > 0
             THEN round(n_true_found * 1.0 / (SELECT nt FROM tn), 4)
             ELSE 0.0 END AS recall,
        CASE WHEN n_candidates > 0
             THEN round(n_true_found * 1.0 / n_candidates, 4)
             ELSE 0.0 END AS precision
        FROM st_${b}_$r"""

  val oracle: Map[String, String] = Map(
    "d24_dup_growth" ->
      """WITH h AS (SELECT doc_id,
              md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS ch
            FROM documents),
          b AS (SELECT CAST(min(doc_id) AS BIGINT) AS mn,
              CAST(max(doc_id) AS BIGINT) AS mx FROM h),
          f AS (SELECT ch, CAST(min(doc_id) AS BIGINT) AS fd
            FROM h GROUP BY ch),
          j AS (SELECT h.doc_id,
              CASE WHEN h.doc_id > f.fd THEN 1 ELSE 0 END AS dup
            FROM h JOIN f USING (ch)),
          g AS (SELECT unnest(generate_series(1, 10)) AS i),
          cuts AS (SELECT CAST(i AS BIGINT) AS decile,
              mn - 1 + ((mx - mn + 1) * i) // 10 AS cutoff_id
            FROM g CROSS JOIN b),
          r AS (SELECT c.decile, c.cutoff_id,
              CAST(sum(CASE WHEN j.doc_id <= c.cutoff_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs,
              CAST(sum(CASE WHEN j.doc_id <= c.cutoff_id THEN j.dup
                ELSE 0 END) AS BIGINT) AS n_dupes
            FROM cuts c CROSS JOIN j GROUP BY 1, 2)
          SELECT decile, cutoff_id, n_docs, n_dupes,
            round(CAST(n_dupes AS DOUBLE) / CAST(n_docs AS DOUBLE), 4)
              AS dup_frac
          FROM r ORDER BY decile""",
    "d22_cluster_census" ->
      s"""${componentsCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
          sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS sz
                 FROM assign GROUP BY 1)
          SELECT sz AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
            CAST(sz * count(*) AS BIGINT) AS n_docs
          FROM sz GROUP BY sz ORDER BY sz""",
    "d21_fuzzy_names" ->
      """WITH g AS (SELECT p_name || ' ' || p_brand || ' ' || p_type AS name,
              CAST(min(p_partkey) AS BIGINT) AS key,
              CAST(count(*) AS BIGINT) AS n
            FROM part GROUP BY 1),
          p AS (SELECT key, n, string_split(name, ' ') AS w,
              len(string_split(name, ' ')) AS wc
            FROM g)
          SELECT a.key AS part_a, b.key AS part_b,
            a.n AS n_a, b.n AS n_b,
            CAST(len(list_filter(range(1, a.wc + 1),
              i -> a.w[i] != b.w[i])) AS INT) AS n_diff
          FROM p a JOIN p b ON a.key < b.key AND a.wc = b.wc
            AND len(list_filter(range(1, a.wc + 1),
              i -> a.w[i] != b.w[i])) <= 1
          ORDER BY part_a, part_b""",
    "d20_substring_contamination" ->
      s"""WITH d AS (SELECT doc_id, text FROM documents
            WHERE length(text) >= $subK),
          te AS (SELECT doc_id AS test_id,
              md5(substring(text, CAST(i AS INT), $subK)) AS h
            FROM (SELECT doc_id, text,
                unnest(range(1, length(text) - $subK + 2)) AS i
              FROM d WHERE doc_id % $testModulus = 0)),
          tr AS (SELECT doc_id AS train_id,
              md5(substring(text, CAST(i AS INT), $subK)) AS h
            FROM (SELECT doc_id, text,
                unnest(range(1, length(text) - $subK + 2, $subStride)) AS i
              FROM d WHERE doc_id % $testModulus <> 0))
          SELECT train_id, test_id,
            CAST(count(DISTINCT h) AS BIGINT) AS n_grams
          FROM tr JOIN te USING (h)
          GROUP BY 1, 2 ORDER BY train_id, test_id""",
    "d19_winnowing" ->
      s"""WITH shp AS (SELECT doc_id,
              unnest(list_transform($shinglesSql,
                s -> CAST('0x' || substring(md5(s), 1, 8) AS BIGINT))) AS h,
              unnest(range(1, len($shinglesSql) + 1)) AS i
            FROM documents),
          w AS (SELECT doc_id, i,
              min(h) OVER (PARTITION BY doc_id ORDER BY i
                ROWS BETWEEN CURRENT ROW AND ${winnowW - 1} FOLLOWING) AS fp,
              count(*) OVER (PARTITION BY doc_id) AS ng
            FROM shp),
          fps AS (SELECT DISTINCT doc_id, fp FROM w WHERE i <= ng - ${winnowW - 1}),
          p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              CAST(count(*) AS BIGINT) AS n_shared
            FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
          SELECT doc_a, doc_b, n_shared FROM p
          WHERE n_shared >= $winnowMinShared ORDER BY doc_a, doc_b""",
    "d18_lsh_tuning" ->
      s"""$sigCte,
          tsmp AS (SELECT doc_id FROM (
              SELECT doc_id, row_number() OVER (
                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
              FROM documents) WHERE rn <= $tuneSample),
          sigt AS (SELECT g.* FROM sig g JOIN tsmp USING (doc_id)),
          dsh AS (SELECT DISTINCT doc_id, unnest($shinglesSql) AS s
                  FROM documents JOIN tsmp USING (doc_id)),
          card AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY 1),
          ${lshSweep.map { case (b, r) => sweepCandSql(b, r) }
            .mkString(",\n          ")},
          tinter AS (SELECT c.doc_a, c.doc_b, count(*) AS n_inter
              FROM cand_8_1 c JOIN dsh a ON a.doc_id = c.doc_a
                              JOIN dsh b ON b.doc_id = c.doc_b AND a.s = b.s
              GROUP BY 1, 2),
          truth AS (SELECT i.doc_a, i.doc_b
              FROM tinter i JOIN card ca ON i.doc_a = ca.doc_id
                            JOIN card cb ON i.doc_b = cb.doc_id
              WHERE round(n_inter * 1.0 / (ca.n + cb.n - n_inter), 4) >= 0.5),
          tn AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM truth),
          ${lshSweep.map { case (b, r) => sweepStSql(b, r) }
            .mkString(",\n          ")}
          SELECT * FROM (${lshSweep
            .map { case (b, r) => s"(${sweepRowSql(b, r)})" }
            .mkString(" UNION ALL ")})
          ORDER BY bands DESC""",
    "d16_dup_weights" ->
      """WITH h AS (SELECT doc_id,
              md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))
                AS content_hash
            FROM documents),
          c AS (SELECT content_hash, min(doc_id) AS keep_id,
              CAST(count(*) AS BIGINT) AS n_copies
            FROM h GROUP BY 1)
          SELECT h.doc_id, h.content_hash, c.n_copies,
            round(1.0 / CAST(c.n_copies AS DOUBLE), 4) AS weight,
            CAST(CASE WHEN h.doc_id = c.keep_id THEN 1 ELSE 0 END AS INT)
              AS is_canonical
          FROM h JOIN c USING (content_hash) ORDER BY h.doc_id""",
    "d15_line_dedup" ->
      s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
                     FROM documents),
          l AS (SELECT doc_id,
                  unnest(generate_series(0,
                    CAST(ceil(len(tk) / $lineLen.0) AS INT) - 1)) AS line_id,
                  tk FROM t),
          l2 AS (SELECT doc_id, line_id,
                  array_to_string(list_slice(tk, line_id * $lineLen + 1,
                    line_id * $lineLen + $lineLen), ' ') AS line
                 FROM l),
          boiler AS (SELECT h FROM (SELECT DISTINCT md5(line) AS h, doc_id
                                    FROM l2)
                     GROUP BY h HAVING count(*) >= $lineDupDocs),
          kept AS (SELECT l2.* FROM l2
                   WHERE md5(l2.line) NOT IN (SELECT h FROM boiler)),
          agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                    string_agg(line, ' ' ORDER BY line_id) AS clean_text
                  FROM kept GROUP BY doc_id)
          SELECT t.doc_id,
            CAST(ceil(len(t.tk) / $lineLen.0) AS BIGINT) AS n_lines,
            COALESCE(a.n_kept, 0) AS n_kept,
            COALESCE(a.clean_text, '') AS clean_text
          FROM t LEFT JOIN agg a USING (doc_id) ORDER BY t.doc_id""",
    "d11_incremental_dedup" ->
      s"""$candCte,
          ch AS (SELECT doc_id,
              md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS ch
            FROM documents),
          ex AS (SELECT n.doc_id FROM ch n
                 WHERE n.doc_id % $ingestModulus = 0 AND EXISTS (
                   SELECT 1 FROM ch o
                   WHERE o.doc_id % $ingestModulus <> 0 AND o.ch = n.ch)),
          nr AS (SELECT DISTINCT a.doc_id FROM bucket a
                 WHERE a.doc_id % $ingestModulus = 0 AND EXISTS (
                   SELECT 1 FROM bucket b
                   WHERE b.doc_id % $ingestModulus <> 0
                     AND b.band_idx = a.band_idx
                     AND b.band_hash = a.band_hash))
          SELECT d.doc_id,
            CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
                 WHEN n.doc_id IS NOT NULL THEN 'near_dup'
                 ELSE 'new' END AS verdict
          FROM (SELECT doc_id FROM documents WHERE doc_id % $ingestModulus = 0) d
          LEFT JOIN ex e ON d.doc_id = e.doc_id
          LEFT JOIN nr n ON d.doc_id = n.doc_id
          ORDER BY d.doc_id""",
    "d1_exact_dedup" ->
      """SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS content_hash,
         min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies
         FROM documents GROUP BY 1 ORDER BY content_hash""",
    "d2_distinct_meta" ->
      "SELECT DISTINCT lang, source FROM documents ORDER BY lang, source",
    "d3_minhash" ->
      s"""$sigCte SELECT * FROM sig ORDER BY doc_id""",
    "d23_weighted_jaccard" ->
      s"""$candCte,
          dsh AS (SELECT DISTINCT doc_id, unnest($shinglesSql) AS s
                  FROM documents),
          wgt AS (SELECT s,
              (SELECT count(*) FROM documents) // count(*) AS w
            FROM dsh GROUP BY s),
          ids AS (SELECT doc_a AS doc_id FROM cand
                  UNION SELECT doc_b FROM cand),
          shw AS (SELECT d.doc_id, d.s, w.w
            FROM dsh d JOIN wgt w USING (s) JOIN ids USING (doc_id)),
          tot AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS wt
            FROM shw GROUP BY 1),
          wi AS (SELECT c.doc_a, c.doc_b, CAST(sum(a.w) AS BIGINT) AS w_inter
            FROM cand c JOIN shw a ON a.doc_id = c.doc_a
                        JOIN shw b ON b.doc_id = c.doc_b AND b.s = a.s
            GROUP BY 1, 2)
          SELECT w.doc_a, w.doc_b, w.w_inter,
            ta.wt + tb.wt - w.w_inter AS w_union,
            round(CAST(w.w_inter AS DOUBLE) /
              CAST(ta.wt + tb.wt - w.w_inter AS DOUBLE), 4) AS w_jaccard
          FROM wi w JOIN tot ta ON ta.doc_id = w.doc_a
                    JOIN tot tb ON tb.doc_id = w.doc_b
          ORDER BY doc_a, doc_b""",
    "d4_lsh_pairs" ->
      s"""$candCte
          SELECT c.doc_a, c.doc_b,
            round((${(0 until numHashes).map(i =>
              s"CASE WHEN sa.sig$i = sb.sig$i THEN 1.0 ELSE 0.0 END").mkString(" + ")}) / $numHashes.0, 4) AS est_sim
          FROM cand c JOIN sig sa ON c.doc_a = sa.doc_id
                      JOIN sig sb ON c.doc_b = sb.doc_id
          ORDER BY doc_a, doc_b""",
    "d5_jaccard" ->
      s"""$jaccardCte SELECT doc_a, doc_b, jaccard FROM jp ORDER BY doc_a, doc_b""",
    "d17_minhash_fidelity" ->
      s"""$jaccardAllCte
          SELECT t.doc_a, t.doc_b, t.est_sim, t.true_jaccard,
            round(abs(t.est_sim - t.true_jaccard), 4) AS abs_err
          FROM (SELECT p.doc_a, p.doc_b,
              round((${(0 until numHashes).map(i =>
                s"CASE WHEN sa.sig$i = sb.sig$i THEN 1.0 ELSE 0.0 END")
                .mkString(" + ")}) / $numHashes.0, 4) AS est_sim,
              p.jaccard AS true_jaccard
            FROM jpa p JOIN sig sa ON p.doc_a = sa.doc_id
                       JOIN sig sb ON p.doc_b = sb.doc_id) t
          ORDER BY t.doc_a, t.doc_b""",
    "d12_containment" ->
      s"""WITH shl AS (SELECT doc_id, unnest($shinglesSql) AS s FROM documents),
          dsh AS (SELECT DISTINCT doc_id, s FROM shl),
          rare AS (SELECT s FROM dsh GROUP BY s
                   HAVING count(*) <= $maxShingleDf),
          rsh AS (SELECT d.doc_id, d.s FROM dsh d JOIN rare r ON d.s = r.s),
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                   FROM rsh a JOIN rsh b
                     ON a.s = b.s AND a.doc_id < b.doc_id),
          sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
                    FROM dsh GROUP BY doc_id),
          inter AS (SELECT c.doc_a, c.doc_b,
                      CAST(count(*) AS BIGINT) AS n_shared
                    FROM cand c
                    JOIN dsh x ON x.doc_id = c.doc_a
                    JOIN dsh y ON y.doc_id = c.doc_b AND y.s = x.s
                    GROUP BY 1, 2)
          SELECT i.doc_a, i.doc_b, i.n_shared, sa.n AS n_a, sb.n AS n_b,
            round(CAST(i.n_shared AS DOUBLE) / least(sa.n, sb.n), 4)
              AS containment
          FROM inter i
          JOIN sizes sa ON sa.doc_id = i.doc_a
          JOIN sizes sb ON sb.doc_id = i.doc_b
          WHERE CAST(i.n_shared AS DOUBLE) / least(sa.n, sb.n)
            >= $containmentMin
          ORDER BY doc_a, doc_b""",
    "d13_contamination_score" ->
      s"""WITH shl AS (SELECT doc_id, unnest($shinglesSql) AS s FROM documents),
          dsh AS (SELECT DISTINCT doc_id, s FROM shl),
          tsh AS (SELECT doc_id, s FROM dsh WHERE doc_id % $testModulus = 0),
          tv AS (SELECT DISTINCT s FROM dsh
                 WHERE doc_id % $testModulus <> 0),
          hit AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_contaminated
                  FROM tsh WHERE s IN (SELECT s FROM tv) GROUP BY doc_id),
          tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
                  FROM tsh GROUP BY doc_id)
          SELECT t.doc_id, t.n_shingles,
            coalesce(h.n_contaminated, 0) AS n_contaminated,
            round(CAST(coalesce(h.n_contaminated, 0) AS DOUBLE)
              / t.n_shingles, 4) AS contamination
          FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id
          ORDER BY t.doc_id""",
    "d7_decontaminate" ->
      s"""WITH shl AS (SELECT doc_id, unnest($shinglesSql) AS s FROM documents),
          dsh AS (SELECT DISTINCT doc_id, s FROM shl),
          te AS (SELECT doc_id AS test_id, s FROM dsh WHERE doc_id % $testModulus = 0),
          ok AS (SELECT s FROM te GROUP BY s HAVING count(*) <= $maxShingleDf),
          pairs AS (SELECT tr.doc_id AS train_id, te.test_id,
                      CAST(count(*) AS BIGINT) AS n_shared
                    FROM dsh tr
                    JOIN te ON tr.s = te.s
                    JOIN ok ON te.s = ok.s
                    WHERE tr.doc_id % $testModulus <> 0
                    GROUP BY 1, 2)
          SELECT train_id, test_id, n_shared FROM pairs
          WHERE n_shared >= $minSharedShingles
          ORDER BY train_id, test_id""",
    // d10 = d7's pair set rolled up per train doc (the Bloom prefilter
    // is a performance device, invisible to the verified output)
    "d10_bloom_decontaminate" ->
      s"""WITH shl AS (SELECT doc_id, unnest($shinglesSql) AS s FROM documents),
          dsh AS (SELECT DISTINCT doc_id, s FROM shl),
          te AS (SELECT doc_id AS test_id, s FROM dsh WHERE doc_id % $testModulus = 0),
          ok AS (SELECT s FROM te GROUP BY s HAVING count(*) <= $maxShingleDf),
          pairs AS (SELECT tr.doc_id AS train_id, te.test_id,
                      CAST(count(*) AS BIGINT) AS n_shared
                    FROM dsh tr
                    JOIN te ON tr.s = te.s
                    JOIN ok ON te.s = ok.s
                    WHERE tr.doc_id % $testModulus <> 0
                    GROUP BY 1, 2)
          SELECT train_id, CAST(count(*) AS BIGINT) AS n_test_docs,
            CAST(sum(n_shared) AS BIGINT) AS n_shared_total
          FROM pairs WHERE n_shared >= $minSharedShingles
          GROUP BY train_id ORDER BY train_id""",
    // connected components as a DuckDB recursive CTE: reachability from
    // every pair-member node, cluster = min reachable node; the WITH of
    // the shared jaccard chain becomes WITH RECURSIVE (prefix rewrite)
    "d8_components" ->
      s"""${componentsCte.replaceFirst("WITH ", "WITH RECURSIVE ")}
          SELECT doc_id, cluster_id,
            CAST(CASE WHEN cluster_id = doc_id THEN 1 ELSE 0 END AS INT) AS is_rep
          FROM assign ORDER BY doc_id""",
    "d25_simhash_pairs" -> {
      val bitCols = (0 until 64).map { i =>
        if (i < 32)
          s"sum(CASE WHEN (hlo >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS bit$i"
        else
          s"sum(CASE WHEN (hhi >> ${i - 32}) & 1 = 1 THEN 1 ELSE -1 END) AS bit$i"
      }.mkString(", ")
      val fp = (0 until 64)
        .map(i => s"(CASE WHEN bit$i > 0 THEN ${1L << i} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH tok AS (SELECT doc_id,
              unnest(string_split(lower(text), ' ')) AS t FROM documents),
          h AS (SELECT doc_id,
              CAST('0x' || substring(md5(t), 1, 8) AS BIGINT) AS hlo,
              CAST('0x' || substring(md5(t), 9, 8) AS BIGINT) AS hhi
            FROM tok),
          bits AS (SELECT doc_id, $bitCols FROM h GROUP BY doc_id),
          sims AS (SELECT doc_id, CAST($fp AS BIGINT) AS sim FROM bits),
          band AS (SELECT doc_id, sim, b, (sim >> (b * 16)) & 65535 AS bv
            FROM sims CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS b) bl),
          ok AS (SELECT b, bv FROM band GROUP BY b, bv
                 HAVING count(*) <= $maxBucket),
          keyed AS (SELECT band.* FROM band JOIN ok USING (b, bv)),
          pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
              x.sim AS sa, y.sim AS sb
            FROM keyed x JOIN keyed y
              ON x.b = y.b AND x.bv = y.bv AND x.doc_id < y.doc_id)
          SELECT doc_a, doc_b,
            CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
          FROM pairs WHERE bit_count(xor(sa, sb)) <= $simhashMaxHam
          ORDER BY doc_a, doc_b"""
    },
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
