package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.CacheScope.ScopedPersist

/** Product/behavioral analytics operators (SURVEY.md §2.B11, D61–D64):
  * slowly-changing-dimension interval builds with point-in-time joins,
  * bounded-fan-out co-occurrence mining, Markov transition matrices,
  * and trailing-window distinct counts. All declarative, all
  * oracle-gated, all shaped so the expensive side stays co-partitioned
  * on its natural key.
  */
object Analytics {

  /** Width of the q46 spend-tier dimension attribute (value // 25). */
  val scd2TierWidth = 25.0

  /** D61: SCD Type-2 dimension build + point-in-time enrichment.
    * Each purchase event is a "profile change" for its user: the
    * change's validity interval is [ts, next purchase ts) — built with
    * one `lead` window per user, NO self-join — and the current
    * interval stays open (valid_to NULL). Every non-purchase event is
    * then point-in-time joined to the interval that was active when it
    * happened, and the output is one row per dimension version with
    * its activity count.
    *
    * Scale shape: the interval build is a single hash exchange on
    * user_id + one window pass. The PIT join is an equi-join on
    * user_id (co-partitioned with the window's exchange) whose range
    * predicate is a join filter — per-user fan-out is bounded by that
    * user's version count, never corpus×corpus. Ties are pinned: an
    * activity at exactly the next version's ts belongs to the NEXT
    * interval (`>= from AND < to`), and same-ts changes order by
    * event_id on both engines. */
  /** The SCD2 validity-interval frame under q46 (and e11's batch twin):
    * one row per purchase with [valid_from, valid_to) and the spend
    * tier, built with a single lead window per user. */
  def dimIntervals(ev: DataFrame): DataFrame = {
    import ev.sparkSession.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"valid_from", $"event_id")
    ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts".as("valid_from"),
        floor($"value" / scd2TierWidth).cast("int").as("tier"))
      .withColumn("valid_to", lead($"valid_from", 1).over(w))
  }

  def q46Scd2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val dim = dimIntervals(ev)
    val act = ev.filter($"event_type" =!= "purchase")
      .select($"user_id".as("a_user"), $"ts".as("a_ts"))
    dim.join(act,
        $"a_user" === $"user_id" && $"a_ts" >= $"valid_from" &&
          ($"valid_to".isNull || $"a_ts" < $"valid_to"),
        "left")
      .groupBy($"user_id", $"event_id", $"valid_from", $"valid_to", $"tier")
      .agg(count($"a_ts").as("n_activity"))
      .orderBy($"user_id", $"valid_from", $"event_id")
  }

  /** D62: market-basket co-occurrence — the top part pairs bought
    * together in one order. The pair generation is a self-equi-join on
    * l_orderkey with `part_a < part_b`: fan-out per order is
    * C(items, 2), bounded by order size (≤7 in TPC-H shape), NEVER a
    * corpus pairwise join. Pairs partial-aggregate map-side; the
    * top-20 is a TakeOrdered (no global sort), totally ordered by
    * (n_orders DESC, part_a, part_b) so boundary ties are
    * deterministic cross-engine. */
  def q47Copurchase(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey").distinct()
    li.toDF("o", "part_a").join(li.toDF("o", "part_b"), "o")
      .filter($"part_a" < $"part_b")
      .groupBy($"part_a", $"part_b")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy($"n_orders".desc, $"part_a", $"part_b")
      .limit(20)
  }

  /** D63: event-type transition matrix (first-order Markov) — counts
    * and row-normalized probabilities of `prev → next` event-type
    * transitions within each user's timeline. One window `lag` per
    * user (single hash exchange), then a tiny
    * (#event_types² ≤ dozens of rows) aggregate; the per-prev
    * normalization is a window over that already-tiny frame. The
    * probability is rounded to 4 dp on both engines (repo convention
    * for cross-engine double parity). */
  def q48Transitions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type".as("next_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round($"n".cast("double") /
        sum($"n").over(Window.partitionBy($"prev_type")), 4))
      .orderBy($"prev_type", $"next_type")
  }

  /** D64: trailing 7-day distinct active users per day. The classic
    * sliding count-distinct, computed WITHOUT per-window re-dedup or a
    * range self-join: each distinct (day, user) activity row is
    * exploded to the ≤7 observation days whose trailing window it
    * falls in (a bounded ×7 map-side Generate), then one
    * count-distinct aggregate per observation day. Output is
    * restricted (semi join) to days that actually occur in the data,
    * so open-ended windows past the corpus horizon don't appear. */
  def q49TrailingDau(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val du = Tables.events(spark, dir)
      .select(to_date($"ts").as("day"), $"user_id").distinct()
    val days = du.select($"day".as("obs_day")).distinct()
    du.withColumn("obs_day",
        explode(sequence($"day", date_add($"day", 6))))
      .join(days, Seq("obs_day"), "left_semi")
      .groupBy($"obs_day")
      .agg(countDistinct($"user_id").as("dau7"))
      .orderBy($"obs_day")
  }

  /** D68: sole-blame attribution (the TPC-H Q21 dual-EXISTS shape on
    * available columns) — suppliers whose line was the ONLY returned
    * one in a multi-supplier order, counted per waiting line. The two
    * correlated subqueries decorrelate to one left-semi (another
    * supplier exists in the order) and one left-anti (no OTHER
    * supplier's line was returned) join, both equi-keyed on
    * l_orderkey — co-partitioned with bounded per-order fan-out, never
    * pairwise. The supplier name join is broadcast; the top-20 is a
    * TakeOrdered with total (n DESC, suppkey) order. */
  def q50SoleReturns(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_returnflag")
    val ret = li.filter($"l_returnflag" === "R")
      .select($"l_orderkey", $"l_suppkey")
    val others = li.select($"l_orderkey".as("o2"), $"l_suppkey".as("s2"))
    val retOthers = ret.select($"l_orderkey".as("o3"), $"l_suppkey".as("s3"))
      .distinct()
    ret
      .join(others, $"l_orderkey" === $"o2" && $"l_suppkey" =!= $"s2",
        "left_semi")
      .join(retOthers, $"l_orderkey" === $"o3" && $"l_suppkey" =!= $"s3",
        "left_anti")
      .groupBy($"l_suppkey")
      .agg(count(lit(1)).as("n_sole_returns"))
      .join(broadcast(Tables.supplier(spark, dir)
        .select($"s_suppkey", $"s_name")), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"n_sole_returns")
      .orderBy($"n_sole_returns".desc, $"s_suppkey")
      .limit(20)
  }

  /** Base/delta cutoff for the q51 incremental-maintenance demo. */
  val q51Cutoff = "1998-01-01"

  /** D71: incremental materialized-view maintenance — refresh a
    * per-customer order rollup from a BASE aggregate plus a DELTA
    * batch without re-aggregating history. Both sides partial-agg to
    * key-sized frames carrying MERGEABLE state (count + integer-cents
    * sum — the mergeable form of count/sum/avg); the refresh is one
    * full-outer join on the key with coalesce-add merge. At 100 TB
    * this is THE way rollups stay fresh: the base never rescans, work
    * is O(delta + touched keys) per refresh. The oracle is a full
    * recompute over ALL orders — the gate literally proves
    * incremental ≡ from-scratch, hash-exact (integer cents, no float
    * summation order). */
  def q51IncrementalRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderdate",
        floor($"o_totalprice" * 100).cast("long").as("cents"))
    def rollup(part: DataFrame) = part.groupBy($"o_custkey")
      .agg(count(lit(1)).as("n"), sum($"cents").as("c"))
    val base = rollup(orders.filter($"o_orderdate" < lit(q51Cutoff)))
      .select($"o_custkey", $"n".as("b_n"), $"c".as("b_c"))
    val delta = rollup(orders.filter($"o_orderdate" >= lit(q51Cutoff)))
      .select($"o_custkey", $"n".as("d_n"), $"c".as("d_c"))
    base.join(delta, Seq("o_custkey"), "full_outer")
      .select($"o_custkey",
        (coalesce($"b_n", lit(0L)) + coalesce($"d_n", lit(0L))).as("n_orders"),
        (coalesce($"b_c", lit(0L)) + coalesce($"d_c", lit(0L))).as("total_cents"))
      .orderBy($"o_custkey")
  }

  /** Ingest-batch boundary for [[q72Scd2Incremental]] — a ~2-day
    * "nightly batch" tail of the fixture's 30-day event span, late
    * enough that a realistic fraction of users does NOT appear in the
    * batch (exercising the carry-over path; AnalyticsSpec asserts
    * both paths are populated). */
  val q72Cutoff = "2024-01-29 00:00:00"

  /** D129: incremental SCD Type-2 maintenance — apply one ingest
    * batch of purchase events to an EXISTING validity-interval
    * dimension without rebuilding it (q51's base ⊕ delta discipline
    * applied to q46's interval build; the nightly job every warehouse
    * actually runs).
    *
    * Only users PRESENT IN THE BATCH are reworked: untouched users'
    * interval chains carry over verbatim (left-anti join against the
    * batch's user set); touched users re-run the lead-window build
    * over their base+delta history (left-semi join pulls exactly
    * those histories). Work is O(touched users' history), never
    * O(dimension) — at warehouse scale the batch touches a tiny
    * fraction of users, and this plan's cost tracks the batch.
    *
    * Output ≡ the from-scratch q46 interval build (the oracle is the
    * full rebuild; AnalyticsSpec asserts incremental ≡ full equality
    * and that the split is non-degenerate). */
  def q72Scd2Incremental(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val purchases = Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts", $"value")
    val base = purchases.filter($"ts" < lit(q72Cutoff).cast("timestamp"))
    val delta = purchases.filter($"ts" >= lit(q72Cutoff).cast("timestamp"))
    val touched = delta.select($"user_id").distinct()
    val carried = dimIntervals(base.withColumn("event_type", lit("purchase")))
      .join(touched, Seq("user_id"), "left_anti")
    val reworked = dimIntervals(
      base.join(touched, Seq("user_id"), "left_semi")
        .unionByName(delta)
        .withColumn("event_type", lit("purchase")))
    carried.unionByName(reworked)
      .select($"user_id", $"event_id", $"valid_from", $"valid_to", $"tier")
      .orderBy($"user_id", $"valid_from", $"event_id")
  }

  /** D131: largest-remainder proration — allocate each order's total
    * (integer cents) across its line items proportionally to quantity,
    * EXACTLY: base share = floor(cents·qty / Σqty), then the leftover
    * r cents go one each to the r items with the largest fractional
    * remainder (ties by line number) — the Hamilton apportionment rule
    * finance systems use so per-order sums reconcile to the invoice
    * penny-exact (a float prorate never does).
    *
    * Every quantity is an exact integer, every share an integer `div`/
    * `pmod`, the remainder rank a window per order — fan-out bounded
    * by order width (≤ 7 lines). One co-keyed orders⋈lineitem equi
    * join, one partial-agg Σqty rollup co-partitioned with it, one
    * order-partitioned window. AnalyticsSpec asserts the conservation
    * invariant Σ alloc = order cents on EVERY order. */
  def q73Prorate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_linenumber",
        round($"l_quantity").cast("long").as("qty"))
    val totQty = li.groupBy($"l_orderkey").agg(sum($"qty").as("tot_qty"))
    val orders = Tables.orders(spark, dir)
      .select($"o_orderkey".as("l_orderkey"),
        floor($"o_totalprice" * 100).cast("long").as("order_cents"))
    val w = Window.partitionBy($"l_orderkey")
    // (frac DESC, linenumber, qty): the fixture ships duplicate
    // (orderkey, linenumber) pairs, so linenumber alone is not total;
    // adding qty makes any remaining ties EXACT duplicate rows, which
    // are interchangeable (identical alloc either way)
    val wr = Window.partitionBy($"l_orderkey")
      .orderBy($"frac".desc, $"l_linenumber", $"qty")
    li.join(totQty, "l_orderkey").join(orders, "l_orderkey")
      .withColumn("base", expr("(order_cents * qty) div tot_qty"))
      .withColumn("frac", expr("pmod(order_cents * qty, tot_qty)"))
      .withColumn("leftover", $"order_cents" - sum($"base").over(w))
      .withColumn("rk", row_number().over(wr))
      .select($"l_orderkey", $"l_linenumber",
        ($"base" + when($"rk" <= $"leftover", 1L).otherwise(0L)).as("alloc_cents"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** Positive-class cut for [[q52Auc]]: labels ≥ 5 are "relevant". */
  val aucPosCut = 5

  /** D81: exact ROC-AUC of a document-level score against a binary
    * label — the classifier-eval primitive a quality-filter pipeline
    * runs at corpus scale ("does my heuristic score actually separate
    * the classes?"). Score = n_chars (integer, heavily tied), label =
    * embedding class ≥ [[aucPosCut]]; AUC is the tie-corrected
    * Mann–Whitney rank-sum,
    *
    *   AUC = (Σ_{i∈pos} rank̄_i − n⁺(n⁺+1)/2) / (n⁺ n⁻)
    *
    * with average ranks for ties. Everything up to the final division
    * is INTEGER: per-score group (n_tot, n_pos), cumulative count
    * before the group, and 2·rank̄ = 2·cum_before + n_tot + 1 — so
    * both engines divide the same two exact integers and round once
    * (4 dp), hash-safe.
    *
    * Scale shape: one co-keyed equi-join (doc_id = vec_id), one
    * partial-aggregated group-by score, then a window + aggregate over
    * the SCORE-CARDINALITY frame (distinct score values, bounded by
    * the score's range — the t14 bounded-window precedent), never over
    * corpus rows. */
  def q52Auc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scored = Tables.documents(spark, dir)
      .select($"doc_id", $"n_chars".as("score"))
      .join(Tables.embeddings(spark, dir)
        .select($"vec_id".as("doc_id"),
          ($"label" >= aucPosCut).cast("long").as("pos")), "doc_id")
    val byScore = scored.groupBy($"score")
      .agg(count(lit(1)).as("n_tot"), sum($"pos").as("n_pos"))
    val cum = byScore.withColumn("cum_before",
      coalesce(sum($"n_tot").over(Window.orderBy($"score")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    cum.agg(
        sum($"n_pos").as("np"),
        (sum($"n_tot") - sum($"n_pos")).as("nn"),
        sum($"n_pos" * (lit(2L) * $"cum_before" + $"n_tot" + lit(1L)))
          .as("s2"))
      .select($"np".as("n_pos"), $"nn".as("n_neg"),
        when($"np" * $"nn" === 0L, lit(null).cast("double"))
          .otherwise(round(($"s2" - $"np" * ($"np" + lit(1L)))
            .cast("double") / (lit(2L) * $"np" * $"nn").cast("double"), 4))
          .as("auc"))
  }

  /** D82: Pareto-front (skyline) extraction — parts undominated on
    * (retail price ↓, size ↑). Dominance via two windows over integer
    * cents, not an O(n²) NOT-EXISTS self-join: a row is dominated iff
    * the max size at strictly-cheaper prices reaches its size, or a
    * same-price row strictly exceeds it. Two-phase for scale (the q9
    * top-k discipline): a salted partition-local skyline prune first —
    * a row dominated within ANY subset is dominated globally — so the
    * global-order window runs only over local survivors (skyline-
    * sized), never the full dimension. The oracle is the independent
    * quadratic NOT-EXISTS formulation, so the window rewrite itself is
    * what the gate checks. */
  def q53Skyline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = Tables.part(spark, dir).select($"p_partkey", $"p_size",
      floor($"p_retailprice" * 100 + 0.5).cast("long").as("price_cents"))
    def prune(df: DataFrame, parts: Seq[org.apache.spark.sql.Column]) = {
      val w1 = Window.partitionBy(parts: _*).orderBy($"price_cents")
        .rangeBetween(Window.unboundedPreceding, -1)
      val w2 = Window.partitionBy(parts :+ $"price_cents": _*)
      df.withColumn("m1", max($"p_size").over(w1))
        .withColumn("m2", max($"p_size").over(w2))
        .filter(($"m1".isNull || $"m1" < $"p_size") && $"m2" === $"p_size")
        .drop("m1", "m2")
    }
    val local = prune(p.withColumn("salt",
      pmod(crc32($"p_partkey".cast("string")), lit(32))), Seq($"salt"))
    prune(local, Seq.empty)
      .select($"p_partkey", $"price_cents", $"p_size")
      .orderBy($"price_cents", $"p_partkey")
  }

  /** D86: seasonal-baseline anomaly detection on event traffic — flag
    * hours whose event count runs ≥ 1.5× the mean for that
    * (weekday, hour-of-day) slot, the standard ops-dashboard "unusual
    * for a Tuesday 3pm" check (weekly seasonality removed before
    * thresholding, so a busy Monday morning is not an anomaly).
    *
    * Determinism: the threshold compare is INTEGER (2·cnt·n_hours ≥
    * 3·total ⟺ ratio ≥ 1.5 — no float in the predicate); the reported
    * ratio is one exact-integer division rounded 4 dp. Weekday is
    * 0=Sunday on both engines (Spark dayofweek−1 = DuckDB dayofweek).
    *
    * Scale shape: the hourly census is one partial-aggregated groupBy
    * whose output is TIME-RANGE-bounded (rows = hours observed, not
    * events); the seasonal profile groups those into ≤ 168 slots and
    * broadcasts back; no window functions, no shuffle of raw events
    * beyond the census. */
  def q54SeasonalAnomaly(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hourly = Tables.events(spark, dir)
      .groupBy(date_trunc("hour", $"ts").as("hr_ts"))
      .agg(count(lit(1)).as("cnt"))
    val slotted = hourly.select($"hr_ts", $"cnt",
      (dayofweek($"hr_ts") - 1).as("dow"), hour($"hr_ts").as("hr"))
    val seasonal = slotted.groupBy($"dow", $"hr")
      .agg(sum($"cnt").as("total"), count(lit(1)).as("n_hours"))
    slotted.join(broadcast(seasonal), Seq("dow", "hr"))
      .filter(lit(2L) * $"cnt" * $"n_hours" >= lit(3L) * $"total")
      .select($"hr_ts", $"dow", $"hr", $"cnt",
        round(($"cnt" * $"n_hours").cast("double") /
          $"total".cast("double"), 4).as("ratio"))
      .orderBy($"hr_ts")
  }

  /** D91: RFM customer segmentation — the classic recency / frequency /
    * monetary quintile coding (marketing-analytics staple; also the
    * usual first feature set for churn models). Each metric is scored
    * 1–5 against its EXACT corpus quintile boundaries; the output is
    * the ≤ 125-cell segment census.
    *
    * Determinism: all three metrics are exact integers (order count,
    * floor-cents spend, day recency); boundaries come from
    * [[AdvancedSql.exactPercentiles]] — the q44 scalable exact-
    * percentile pass whose linear interpolation replays
    * `quantile_cont` bit-for-bit — and fold into the CASE as literals.
    * avg_cents is integer division of exact integers (both positive,
    * so Spark's truncating `div` and DuckDB's flooring `//` agree) —
    * no float column in the output at all.
    *
    * Scale shape: ONE partial-aggregated pass over orders builds the
    * per-customer frame (persisted — consumed by three boundary passes
    * + the census, the q43 no-second-scan lesson); each boundary pass
    * is the q44 bounded-histogram collect; the census is a ≤ 125-row
    * partial-agg groupBy. No window over customers anywhere. */
  /** q55's deterministic per-dir scalars — the corpus max order date
    * and the three exact quintile boundary sets — memoized like
    * RegTree's edge cache (round-15): they are pure functions of the
    * immutable orders fixture, and each run re-paid one head + six
    * bounded exactPercentiles collects. */
  private val rfmBoundsCache = scala.collection.concurrent.TrieMap
    .empty[String, (String, Seq[Double], Seq[Double], Seq[Double])]

  def q55Rfm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    def rfmOf(md: String): DataFrame = o.groupBy($"o_custkey")
      .agg(count(lit(1)).as("f"),
        sum(floor($"o_totalprice" * 100).cast("long")).as("m"),
        datediff(lit(md).cast("date"),
          max($"o_orderdate").cast("date")).as("r"))
    val (maxDate, bf, bm, br) = rfmBoundsCache.getOrElseUpdate(dir, {
      val md = o.agg(max($"o_orderdate").cast("date").cast("string"))
        .head().getString(0)
      val base = rfmOf(md)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ps = Seq(0.2, 0.4, 0.6, 0.8)
      val f = AdvancedSql.exactPercentiles(
        base.select($"f".cast("double").as("v")), ps, width = 1.0)
      val m = AdvancedSql.exactPercentiles(
        base.select($"m".cast("double").as("v")), ps, width = 6400.0)
      val r = AdvancedSql.exactPercentiles(
        base.select($"r".cast("double").as("v")), ps, width = 8.0)
      base.unpersist()
      (md, f, m, r)
    })
    val rfm = rfmOf(maxDate)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def asc(c: Column, b: Seq[Double]) = // higher value = better score
      when(c <= b(0), 1).when(c <= b(1), 2).when(c <= b(2), 3)
        .when(c <= b(3), 4).otherwise(5)
    def desc(c: Column, b: Seq[Double]) = // lower value = better score
      when(c <= b(0), 5).when(c <= b(1), 4).when(c <= b(2), 3)
        .when(c <= b(3), 2).otherwise(1)
    val out = rfm
      .select(desc($"r".cast("double"), br).as("r_score"),
        asc($"f".cast("double"), bf).as("f_score"),
        asc($"m".cast("double"), bm).as("m_score"), $"m")
      .groupBy($"r_score", $"f_score", $"m_score")
      .agg(count(lit(1)).as("n_customers"), sum($"m").as("sum_cents"))
      .withColumn("avg_cents", expr("sum_cents div n_customers"))
      .orderBy($"r_score", $"f_score", $"m_score")
    // materialize the (≤ 125-row) census before releasing the rfm cache
    val result = out.localCheckpoint()
    rfm.unpersist()
    result
  }

  /** D92: decile lift / gains table for the q52 score — the OTHER
    * standard classifier-eval artifact (campaign targeting reads it as
    * "mailing the top 3 deciles captures X% of responders"). Documents
    * are ranked score-descending and cut into 10 population deciles;
    * each reports its positive rate and cumulative lift over the base
    * rate.
    *
    * Deciles are assigned to whole SCORE GROUPS by where the group
    * starts: decile = 1 + (10·cum_before) div total — pure integer
    * arithmetic, no float in the cut, and tied scores can never
    * straddle engines differently (a giant tie block may leave later
    * deciles empty; that is the correct tie-safe semantics). pos_rate
    * and cum_lift are single divisions of exact integers, 4-dp.
    *
    * Scale shape: q52's frame — one equi-join + partial-agg groupBy
    * score; every window runs over score-cardinality (or ≤ 10) rows,
    * never corpus rows. */
  def q56DecileLift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scored = Tables.documents(spark, dir)
      .select($"doc_id", $"n_chars".as("score"))
      .join(Tables.embeddings(spark, dir)
        .select($"vec_id".as("doc_id"),
          ($"label" >= aucPosCut).cast("long").as("pos")), "doc_id")
    val byScore = scored.groupBy($"score")
      .agg(count(lit(1)).as("n_tot"), sum($"pos").as("n_pos"))
    val wCum = Window.orderBy($"score".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy()
    val g = byScore
      .withColumn("cum_before", coalesce(sum($"n_tot").over(wCum), lit(0L)))
      .withColumn("total", sum($"n_tot").over(wAll))
      .withColumn("total_pos", sum($"n_pos").over(wAll))
      .withColumn("decile",
        (lit(1) + expr("(10 * cum_before) div total")).cast("int"))
    val wDec = Window.orderBy($"decile")
      .rowsBetween(Window.unboundedPreceding, 0)
    g.groupBy($"decile")
      .agg(sum($"n_tot").as("n"), sum($"n_pos").as("n_pos"),
        max($"total").as("total"), max($"total_pos").as("total_pos"))
      .withColumn("cum_n", sum($"n").over(wDec))
      .withColumn("cum_pos", sum($"n_pos").over(wDec))
      .select($"decile", $"n", $"n_pos", $"cum_pos",
        round($"n_pos".cast("double") / $"n".cast("double"), 4)
          .as("pos_rate"),
        round(($"cum_pos" * $"total").cast("double") /
          ($"cum_n" * $"total_pos").cast("double"), 4).as("cum_lift"))
      .orderBy($"decile")
  }

  /** D95: CUSUM changepoint detection on daily event volume — the
    * classic drift monitor (Page 1954): the cumulative sum of
    * deviations from the global mean wanders near zero under a stable
    * rate and ramps when the level shifts; days where |CUSUM| ≥ 0.1·μ·t̄
    * (a tenth of the mean daily volume) are flagged as drift evidence.
    *
    * Integer discipline: CUSUM_t = cum_t − t·μ is rational (μ =
    * total/n), so the engine works with the n-scaled integer
    * dev_t = n·cum_t − t·total = n·CUSUM_t and flags
    * 10·|dev_t| ≥ total ⟺ |CUSUM_t| ≥ 0.1·μ. No float enters the
    * predicate; the reported statistic dev/total = CUSUM/μ (drift in
    * units of mean daily volume) is one exact-integer division rounded
    * 4-dp.
    *
    * Scale shape: the daily census is a partial-agg groupBy with
    * TIME-RANGE-bounded output (rows = days); every window (rank,
    * running sum, grand totals) runs over that day-cardinality frame,
    * never over events. */
  def q57Cusum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy(date_trunc("day", $"ts").cast("date").as("day"))
      .agg(count(lit(1)).as("x"))
    val wOrd = Window.orderBy($"day")
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy()
    daily
      .withColumn("t", row_number().over(wOrd).cast("long"))
      .withColumn("cum", sum($"x").over(wCum))
      .withColumn("n", sum(lit(1L)).over(wAll))
      .withColumn("total", sum($"x").over(wAll))
      .withColumn("dev", $"n" * $"cum" - $"t" * $"total")
      .filter(lit(10L) * abs($"dev") >= $"total")
      .select($"day", $"x",
        round($"dev".cast("double") / $"total".cast("double"), 4)
          .as("cusum_norm"))
      .orderBy($"day")
  }

  /** Minimum pair support (distinct orders) for a q58 rule. */
  val ruleMinSupport = 2L

  /** D98: association-rule mining over order baskets — directed rules
    * a→b with support ≥ [[ruleMinSupport]] and confidence ≥ 10%,
    * ranked by lift; the a-priori first pass every recommender /
    * assortment analysis starts from ("customers who bought a also
    * bought b").
    *
    *   conf(a→b) = sup(ab)/sup(a);  lift = conf / (sup(b)/N)
    *
    * Determinism: support counts are exact integers; the confidence
    * gate is the INTEGER predicate 10·sup_ab ≥ sup_a; conf and lift
    * are single divisions of exact integer products, 4-dp, and the
    * top-20 ranks on the raw double (identical bits) with (a, b) ties.
    *
    * Scale shape: the basket self-join explodes per-order cliques —
    * bounded by order width (≤ 7 in TPC-H shape, the g1/g2 argument);
    * pair and item supports are partial-aggregated groupBys; the
    * item-support joins are vocabulary-sized shuffle joins; top-20 is
    * TakeOrdered, not a global sort. */
  def q58AssocRules(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey").distinct()
    val nOrders = li.select($"l_orderkey").distinct().count()
    val item = li.groupBy($"l_partkey").agg(count(lit(1)).as("sup"))
    val pair = li.as("a").join(li.as("b"), Seq("l_orderkey"))
      .filter($"a.l_partkey" =!= $"b.l_partkey")
      .select($"a.l_partkey".as("pa"), $"b.l_partkey".as("pb"))
      .groupBy($"pa", $"pb").agg(count(lit(1)).as("sup_ab"))
      .filter($"sup_ab" >= ruleMinSupport)
    pair
      .join(item.select($"l_partkey".as("pa"), $"sup".as("sup_a")), "pa")
      .join(item.select($"l_partkey".as("pb"), $"sup".as("sup_b")), "pb")
      .filter(lit(10L) * $"sup_ab" >= $"sup_a")
      .withColumn("confidence",
        round($"sup_ab".cast("double") / $"sup_a".cast("double"), 4))
      .withColumn("lift",
        round(($"sup_ab" * lit(nOrders)).cast("double") /
          ($"sup_a" * $"sup_b").cast("double"), 4))
      .select($"pa", $"pb", $"sup_ab", $"confidence", $"lift")
      .orderBy($"lift".desc, $"pa", $"pb")
      .limit(20)
  }

  /** D99: weighted percentiles (quantity-weighted price quartiles per
    * return flag) — "the price a unit actually ships at": each price
    * counts with its shipped-quantity mass, the inventory/pricing
    * analyst's quantile, not the row-count one.
    *
    * Weighted p-quantile = the smallest value whose cumulative weight
    * reaches p·W — the INTEGER predicates 4·cumw ≥ W (p25), 2·cumw ≥ W
    * (p50), 4·cumw ≥ 3·W (p75) under a conditional min. No float
    * anywhere in the output.
    *
    * Scale shape: one partial-agg groupBy to the (flag, price-cents)
    * census — VALUE-CARDINALITY rows, bounded by the price grid, never
    * lineitem rows (the q52/t14 bounded-window argument) — then
    * windows and the conditional-min fold over that census. */
  def q59WeightedQuartiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cen = Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag".as("flag"),
        floor($"l_extendedprice" * 100).cast("long").as("cents"))
      .agg(sum(round($"l_quantity").cast("long")).as("w"))
    val wOrd = Window.partitionBy($"flag").orderBy($"cents")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy($"flag")
    cen
      .withColumn("cumw", sum($"w").over(wOrd))
      .withColumn("tot", sum($"w").over(wAll))
      .groupBy($"flag")
      .agg(
        min(when(lit(4L) * $"cumw" >= $"tot", $"cents")).as("wp25"),
        min(when(lit(2L) * $"cumw" >= $"tot", $"cents")).as("wp50"),
        min(when(lit(4L) * $"cumw" >= lit(3L) * $"tot", $"cents")).as("wp75"),
        max($"tot").as("total_weight"))
      .orderBy($"flag")
  }

  /** D100: exact Gini concentration of customer spend per nation —
    * "is revenue spread across the base or carried by whales", the
    * standard inequality index over the per-customer monetary mass.
    *
    *   G = (2·Σᵢ i·x₍ᵢ₎) / (n·Σx) − (n+1)/n   (i = ascending rank)
    *
    * computed WITHOUT a per-customer rank: group customers into a
    * spend-value census (value v, count c, preceding count p); the
    * rank-sum of a tied block is c·p + c(c+1)/2, so
    * Σᵢ i·x₍ᵢ₎ = Σ_v v·(c·p + c(c+1)/2) — every term an exact integer.
    * The only float is the final two-fraction subtraction, rounded
    * 4-dp, identical on both engines.
    *
    * Scale shape: per-customer totals are one partial-agg groupBy over
    * orders; the census collapses those to (nation, cents)
    * VALUE-CARDINALITY rows; windows run over the census only.
    * Integer-width bound: the per-block product cents·(c·p) stays
    * inside BIGINT while tie-block size × nation population ≲ 10¹¹
    * (cent-granular spend keeps tie blocks tiny); past that, cast the
    * two products to DECIMAL(38,0) — the p9 moments pattern. */
  def q60GiniSpend(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val spend = Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(sum(floor($"o_totalprice" * 100).cast("long")).as("cents"))
      .join(Tables.customer(spark, dir)
        .select($"c_custkey".as("o_custkey"), $"c_nationkey"), "o_custkey")
      .join(broadcast(Tables.nation(spark, dir)
        .select($"n_nationkey".as("c_nationkey"), $"n_name".as("nation"))),
        "c_nationkey")
    val cen = spend.groupBy($"nation", $"cents")
      .agg(count(lit(1)).as("c"))
    val wOrd = Window.partitionBy($"nation").orderBy($"cents")
      .rowsBetween(Window.unboundedPreceding, -1)
    val g = cen
      .withColumn("p", coalesce(sum($"c").over(wOrd), lit(0L)))
      .groupBy($"nation")
      .agg(sum($"c").as("n"), sum($"cents" * $"c").as("sx"),
        sum($"cents" * ($"c" * $"p" +
          expr("(c * (c + 1)) div 2"))).as("rs"))
    g.filter($"sx" > 0L)
      .select($"nation", $"n".as("n_customers"), $"sx".as("total_cents"),
        round(lit(2.0) * $"rs".cast("double") /
            ($"n" * $"sx").cast("double") -
          ($"n" + 1L).cast("double") / $"n".cast("double"), 4).as("gini"))
      .orderBy($"nation")
  }

  /** D104: Benford first-significant-digit audit of order totals — the
    * classic fraud/synthetic-data screen: the observed frequency of
    * each leading digit of `o_totalprice` against the Benford
    * expectation log10(1 + 1/d), plus the signed deviation. On
    * TPC-H-style uniform synthetic prices the deviation is LARGE —
    * which is exactly what the audit is for (real transactional data
    * follows Benford; generators don't).
    *
    * Determinism: the digit comes from the decimal string of
    * floor(price) (no log10-of-near-power-of-10 edge), frequencies are
    * exact-integer divisions rounded 4 dp, and the expectation is a
    * per-digit constant — both engines compute identical doubles.
    *
    * Scale shape: one scan, map-side partial agg to ≤ 9 rows; the
    * total rides a 9-row window — no second scan, no driver
    * round-trip. */
  def q61Benford(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select(substring(floor($"o_totalprice").cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy($"digit").agg(count(lit(1)).as("n"))
      .withColumn("total", sum($"n").over(Window.partitionBy()))
      .select($"digit", $"n",
        round($"n".cast("double") / $"total".cast("double"), 4).as("obs_p"),
        round(log10(lit(1.0) + lit(1.0) / $"digit".cast("double")), 4)
          .as("exp_p"))
      .withColumn("dev", round($"obs_p" - $"exp_p", 4))
      .orderBy($"digit")
  }

  /** D105: inter-purchase interval statistics — per user, the count /
    * min / max / mean of the gaps (whole seconds) between consecutive
    * purchases, the recency-cadence signal behind churn models and the
    * q55 RFM view's "frequency" axis made longitudinal.
    *
    * Gap math is in floor-seconds-since-epoch on both engines (Spark
    * `unix_timestamp`, DuckDB `floor(epoch(ts))`) so the fixture's
    * sub-second timestamp precision (µs in Spark, ns in DuckDB) can
    * never flip a gap. Same-second purchases order by event_id.
    *
    * Scale shape: one filter + one lag window per user (single hash
    * exchange on user_id) feeding a partial-aggregated per-user
    * rollup co-partitioned with the window — no self-join, no second
    * exchange. */
  def q62Interpurchase(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id",
        unix_timestamp($"ts").as("sec"))
      .withColumn("gap_s", $"sec" - lag($"sec", 1).over(w))
      .filter($"gap_s".isNotNull)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_gaps"), min($"gap_s").as("min_gap_s"),
        max($"gap_s").as("max_gap_s"),
        round(avg($"gap_s".cast("double")), 4).as("avg_gap_s"))
      .orderBy($"user_id")
  }

  /** Range-partition fan-out for [[q63Abc]]'s distributed prefix sum. */
  val abcBuckets = 1024L

  /** D106: ABC revenue classification — parts bucketed into the
    * classic A (first 80% of revenue), B (next 15%), C (tail 5%)
    * inventory classes by cumulative discounted-revenue share,
    * reported as class-level rollups. Tie-blocks (equal revenue)
    * share a class: class is decided by the block's cumulative START,
    * so no per-part global rank exists anywhere — the q59/q60 value-
    * census discipline.
    *
    * The cumulative sum is a genuinely DISTRIBUTED two-phase prefix
    * sum, not a single-partition window: census rows get a coarse
    * range key (`rev·1024 div (max+1)`, [[abcBuckets]] ordered
    * buckets), per-bucket subtotals roll up to a BOUNDED (≤1024-row)
    * offsets frame (the t14 bounded-global-window exemption), and the
    * within-bucket prefix runs under a window PARTITIONED by bucket —
    * so the big frame never funnels through one partition, at any
    * scale. Class predicates are exact-integer (5·cum < 4·total etc.);
    * the only float is the final 4-dp share. */
  def q63Abc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val census = Tables.lineitem(spark, dir)
      .select($"l_partkey",
        floor($"l_extendedprice" * (lit(1.0) - $"l_discount") * lit(100))
          .cast("long").as("cents"))
      .groupBy($"l_partkey").agg(sum($"cents").as("rev"))
      .groupBy($"rev").agg(count(lit(1)).as("c"))
      .withColumn("bc", $"rev" * $"c")
    val mx = census.agg(max($"rev").as("mxrev"))
    val bucketed = census.crossJoin(broadcast(mx))
      .withColumn("bucket", expr(s"(rev * $abcBuckets) div (mxrev + 1)"))
    val wB = Window.orderBy($"bucket".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bOff = bucketed.groupBy($"bucket").agg(sum($"bc").as("btot"))
      .withColumn("boff", coalesce(sum($"btot").over(wB), lit(0L)))
      .withColumn("total", sum($"btot").over(Window.partitionBy()))
      .drop("btot")
    val wIn = Window.partitionBy($"bucket").orderBy($"rev".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(bOff), "bucket")
      .withColumn("cum_start", $"boff" + coalesce(sum($"bc").over(wIn), lit(0L)))
      .withColumn("abc_class",
        when(lit(5L) * $"cum_start" < lit(4L) * $"total", "A")
          .when(lit(20L) * $"cum_start" < lit(19L) * $"total", "B")
          .otherwise("C"))
      .groupBy($"abc_class")
      .agg(sum($"c").as("n_parts"), sum($"bc").as("class_cents"),
        max($"total").as("t"))
      .select($"abc_class", $"n_parts", $"class_cents",
        round($"class_cents".cast("double") / $"t".cast("double"), 4)
          .as("share"))
      .orderBy($"abc_class")
  }

  /** q64 window (seconds) and relative tolerance (percent). Tuned so
    * the fixture yields hits at every SF (9 pairs at sf0.001, 111 at
    * sf0.01). */
  val dupInvWindowS = 30L * 86400L
  val dupInvTolPct = 5L

  /** D107: duplicate-invoice detection — pairs of orders by the SAME
    * customer whose totals agree within [[dupInvTolPct]]% and whose
    * dates fall within [[dupInvWindowS]] — the accounts-payable
    * double-billing screen.
    *
    * The pair generation is an equi-join on o_custkey (Catalyst
    * extracts the equality as the join key; the tolerance/time/order
    * predicates ride as join filters), so fan-out is bounded by the
    * per-customer order count squared — a dimension-bounded blow-up,
    * never corpus×corpus. Similarity is the exact-integer predicate
    * 100·|ca − cb| ≤ tol·ca (cents, relative to the earlier order);
    * dates compare in floor-seconds (the q62 convention). */
  def q64DupInvoices(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey",
        floor($"o_totalprice" * 100).cast("long").as("cents"),
        unix_timestamp($"o_orderdate").as("sec"))
    o.as("a").join(o.as("b"),
        $"a.o_custkey" === $"b.o_custkey" &&
          $"a.o_orderkey" < $"b.o_orderkey" &&
          abs($"a.sec" - $"b.sec") <= lit(dupInvWindowS) &&
          lit(100L) * abs($"a.cents" - $"b.cents") <= lit(dupInvTolPct) * $"a.cents")
      .select($"a.o_custkey".as("o_custkey"),
        $"a.o_orderkey".as("order_a"), $"b.o_orderkey".as("order_b"),
        $"a.cents".as("cents_a"), $"b.cents".as("cents_b"),
        abs($"a.sec" - $"b.sec").as("gap_s"))
      .orderBy($"o_custkey", $"order_a", $"order_b")
  }

  /** D116: join-key skew census — the "should I salt this join"
    * instrument (the measurement step in front of q27's salted join
    * and AQE skew handling): one row of distributional facts about
    * lineitem's l_partkey — key count, row count, the heaviest key's
    * count, mean rows/key, the max/mean skew ratio, and the share of
    * rows held by the top-10 keys.
    *
    * Scale shape: ONE partial-aggregated key census, persisted across
    * its two consumptions (global stats + top-10 TakeOrdered) — the
    * q43 no-second-scan discipline; the top-10 side is a TakeOrdered
    * (no global sort), and the two one-row frames cross-join
    * broadcast (q43's sanctioned scalar cross). */
  def q66SkewCensus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val keyCnt = Tables.lineitem(spark, dir)
      .groupBy($"l_partkey").agg(count(lit(1)).as("cnt"))
      .scopedPersist()
    val top10 = keyCnt.orderBy($"cnt".desc, $"l_partkey").limit(10)
      .agg(sum($"cnt").as("top10"))
    keyCnt
      .agg(count(lit(1)).as("n_keys"), sum($"cnt").as("n_rows"),
        max($"cnt").as("max_cnt"))
      .crossJoin(broadcast(top10))
      .select($"n_keys", $"n_rows", $"max_cnt",
        round($"n_rows".cast("double") / $"n_keys".cast("double"), 4)
          .as("avg_cnt"),
        round(($"max_cnt" * $"n_keys").cast("double") /
          $"n_rows".cast("double"), 4).as("skew_ratio"),
        round($"top10".cast("double") / $"n_rows".cast("double"), 4)
          .as("top10_share"))
  }

  // ---------------------------------------------------------------- q79

  /** D143: supplier-concentration audit — per supplier NATION, the
    * Herfindahl–Hirschman index of revenue share across that nation's
    * suppliers, plus the top-supplier share: the standard market- (or
    * data-source-) concentration readout.
    *
    * Exactness: HHI = Σ cᵢ² / (Σ cᵢ)² over exact revenue cents — both
    * numerator and denominator are exact integers in DECIMAL(38,0)
    * (the q71 overflow rule: cᵢ² of warehouse-scale cents passes
    * 2⁶³), so the index is ONE double division, 4-dp. Top share is an
    * integer max over the same census.
    *
    * Scale shape: one co-partitioned lineitem⋈supplier equi-join into
    * a partial-aggregated (nation, supplier) census, then a
    * nation-level rollup — no windows, no second scan. */
  def q79Hhi(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val spend = Tables.lineitem(spark, dir)
      .join(Tables.supplier(spark, dir), $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_nationkey".as("nation"), $"s_suppkey")
      .agg(sum(floor($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100)
        .cast("long")).as("c"))
    spend.groupBy($"nation")
      .agg(count(lit(1)).as("n_suppliers"),
        sum($"c").as("total_cents"),
        sum($"c".cast("decimal(38,0)") * $"c").as("sumsq"),
        max($"c").as("max_c"))
      .select($"nation", $"n_suppliers", $"total_cents",
        round(expr("""CAST(sumsq AS DOUBLE) /
            (CAST(total_cents AS DOUBLE) * CAST(total_cents AS DOUBLE))"""), 4)
          .as("hhi"),
        round(expr("CAST(max_c AS DOUBLE) / CAST(total_cents AS DOUBLE)"), 4)
          .as("top_share"))
      .orderBy($"nation")
  }

  // ---------------------------------------------------------------- q80

  /** D144: classical seasonal decomposition of monthly revenue per
    * nation — y = trend + seasonal + residual with a centered 12-month
    * moving average trend (the 2×12 MA: ½,1,…,1,½ over 13 months) and
    * month-of-year seasonal means, the additive decomposition every
    * forecasting text opens with (q65's Holt smooths; q80 explains).
    *
    * Exactness in 24ths (the q71 scale-through trick): trend·24 is the
    * INTEGER W₁₃ + W₁₁ (two rows-frame window sums — 13-wide plus
    * 11-wide equals the ½-weighted 13-window ×24); the detrended
    * series ×24 is integer; each month-of-year seasonal is the exact
    * integer pair (Σ detr24, k) divided ONCE; trend, seasonal, and
    * residual are each a single fixed IEEE expression over those
    * integers, 4-dp. No double is ever summed by an unordered
    * aggregate.
    *
    * Scale shape: monthly census bounded by calendar×nations; all
    * windows PARTITION BY nation; the seasonal census is ≤ 12 rows per
    * nation. Only full 13-month windows emit (standard edge trim). */
  def q80SeasonalDecompose(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decomposedCells(spark, dir)
      .select($"nation", $"m", $"cents",
        round(expr("CAST(trend24 AS DOUBLE) / 24.0"), 4).as("trend"),
        round(expr("CAST(snum AS DOUBLE) / (24.0 * CAST(sk AS DOUBLE))"), 4)
          .as("seasonal"),
        round(expr(residExprSql), 4).as("residual"))
      .orderBy($"nation", $"m")
  }

  /** The exact-integer residual expression shared by q80/q87. */
  private val residExprSql =
    "CAST(cents AS DOUBLE) - CAST(trend24 AS DOUBLE) / 24.0" +
      " - CAST(snum AS DOUBLE) / (24.0 * CAST(sk AS DOUBLE))"

  /** Shared q80/q87 decomposition cells: full-window months with the
    * exact integer state (trend24, seasonal numerator/count) — the
    * rounded q80 view and q87's anomaly flags both project from it. */
  private def decomposedCells(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val monthly = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .groupBy($"c_nationkey".as("nation"),
        (year($"o_orderdate") * 12 + month($"o_orderdate")).as("m"))
      .agg(sum(floor($"o_totalprice" * 100).cast("long")).as("cents"))
    val w13 = Window.partitionBy($"nation").orderBy($"m").rowsBetween(-6, 6)
    val w11 = Window.partitionBy($"nation").orderBy($"m").rowsBetween(-5, 5)
    val trended = monthly
      .withColumn("n13", count(lit(1)).over(w13))
      // contiguity guard: 13 rows spanning exactly 12 month steps
      .withColumn("span13",
        max($"m").over(w13) - min($"m").over(w13))
      .withColumn("trend24", sum($"cents").over(w13) + sum($"cents").over(w11))
      .filter($"n13" === 13 && $"span13" === 12)
      .withColumn("detr24",
        lit(24L) * $"cents" - $"trend24")
      .scopedPersist()
    val seasonal = trended
      .groupBy($"nation", pmod($"m", lit(12)).as("moy"))
      .agg(sum($"detr24").as("snum"), count(lit(1)).as("sk"))
    trended.as("t")
      .join(seasonal.as("s"),
        $"t.nation" === $"s.nation" &&
          pmod($"t.m", lit(12)) === $"s.moy")
      .select($"t.nation".as("nation"), $"m", $"cents",
        $"trend24", $"snum", $"sk")
  }

  // ---------------------------------------------------------------- q81

  /** Number of spend bands for the q81 migration matrix. */
  val migBands = 5

  /** D149: customer spend-segment migration — split the corpus
    * timeline at its midpoint day, band customers into [[migBands]]
    * spend quintiles within each half (plus NONE for halves with no
    * orders), and emit the transition matrix: the "are my best
    * customers upgrading or churning" cohort-movement readout that
    * q55's static RFM snapshot can't answer.
    *
    * Determinism: quintiles use NO ntile — the band is
    * floor(B·(rn−1)/cnt) over the total order (cents, custkey), so
    * ties are pinned and both engines replay the identical banding
    * (the q44 discipline). The midpoint is derived from the data
    * ((min+max)/2 of epoch days — a deterministic constant, not a
    * config).
    *
    * Scale shape: one orders scan into per-(customer, half) cents; the
    * rank windows partition by half (two in-partition sorts); the
    * matrix rollup is ≤ (B+1)² rows. */
  def q81SegmentMigration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val days = Tables.orders(spark, dir)
      .select($"o_custkey",
        datediff(to_date($"o_orderdate"), lit("1970-01-01")).as("day"),
        floor($"o_totalprice" * 100).cast("long").as("cents"))
      .scopedPersist()
    val mid = days.agg(((min($"day") + max($"day")) / 2).cast("long").as("mid"))
    val halves = days.crossJoin(broadcast(mid))
      .groupBy($"o_custkey", ($"day" <= $"mid").as("first_half"))
      .agg(sum($"cents").as("c"))
    // global rank per half WITHOUT a one-partition window: the q38/q76
    // two-phase bucket-prefix (bucket census bounded by value range)
    val withB = halves.withColumn("b", expr("c div 10000000"))
    val wPre = Window.partitionBy($"first_half").orderBy($"b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bPre = withB.groupBy($"first_half", $"b")
      .agg(count(lit(1)).as("bc"))
      .withColumn("off", coalesce(sum($"bc").over(wPre), lit(0L)))
      .withColumn("cnt", sum($"bc").over(Window.partitionBy($"first_half")))
      .select($"first_half", $"b", $"off", $"cnt")
    val wIn = Window.partitionBy($"first_half", $"b")
      .orderBy($"c", $"o_custkey")
    val banded = withB.join(broadcast(bPre), Seq("first_half", "b"))
      .withColumn("rn", $"off" + row_number().over(wIn))
      .select($"o_custkey", $"first_half",
        expr(s"CAST($migBands * (rn - 1) div cnt AS INT) + 1").as("band"))
    val h1 = banded.filter($"first_half").select($"o_custkey", $"band".as("band_from"))
    val h2 = banded.filter(!$"first_half").select($"o_custkey", $"band".as("band_to"))
    h1.join(h2, Seq("o_custkey"), "full_outer")
      .select(coalesce($"band_from", lit(0)).as("band_from"),
        coalesce($"band_to", lit(0)).as("band_to"))
      .groupBy($"band_from", $"band_to")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"band_from", $"band_to")
  }

  // ---------------------------------------------------------------- q82

  /** D150: Lorenz curve decile table of customer lifetime spend — per
    * spend decile (ascending), the customer count, decile revenue, and
    * cumulative revenue share: the curve behind q60's Gini scalar
    * (q60 says HOW unequal; q82 shows WHERE the mass sits).
    *
    * Exactness: deciles via the q44/q81 rank-band formula (no ntile);
    * cumulative shares are exact integer running sums over the
    * 10-row decile census (bounded global window, t14 exemption)
    * divided once, 4-dp.
    *
    * Scale shape: one orders scan → per-customer cents (partial agg),
    * a two-phase bucket-prefix rank (q38/q76 shape), decile rollup to
    * ≤ 10 rows. */
  def q82LorenzDeciles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(sum(floor($"o_totalprice" * 100).cast("long")).as("c"))
    // two-phase global rank (q38/q76 shape): bucket census prefix +
    // in-bucket row_number — no one-partition corpus window
    val withB = per.withColumn("b", expr("c div 10000000"))
    val wPre = Window.orderBy($"b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bPre = withB.groupBy($"b").agg(count(lit(1)).as("bc"))
      .withColumn("off", coalesce(sum($"bc").over(wPre), lit(0L)))
      .withColumn("cnt", sum($"bc").over(Window.partitionBy()))
      .select($"b", $"off", $"cnt")
    val wIn = Window.partitionBy($"b").orderBy($"c", $"o_custkey")
    val dec = withB.join(broadcast(bPre), Seq("b"))
      .withColumn("rn", $"off" + row_number().over(wIn))
      .select(expr("CAST(10 * (rn - 1) div cnt AS INT) + 1").as("decile"), $"c")
      .groupBy($"decile")
      .agg(count(lit(1)).as("n_customers"), sum($"c").as("decile_cents"))
    val wCum = Window.orderBy($"decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dec
      .withColumn("cum_cents", sum($"decile_cents").over(wCum))
      .withColumn("total", sum($"decile_cents").over(Window.partitionBy()))
      .select($"decile", $"n_customers", $"decile_cents",
        round(expr("CAST(cum_cents AS DOUBLE) / CAST(total AS DOUBLE)"), 4)
          .as("cum_share"))
      .orderBy($"decile")
  }

  // ---------------------------------------------------------------- q84

  /** D156: month-over-month Laspeyres price index over the part
    * catalog — "how much did the SAME basket cost this month vs
    * last", weighting each part's current unit price by its
    * PRIOR-month quantity (the standard base-weighted index; the
    * price-level companion of q80's revenue decomposition).
    *
    *   L_m = Σᵢ p_{i,m}·q_{i,m−1} / Σᵢ p_{i,m−1}·q_{i,m−1}
    *
    * Exactness: the denominator is Σ ep_{i,m−1} — an EXACT integer
    * (price×quantity of the base month IS extended-price cents). The
    * numerator's terms p_{i,m}·q_{i,m−1} = ep_m·q_{m−1}/q_m are
    * rationals; each is ROUNDED TO THE 4-DP GRID and summed as
    * DECIMAL (the t26 round-before-sum rule — no float summation
    * order), then ONE division, 4-dp. Parts must trade in both
    * months (standard matched-basket rule).
    *
    * Scale shape: one partial-aggregated (part, month) census, one
    * co-partitioned self-join on (part, month−1), a month-level
    * rollup — census is |parts|·|months|, join is equi on the same
    * key layout. */
  def q84PriceIndex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val monthly = Tables.lineitem(spark, dir)
      .groupBy($"l_partkey".as("pk"),
        (year($"l_shipdate") * 12 + month($"l_shipdate")).as("m"))
      .agg(sum(floor($"l_extendedprice" * 100).cast("long")).as("ep"),
        sum(round($"l_quantity").cast("long")).as("qty"))
      .filter($"qty" > 0)
    monthly.as("cur").join(monthly.as("base"),
        $"cur.pk" === $"base.pk" && $"cur.m" === $"base.m" + 1)
      .select($"cur.m".as("m"),
        expr("""CAST(round(CAST(cur.ep AS DOUBLE) * CAST(base.qty AS DOUBLE)
            / CAST(cur.qty AS DOUBLE), 4) AS DECIMAL(38,6))""").as("num_term"),
        $"base.ep".as("den_term"))
      .groupBy($"m")
      .agg(count(lit(1)).as("n_parts"),
        sum($"num_term").as("num"), sum($"den_term").as("den"))
      .select($"m", $"n_parts",
        round(expr("CAST(num AS DOUBLE) / CAST(den AS DOUBLE)"), 4)
          .as("laspeyres"))
      .orderBy($"m")
  }

  // ---------------------------------------------------------------- q85

  /** D158: cohort LTV curves — customers cohorted by FIRST-order
    * month; for each (cohort, age-in-months) cell, the cohort's
    * cumulative revenue per member: the lifetime-value ramp that
    * prices acquisition (q45 counts who RETURNS; q85 tracks what they
    * are WORTH).
    *
    * Exactness: cumulative cents are exact integer running sums over
    * per-(cohort, age) cells — windows PARTITIONED BY cohort with age
    * spans bounded by the calendar; cohort sizes are exact counts;
    * ONE division per cell, 4-dp.
    *
    * Scale shape: a per-customer min-month partial agg, one
    * co-partitioned join back to orders, a (cohort, age) partial agg
    * (calendar²-bounded output), then the bounded running window. */
  def q85CohortLtv(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val om = Tables.orders(spark, dir)
      .select($"o_custkey",
        (year($"o_orderdate") * 12 + month($"o_orderdate")).as("m"),
        floor($"o_totalprice" * 100).cast("long").as("cents"))
    val cohorts = om.groupBy($"o_custkey").agg(min($"m").as("cohort_m"))
    val sizes = cohorts.groupBy($"cohort_m")
      .agg(count(lit(1)).as("n_customers"))
    val cells = om.join(cohorts, "o_custkey")
      .groupBy($"cohort_m", ($"m" - $"cohort_m").as("age"))
      .agg(sum($"cents").as("cell_cents"))
    val wCum = Window.partitionBy($"cohort_m").orderBy($"age")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_cents", sum($"cell_cents").over(wCum))
      .join(sizes, "cohort_m")
      .select($"cohort_m", $"age", $"n_customers",
        round(expr("CAST(cum_cents AS DOUBLE) / CAST(n_customers AS DOUBLE)"), 4)
          .as("ltv_cents"))
      .orderBy($"cohort_m", $"age")
  }

  // ---------------------------------------------------------------- q87

  /** q87 anomaly threshold in MADs. */
  val residMadK = 5

  /** D162: seasonal-residual anomaly detection — flag the months whose
    * q80 decomposition residual sits more than [[residMadK]] MADs from
    * its nation's median residual: the "this month broke the pattern"
    * alert that raw-value thresholds (q54) can't see because trend and
    * weekly/annual cycle mask it. Composes q80's cells with q35's
    * median/MAD robustness.
    *
    * Determinism: residuals are the shared exact-integer expression
    * ([[residExprSql]]); medians are the q69 row_number/count spelling
    * (no `percentile` buffering) over PER-NATION windows bounded by
    * the calendar; the flag compares identical doubles. Only flagged
    * rows emit.
    *
    * Scale shape: q80's census work + two bounded per-nation window
    * passes (median of residuals, median of absolute deviations) and
    * one broadcast join of the ≤|nations|-row threshold frame. */
  def q87ResidualAnomaly(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = decomposedCells(spark, dir)
      .withColumn("resid", expr(residExprSql))
      .scopedPersist()
    def medianOf(df: DataFrame, col: String, out: String): DataFrame = {
      val wR = Window.partitionBy($"nation").orderBy(expr(col))
      val wA = Window.partitionBy($"nation")
      df.withColumn("rn", row_number().over(wR))
        .withColumn("cnt", count(lit(1)).over(wA))
        .filter($"rn" === expr("(cnt + 1) div 2") ||
          $"rn" === expr("cnt div 2 + 1"))
        .groupBy($"nation")
        .agg(expr(s"min($col) + (max($col) - min($col)) * 0.5").as(out))
    }
    val med = medianOf(cells, "resid", "med")
    val dev = cells.join(broadcast(med), "nation")
      .withColumn("adev", abs($"resid" - $"med"))
      .scopedPersist()
    val mad = medianOf(dev, "adev", "mad")
    dev.join(broadcast(mad), "nation")
      // +0.5 cents floor: kills float dust when a small series has
      // MAD exactly 0 (deviation must be a real half-cent, not 1e-9)
      .filter($"adev" > lit(residMadK.toDouble) * $"mad" + lit(0.5))
      .select($"nation", $"m", $"cents", round($"resid", 4).as("residual"),
        round($"adev", 4).as("deviation"), round($"mad", 4).as("mad"))
      .orderBy($"nation", $"m")
  }

  /** D200: log-log price-elasticity regression per brand — for each
    * part brand, OLS of ln(quantity) on ln(unit price) across its
    * line items: the slope IS the own-price elasticity (% quantity
    * change per % price change) and r² says how much of the quantity
    * variation price explains — the pricing team's first screen for
    * "which brands can absorb a price increase" (|ε| < 1 = inelastic).
    *
    * Determinism: both logs are snapped per row to a 1e-6 integer
    * grid (floor(ln·1e6 + 0.5) — ln of positive cents/quantities, so
    * the +0.5 round never crosses zero), making all five regression
    * moments exact DECIMAL(38,0)/HUGEINT sums — ORDER-FREE; the
    * elasticity/r² closed forms are one IEEE expression each over
    * those identical integers, 4-dp. The grid cancels out of the
    * slope (both axes scaled by 1e6).
    *
    * Scale shape: one broadcast part-dim join (the q3 shape), one
    * map-side-combined moment aggregate to ≤ |brands| rows — nothing
    * downstream of the scan shuffles more. */
  def q97Elasticity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
        .select($"p_partkey", $"p_brand")), $"l_partkey" === $"p_partkey")
      .select($"p_brand".as("brand"),
        expr("""CAST(floor(ln(CAST(floor(l_extendedprice * 100.0
            / l_quantity) AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)""").as("xq"),
        expr("CAST(floor(ln(CAST(l_quantity AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)")
          .as("yq"))
    li.groupBy($"brand")
      .agg(count(lit(1)).as("n"),
        sum($"xq".cast("decimal(38,0)")).as("sx"),
        sum($"yq".cast("decimal(38,0)")).as("sy"),
        sum($"xq".cast("decimal(38,0)") * $"xq").as("sxx"),
        sum($"yq".cast("decimal(38,0)") * $"yq").as("syy"),
        sum($"xq".cast("decimal(38,0)") * $"yq").as("sxy"))
      .select($"brand", $"n",
        round(expr("""(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"""), 4)
          .as("elasticity"),
        round(expr("""((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
            / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"""), 4)
          .as("r2"))
      .orderBy($"brand")
  }

  /** D210: seasonal/trend STRENGTH summary — per nation, Hyndman's
    * F_t = max(0, 1 − Var(R)/Var(T+R)) and
    * F_s = max(0, 1 − Var(R)/Var(S+R)) over q80's classical
    * decomposition: the one-row-per-series answer to "is this market
    * actually seasonal, and how strong is its trend" that q80's
    * month-by-month table makes the reader compute by eye. Both lie
    * in [0, 1]; a mixture of markets ranks directly.
    *
    * Determinism: q80's 4-dp components are identical doubles on both
    * engines; each is snapped to its exact 1e-4 integer
    * (round(v·1e4)), so every variance moment is an exact
    * DECIMAL(38,0)/HUGEINT sum — ORDER-FREE; strengths are one IEEE
    * expression each, clamped at 0, 4-dp.
    *
    * Scale shape: q80's windowed decomposition (bounded by
    * nation × months) + ONE census-sized moment rollup. */
  def q101SeasonalStrength(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    q80SeasonalDecompose(spark, dir)
      .select($"nation",
        round($"trend" * 1e4).cast("long").as("tq"),
        round($"seasonal" * 1e4).cast("long").as("sq"),
        round($"residual" * 1e4).cast("long").as("rq"))
      .groupBy($"nation")
      .agg(count(lit(1)).as("n"),
        sum($"rq".cast("decimal(38,0)")).as("s_r"),
        sum($"rq".cast("decimal(38,0)") * $"rq").as("q_r"),
        sum(($"sq" + $"rq").cast("decimal(38,0)")).as("s_sr"),
        sum(($"sq" + $"rq").cast("decimal(38,0)") * ($"sq" + $"rq"))
          .as("q_sr"),
        sum(($"tq" + $"rq").cast("decimal(38,0)")).as("s_tr"),
        sum(($"tq" + $"rq").cast("decimal(38,0)") * ($"tq" + $"rq"))
          .as("q_tr"))
      .select($"nation", $"n".as("n_months"),
        round(expr("""greatest(0.0, 1.0 -
            (CAST(n AS DOUBLE) * CAST(q_r AS DOUBLE)
              - CAST(s_r AS DOUBLE) * CAST(s_r AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(q_tr AS DOUBLE)
              - CAST(s_tr AS DOUBLE) * CAST(s_tr AS DOUBLE)))"""), 4)
          .as("trend_strength"),
        round(expr("""greatest(0.0, 1.0 -
            (CAST(n AS DOUBLE) * CAST(q_r AS DOUBLE)
              - CAST(s_r AS DOUBLE) * CAST(s_r AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(q_sr AS DOUBLE)
              - CAST(s_sr AS DOUBLE) * CAST(s_sr AS DOUBLE)))"""), 4)
          .as("seasonal_strength"))
      .orderBy($"nation")
  }

  /** q102's late-shipment fence (days from order to ship). */
  val slaLateDays = 90L

  /** D212: fulfillment-lag census — per order priority, the exact
    * order-to-ship lag distribution (mean, median, p90 as TRUE order
    * statistics, late fraction beyond [[slaLateDays]]): the ops
    * dashboard that q68's independence test motivates — IF status
    * depends on priority, this says by how many days. Medians/p90 are
    * exact rank-based values from the q38 two-phase distinct-value
    * census (the doubled-median trick handles even counts without
    * interpolation); no percentile buffering anywhere.
    *
    * Scale shape: ONE co-partitioned lineitem⋈orders join +
    * map-side-combined (priority, lag) census; windows run over the
    * census (bounded by the lag domain), never rows. */
  def q102ShipLag(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val census = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .select($"o_orderpriority".as("priority"),
        datediff($"l_shipdate", $"o_orderdate").cast("long").as("lag"))
      .groupBy($"priority", $"lag").agg(count(lit(1)).as("cnt"))
    val wSeq = Window.partitionBy($"priority").orderBy($"lag")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy($"priority")
    census
      .withColumn("cb", coalesce(sum($"cnt").over(wSeq), lit(0L)))
      .withColumn("ng", sum($"cnt").over(wAll))
      .groupBy($"priority")
      .agg(max($"ng").as("n_items"),
        sum($"cnt" * $"lag").as("sl"),
        sum(when($"cb" < expr("(ng + 1) div 2") &&
          expr("(ng + 1) div 2") <= $"cb" + $"cnt", $"lag").otherwise(0L))
          .as("vlo"),
        sum(when($"cb" < expr("(ng + 2) div 2") &&
          expr("(ng + 2) div 2") <= $"cb" + $"cnt", $"lag").otherwise(0L))
          .as("vhi"),
        sum(when($"cb" < expr("(9 * ng + 9) div 10") &&
          expr("(9 * ng + 9) div 10") <= $"cb" + $"cnt", $"lag")
          .otherwise(0L)).as("v90"),
        sum(when($"lag" > slaLateDays, $"cnt").otherwise(0L)).as("n_late"))
      .select($"priority", $"n_items",
        round(expr("CAST(sl AS DOUBLE) / CAST(n_items AS DOUBLE)"), 4)
          .as("avg_lag_days"),
        (($"vlo" + $"vhi").cast("double") / 2.0).as("med_lag_days"),
        $"v90".as("p90_lag_days"),
        round(expr("CAST(n_late AS DOUBLE) / CAST(n_items AS DOUBLE)"), 4)
          .as("late_frac"))
      .orderBy($"priority")
  }

  // --------------------------------------------------------------- q104

  /** Shared IEEE fragments for [[q104TheilDecomposition]] — one
    * expression text interpolated into both engines (the q103/q67
    * discipline). `sg`/`s` are exact DECIMAL/HUGEINT cent sums,
    * `ng`/`n` exact counts. */
  private val theilMuG = "(CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE))"
  private val theilRatio = s"(CAST(cents AS DOUBLE) / $theilMuG)"
  private val theilTerm =
    s"""CAST(floor(($theilRatio * ln($theilRatio)) * 1000000000.0 + 0.5)
        AS DECIMAL(38,0))"""
  private val theilShare = "(CAST(sg AS DOUBLE) / CAST(s AS DOUBLE))"
  private val theilBetween =
    s"""($theilShare
        * ln($theilShare / (CAST(ng AS DOUBLE) / CAST(n AS DOUBLE))))"""

  /** D219: Theil-T inequality decomposition of order revenue by
    * nation — within-nation Theil index T_g = (1/n_g)·Σ (x/μ_g)·
    * ln(x/μ_g) plus each nation's between-group term s_g·ln(s_g/p_g),
    * so Σ between + Σ s_g·T_g reconstructs total inequality: the
    * decomposable-inequality readout q60's Gini cannot give (Gini
    * does not split into within + between; Theil does — that is the
    * whole reason this index exists). A mix curator reads it the same
    * way an economist does: "is revenue concentration a cross-nation
    * story or an intra-nation story?"
    *
    * Determinism: the per-row transcendental term is snapped to the
    * 1e-9 grid (floor(x·1e9 + 0.5) — round-half-toward-+inf, the s5
    * negative-safe form) and summed as DECIMAL(38,0), so the
    * corpus-wide sum is ORDER-FREE (the s17 discipline); group/total
    * moments are exact integer cents summed as DECIMAL(38,0) (BIGINT
    * overflows cent sums long before 100 TB); every emitted double is
    * one shared IEEE tree, 4/6-dp.
    *
    * Scale shape: orders⋈customer is the one real shuffle join
    * (both corpus-sized, keyed on custkey); nation and the ≤|nation|
    * group-stat frames ride broadcasts; the projected (nation, cents)
    * frame persists for exactly two partial-aggregated passes. */
  def q104TheilDecomposition(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = Tables.orders(spark, dir)
      .select($"o_custkey", floor($"o_totalprice" * 100).cast("long").as("cents"))
      .join(Tables.customer(spark, dir)
        .select($"c_custkey".as("o_custkey"), $"c_nationkey"), "o_custkey")
      .join(broadcast(Tables.nation(spark, dir)
        .select($"n_nationkey".as("c_nationkey"), $"n_name".as("nation"))),
        "c_nationkey")
      .select($"nation", $"cents")
      .scopedPersist()
    val g = rows.groupBy($"nation").agg(count(lit(1)).as("ng"),
      sum($"cents".cast("decimal(38,0)")).as("sg"))
    val tot = g.agg(sum($"ng").as("n"), sum($"sg").as("s"))
    val terms = rows.join(broadcast(g), "nation")
      .select($"nation", expr(theilTerm).as("tq"))
      .groupBy($"nation").agg(sum($"tq").as("tsum"))
    g.join(terms, "nation").crossJoin(broadcast(tot))
      .select($"nation", $"ng".as("n_orders"),
        round(expr(theilShare), 4).as("income_share"),
        round(expr(
          "CAST(tsum AS DOUBLE) / (CAST(ng AS DOUBLE) * 1000000000.0)"), 6)
          .as("theil_within"),
        round(expr(theilBetween), 6).as("between_term"))
      .orderBy($"nation")
  }

  /** D244: year-over-year revenue growth accounting — decompose each
    * consecutive-year revenue change into the four levers a finance
    * review asks about: VOLUME (quantity change at last year's unit
    * price), PRICE (this year's quantity at the unit-price change),
    * NEW parts (revenue from parts with no prior-year sales) and
    * DISCONTINUED parts (lost prior-year revenue), plus the explicit
    * RESIDUAL the unit-price quantization leaves. Complements q84's
    * Laspeyres index (a pure price ratio) with the additive
    * bridge-chart decomposition.
    *
    * Determinism: per-(year, part) quantity and revenue-cents are
    * exact integer sums; the unit price is QUANTIZED to integer
    * milli-cents by integer division (r·1000 div q) so every effect is
    * a BIGINT sum — no float anywhere, and the identity
    * Δrev·1000 = vol + price + new − disc + residual is exact and
    * spec-gated. Effects report in milli-cents.
    *
    * Scale shape: one partial-aggregated (year, part) census off the
    * lineitem⋈orders join (the q84 shuffle), one part-keyed full-outer
    * self-join of adjacent-year slices, ≤ #year-pairs output rows. */
  def q108GrowthAccounting(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val yp = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir)
        .select($"o_orderkey".as("l_orderkey"), year($"o_orderdate").as("yr")),
        "l_orderkey")
      .groupBy($"yr", $"l_partkey")
      .agg(sum(round($"l_quantity").cast("long")).as("q"),
        sum(floor($"l_extendedprice" * 100).cast("long")).as("r"))
      .withColumn("p_mc", expr("(r * 1000) div q"))
      .scopedPersist()
    val a = yp.select($"yr", $"l_partkey", $"q".as("q1"), $"r".as("r1"),
      $"p_mc".as("p1"))
    val b = yp.select(($"yr" - 1).as("yr"), $"l_partkey", $"q".as("q2"),
      $"r".as("r2"), $"p_mc".as("p2"))
    val j = a.join(b, Seq("yr", "l_partkey"), "full_outer")
      .filter($"yr".isNotNull)
    // drop the sentinel pair beyond the last year (b shifted past max)
    // and before the first (a only): only yr pairs with BOTH sides
    val pairs = j.groupBy($"yr").agg(
        sum(coalesce($"r2", lit(0L)) - coalesce($"r1", lit(0L)))
          .as("delta_cents"),
        sum(when($"q1".isNotNull && $"q2".isNotNull,
          ($"q2" - $"q1") * $"p1").otherwise(0L)).as("vol_mc"),
        sum(when($"q1".isNotNull && $"q2".isNotNull,
          $"q2" * ($"p2" - $"p1")).otherwise(0L)).as("price_mc"),
        sum(when($"q1".isNull, $"r2" * 1000).otherwise(0L)).as("new_mc"),
        sum(when($"q2".isNull, $"r1" * 1000).otherwise(0L)).as("disc_mc"),
        max($"r1".isNotNull.cast("long")).as("has1"),
        max($"r2".isNotNull.cast("long")).as("has2"))
      .filter($"has1" === 1L && $"has2" === 1L)
    pairs.select($"yr".cast("long").as("year_from"),
        ($"yr" + 1).cast("long").as("year_to"),
        $"delta_cents", $"vol_mc", $"price_mc", $"new_mc", $"disc_mc",
        ($"delta_cents" * 1000 - $"vol_mc" - $"price_mc" - $"new_mc"
          + $"disc_mc").as("residual_mc"))
      .orderBy($"year_from")
  }

  /** Deepest purchase rank [[q109RepeatPurchase]] reports. */
  val repeatMaxRank = 20

  /** D246: repeat-purchase curve — for purchase rank n = 1..20, how
    * many customers ever reached an nth order, their share of the
    * first-order cohort (the retention curve a subscription/repeat
    * business plots first), and the n→n+1 conversion rate (where the
    * curve actually leaks). Complements q45's calendar cohorts (time
    * × cohort) with the ORDINAL view (rank × cohort), and q62's
    * cadence (how fast) with how FAR customers get.
    *
    * Determinism: rank = one row_number window per customer ordered
    * by (date, orderkey); everything after is integer counts and two
    * 4-dp divisions of exact integers.
    *
    * Scale shape: one customer-keyed window (the q45 exchange) → a
    * ≤[[repeatMaxRank]]-row census via partial-aggregated groupBy —
    * the curve math runs on ≤20 rows. */
  def q109RepeatPurchase(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
    // three subtrees read the census (itself, the shifted next-rank
    // frame, the cohort base) — persist so the orders window exchange
    // runs once
    val census = Tables.orders(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= repeatMaxRank)
      .groupBy($"rk").agg(count(lit(1)).as("n_customers"))
      .scopedPersist()
    val first = census.filter($"rk" === 1)
      .select($"n_customers".as("c1"))
    val nxt = census.select(($"rk" - 1).as("rk"), $"n_customers".as("c_next"))
    census.join(nxt, Seq("rk"), "left")
      .crossJoin(broadcast(first))
      .select($"rk".cast("long").as("purchase_rank"), $"n_customers",
        round($"n_customers".cast("double") / $"c1".cast("double"), 4)
          .as("cohort_share"),
        round($"c_next".cast("double") / $"n_customers".cast("double"), 4)
          .as("conversion_to_next"))
      .orderBy($"purchase_rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q109_repeat_purchase" -> q109RepeatPurchase,
    "q108_growth_accounting" -> q108GrowthAccounting,
    "q104_theil" -> q104TheilDecomposition,
    "q102_ship_lag" -> q102ShipLag,
    "q101_seasonal_strength" -> q101SeasonalStrength,
    "q97_elasticity" -> q97Elasticity,
    "q87_residual_anomaly" -> q87ResidualAnomaly,
    "q85_cohort_ltv" -> q85CohortLtv,
    "q84_price_index" -> q84PriceIndex,
    "q81_segment_migration" -> q81SegmentMigration,
    "q82_lorenz_deciles" -> q82LorenzDeciles,
    "q79_hhi" -> q79Hhi,
    "q80_seasonal_decompose" -> q80SeasonalDecompose,
    "q66_skew_census" -> q66SkewCensus,
    "q64_dup_invoices" -> q64DupInvoices,
    "q63_abc" -> q63Abc,
    "q62_interpurchase" -> q62Interpurchase,
    "q61_benford" -> q61Benford,
    "q59_weighted_quartiles" -> q59WeightedQuartiles,
    "q60_gini_spend" -> q60GiniSpend,
    "q58_assoc_rules" -> q58AssocRules,
    "q57_cusum" -> q57Cusum,
    "q56_decile_lift" -> q56DecileLift,
    "q55_rfm" -> q55Rfm,
    "q51_incremental_rollup" -> q51IncrementalRollup,
    "q52_auc" -> q52Auc,
    "q53_skyline" -> q53Skyline,
    "q54_seasonal_anomaly" -> q54SeasonalAnomaly,
    "q46_scd2" -> q46Scd2,
    "q72_scd2_incremental" -> q72Scd2Incremental,
    "q73_prorate" -> q73Prorate,
    "q47_copurchase" -> q47Copurchase,
    "q48_transitions" -> q48Transitions,
    "q49_trailing_dau" -> q49TrailingDau,
    "q50_sole_returns" -> q50SoleReturns)

  /** DuckDB replay of [[q80SeasonalDecompose]] — extracted so q101's
    * strength oracle can wrap it as a CTE. */
  private lazy val q80OracleSql: String =
    """WITH mon AS (SELECT c.c_nationkey AS nation,
              year(o.o_orderdate) * 12 + month(o.o_orderdate) AS m,
              CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2),
          tr AS (SELECT nation, m, cents,
              CAST(count(*) OVER w13 AS BIGINT) AS n13,
              CAST(max(m) OVER w13 - min(m) OVER w13 AS BIGINT) AS span13,
              CAST(sum(cents) OVER w13 + sum(cents) OVER w11 AS BIGINT)
                AS trend24
            FROM mon
            WINDOW w13 AS (PARTITION BY nation ORDER BY m
              ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING),
            w11 AS (PARTITION BY nation ORDER BY m
              ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)),
          full13 AS (SELECT *, 24 * cents - trend24 AS detr24
            FROM tr WHERE n13 = 13 AND span13 = 12),
          se AS (SELECT nation, m % 12 AS moy,
              CAST(sum(detr24) AS BIGINT) AS snum,
              CAST(count(*) AS BIGINT) AS sk
            FROM full13 GROUP BY 1, 2)
          SELECT f.nation, CAST(f.m AS INT) AS m, f.cents,
            round(CAST(f.trend24 AS DOUBLE) / 24.0, 4) AS trend,
            round(CAST(se.snum AS DOUBLE) / (24.0 * CAST(se.sk AS DOUBLE)), 4)
              AS seasonal,
            round(CAST(f.cents AS DOUBLE) - CAST(f.trend24 AS DOUBLE) / 24.0
              - CAST(se.snum AS DOUBLE) / (24.0 * CAST(se.sk AS DOUBLE)), 4)
              AS residual
          FROM full13 f JOIN se ON f.nation = se.nation AND f.m % 12 = se.moy
          ORDER BY f.nation, f.m"""

  val oracle: Map[String, String] = Map(
    "q109_repeat_purchase" ->
      s"""WITH r AS (SELECT row_number() OVER (
              PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
              AS rk
            FROM orders),
          c AS (SELECT rk, CAST(count(*) AS BIGINT) AS n_customers
            FROM r WHERE rk <= $repeatMaxRank GROUP BY rk),
          f AS (SELECT n_customers AS c1 FROM c WHERE rk = 1),
          nx AS (SELECT rk - 1 AS rk, n_customers AS c_next FROM c)
          SELECT CAST(c.rk AS BIGINT) AS purchase_rank, c.n_customers,
            round(CAST(c.n_customers AS DOUBLE) / CAST(f.c1 AS DOUBLE), 4)
              AS cohort_share,
            round(CAST(nx.c_next AS DOUBLE)
              / CAST(c.n_customers AS DOUBLE), 4) AS conversion_to_next
          FROM c LEFT JOIN nx ON nx.rk = c.rk CROSS JOIN f
          ORDER BY purchase_rank""",
    "q108_growth_accounting" ->
      """WITH yp AS (SELECT CAST(year(o.o_orderdate) AS BIGINT) AS yr,
              l.l_partkey,
              CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT)
                AS q,
              CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS r
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
            GROUP BY 1, 2),
          yq AS (SELECT yr, l_partkey, q, r, (r * 1000) // q AS p_mc
            FROM yp),
          j AS (SELECT coalesce(a.yr, b.yr - 1) AS yr,
              a.q AS q1, a.r AS r1, a.p_mc AS p1,
              b.q AS q2, b.r AS r2, b.p_mc AS p2
            FROM yq a FULL OUTER JOIN yq b
              ON a.yr = b.yr - 1 AND a.l_partkey = b.l_partkey),
          g AS (SELECT yr,
              CAST(sum(coalesce(r2, 0) - coalesce(r1, 0)) AS BIGINT)
                AS delta_cents,
              CAST(sum(CASE WHEN q1 IS NOT NULL AND q2 IS NOT NULL
                THEN (q2 - q1) * p1 ELSE 0 END) AS BIGINT) AS vol_mc,
              CAST(sum(CASE WHEN q1 IS NOT NULL AND q2 IS NOT NULL
                THEN q2 * (p2 - p1) ELSE 0 END) AS BIGINT) AS price_mc,
              CAST(sum(CASE WHEN q1 IS NULL THEN r2 * 1000 ELSE 0 END)
                AS BIGINT) AS new_mc,
              CAST(sum(CASE WHEN q2 IS NULL THEN r1 * 1000 ELSE 0 END)
                AS BIGINT) AS disc_mc,
              max(CASE WHEN r1 IS NOT NULL THEN 1 ELSE 0 END) AS has1,
              max(CASE WHEN r2 IS NOT NULL THEN 1 ELSE 0 END) AS has2
            FROM j GROUP BY yr)
          SELECT yr AS year_from, yr + 1 AS year_to, delta_cents,
            vol_mc, price_mc, new_mc, disc_mc,
            CAST(delta_cents * 1000 - vol_mc - price_mc - new_mc
              + disc_mc AS BIGINT) AS residual_mc
          FROM g WHERE has1 = 1 AND has2 = 1
          ORDER BY year_from""",
    "q104_theil" ->
      s"""WITH r AS (SELECT n.n_name AS nation,
                  CAST(floor(o.o_totalprice * 100) AS BIGINT) AS cents
                FROM orders o
                JOIN customer c ON c.c_custkey = o.o_custkey
                JOIN nation n ON n.n_nationkey = c.c_nationkey),
          g AS (SELECT nation, CAST(count(*) AS BIGINT) AS ng,
                  sum(cents) AS sg
                FROM r GROUP BY nation),
          tot AS (SELECT CAST(sum(ng) AS BIGINT) AS n, sum(sg) AS s
                  FROM g),
          t AS (SELECT r.nation, $theilTerm AS tq
                FROM r JOIN g USING (nation)),
          ts AS (SELECT nation, sum(tq) AS tsum FROM t GROUP BY nation)
          SELECT g.nation, g.ng AS n_orders,
            round($theilShare, 4) AS income_share,
            round(CAST(tsum AS DOUBLE)
              / (CAST(ng AS DOUBLE) * 1000000000.0), 6) AS theil_within,
            round($theilBetween, 6) AS between_term
          FROM g JOIN ts USING (nation) CROSS JOIN tot
          ORDER BY nation""",
    "q102_ship_lag" ->
      s"""WITH census AS (SELECT o.o_orderpriority AS priority,
              CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT)
                AS lag,
              CAST(count(*) AS BIGINT) AS cnt
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY 1, 2),
          cum AS (SELECT priority, lag, cnt,
              COALESCE(CAST(sum(cnt) OVER (PARTITION BY priority
                ORDER BY lag ROWS BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING) AS BIGINT), 0) AS cb,
              CAST(sum(cnt) OVER (PARTITION BY priority) AS BIGINT) AS ng
            FROM census),
          g AS (SELECT priority,
              CAST(max(ng) AS BIGINT) AS n_items,
              CAST(sum(cnt * lag) AS BIGINT) AS sl,
              CAST(sum(CASE WHEN cb < (ng + 1) // 2
                AND (ng + 1) // 2 <= cb + cnt THEN lag ELSE 0 END)
                AS BIGINT) AS vlo,
              CAST(sum(CASE WHEN cb < (ng + 2) // 2
                AND (ng + 2) // 2 <= cb + cnt THEN lag ELSE 0 END)
                AS BIGINT) AS vhi,
              CAST(sum(CASE WHEN cb < (9 * ng + 9) // 10
                AND (9 * ng + 9) // 10 <= cb + cnt THEN lag ELSE 0 END)
                AS BIGINT) AS v90,
              CAST(sum(CASE WHEN lag > $slaLateDays THEN cnt ELSE 0 END)
                AS BIGINT) AS n_late
            FROM cum GROUP BY priority)
          SELECT priority, n_items,
            round(CAST(sl AS DOUBLE) / CAST(n_items AS DOUBLE), 4)
              AS avg_lag_days,
            CAST(vlo + vhi AS DOUBLE) / 2.0 AS med_lag_days,
            v90 AS p90_lag_days,
            round(CAST(n_late AS DOUBLE) / CAST(n_items AS DOUBLE), 4)
              AS late_frac
          FROM g ORDER BY priority""",
    "q97_elasticity" ->
      """WITH li AS (SELECT p.p_brand AS brand,
              CAST(floor(ln(CAST(floor(l.l_extendedprice * 100.0
                / l.l_quantity) AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS xq,
              CAST(floor(ln(CAST(l.l_quantity AS DOUBLE)) * 1e6 + 0.5)
                AS BIGINT) AS yq
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
          m AS (SELECT brand, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(xq) AS HUGEINT) AS sx,
              CAST(sum(yq) AS HUGEINT) AS sy,
              sum(CAST(xq AS HUGEINT) * xq) AS sxx,
              sum(CAST(yq AS HUGEINT) * yq) AS syy,
              sum(CAST(xq AS HUGEINT) * yq) AS sxy
            FROM li GROUP BY brand)
          SELECT brand, n,
            round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 4) AS elasticity,
            round(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
              / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4) AS r2
          FROM m ORDER BY brand""",
    "q87_residual_anomaly" ->
      s"""WITH mon AS (SELECT c.c_nationkey AS nation,
              year(o.o_orderdate) * 12 + month(o.o_orderdate) AS m,
              CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2),
          tr AS (SELECT nation, m, cents,
              CAST(count(*) OVER w13 AS BIGINT) AS n13,
              CAST(max(m) OVER w13 - min(m) OVER w13 AS BIGINT) AS span13,
              CAST(sum(cents) OVER w13 + sum(cents) OVER w11 AS BIGINT)
                AS trend24
            FROM mon
            WINDOW w13 AS (PARTITION BY nation ORDER BY m
              ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING),
            w11 AS (PARTITION BY nation ORDER BY m
              ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)),
          full13 AS (SELECT *, 24 * cents - trend24 AS detr24
            FROM tr WHERE n13 = 13 AND span13 = 12),
          se AS (SELECT nation, m % 12 AS moy,
              CAST(sum(detr24) AS BIGINT) AS snum,
              CAST(count(*) AS BIGINT) AS sk
            FROM full13 GROUP BY 1, 2),
          r0 AS (SELECT f.nation, f.m, f.cents,
              CAST(f.cents AS DOUBLE) - CAST(f.trend24 AS DOUBLE) / 24.0
                - CAST(se.snum AS DOUBLE) / (24.0 * CAST(se.sk AS DOUBLE))
                AS resid
            FROM full13 f JOIN se
              ON f.nation = se.nation AND f.m % 12 = se.moy),
          mrk AS (SELECT *,
              row_number() OVER (PARTITION BY nation ORDER BY resid) AS rn,
              CAST(count(*) OVER (PARTITION BY nation) AS BIGINT) AS cnt
            FROM r0),
          med AS (SELECT nation,
              min(resid) + (max(resid) - min(resid)) * 0.5 AS med
            FROM mrk WHERE rn = (cnt + 1) // 2 OR rn = cnt // 2 + 1
            GROUP BY nation),
          d0 AS (SELECT r0.nation, r0.m, r0.cents, r0.resid,
              abs(r0.resid - med.med) AS adev
            FROM r0 JOIN med ON r0.nation = med.nation),
          drk AS (SELECT *,
              row_number() OVER (PARTITION BY nation ORDER BY adev) AS rn,
              CAST(count(*) OVER (PARTITION BY nation) AS BIGINT) AS cnt
            FROM d0),
          mad AS (SELECT nation,
              min(adev) + (max(adev) - min(adev)) * 0.5 AS mad
            FROM drk WHERE rn = (cnt + 1) // 2 OR rn = cnt // 2 + 1
            GROUP BY nation)
          SELECT d0.nation, CAST(d0.m AS INT) AS m, d0.cents,
            round(d0.resid, 4) AS residual, round(d0.adev, 4) AS deviation,
            round(mad.mad, 4) AS mad
          FROM d0 JOIN mad ON d0.nation = mad.nation
          WHERE d0.adev > $residMadK.0 * mad.mad + 0.5
          ORDER BY d0.nation, d0.m""",
    "q85_cohort_ltv" ->
      """WITH om AS (SELECT o_custkey,
              year(o_orderdate) * 12 + month(o_orderdate) AS m,
              CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders),
          co AS (SELECT o_custkey, CAST(min(m) AS BIGINT) AS cohort_m
            FROM om GROUP BY 1),
          sz AS (SELECT cohort_m, CAST(count(*) AS BIGINT) AS n_customers
            FROM co GROUP BY 1),
          cells AS (SELECT co.cohort_m, om.m - co.cohort_m AS age,
              CAST(sum(om.cents) AS BIGINT) AS cell_cents
            FROM om JOIN co ON om.o_custkey = co.o_custkey
            GROUP BY 1, 2),
          cum AS (SELECT cohort_m, age,
              CAST(sum(cell_cents) OVER (PARTITION BY cohort_m ORDER BY age
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                AS cum_cents
            FROM cells)
          SELECT CAST(c.cohort_m AS INT) AS cohort_m, CAST(c.age AS INT) AS age,
            s.n_customers,
            round(CAST(c.cum_cents AS DOUBLE) / CAST(s.n_customers AS DOUBLE), 4)
              AS ltv_cents
          FROM cum c JOIN sz s ON c.cohort_m = s.cohort_m
          ORDER BY cohort_m, age""",
    "q84_price_index" ->
      """WITH mon AS (SELECT l_partkey AS pk,
              year(l_shipdate) * 12 + month(l_shipdate) AS m,
              CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS ep,
              CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
            FROM lineitem GROUP BY 1, 2 HAVING sum(round(l_quantity)) > 0),
          j AS (SELECT cur.m AS m,
              CAST(round(CAST(cur.ep AS DOUBLE) * CAST(base.qty AS DOUBLE)
                / CAST(cur.qty AS DOUBLE), 4) AS DECIMAL(38,6)) AS num_term,
              base.ep AS den_term
            FROM mon cur JOIN mon base
              ON cur.pk = base.pk AND cur.m = base.m + 1)
          SELECT CAST(m AS INT) AS m, CAST(count(*) AS BIGINT) AS n_parts,
            round(CAST(sum(num_term) AS DOUBLE)
              / CAST(sum(den_term) AS DOUBLE), 4) AS laspeyres
          FROM j GROUP BY m ORDER BY m""",
    "q81_segment_migration" ->
      s"""WITH d AS (SELECT o_custkey,
              date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                AS day,
              CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders),
          md AS (SELECT CAST((min(day) + max(day)) // 2 AS BIGINT) AS mid
            FROM d),
          h AS (SELECT o_custkey, day <= mid AS first_half,
              CAST(sum(cents) AS BIGINT) AS c
            FROM d CROSS JOIN md GROUP BY 1, 2),
          b AS (SELECT o_custkey, first_half,
              CAST($migBands * (row_number() OVER (PARTITION BY first_half
                  ORDER BY c, o_custkey) - 1)
                // count(*) OVER (PARTITION BY first_half) AS INT) + 1 AS band
            FROM h),
          h1 AS (SELECT o_custkey, band AS band_from FROM b WHERE first_half),
          h2 AS (SELECT o_custkey, band AS band_to FROM b WHERE NOT first_half)
          SELECT COALESCE(band_from, 0) AS band_from,
            COALESCE(band_to, 0) AS band_to,
            CAST(count(*) AS BIGINT) AS n_customers
          FROM h1 FULL OUTER JOIN h2 USING (o_custkey)
          GROUP BY 1, 2 ORDER BY 1, 2""",
    "q82_lorenz_deciles" ->
      """WITH per AS (SELECT o_custkey,
              CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                AS c
            FROM orders GROUP BY 1),
          r AS (SELECT c,
              CAST(10 * (row_number() OVER (ORDER BY c, o_custkey) - 1)
                // count(*) OVER () AS INT) + 1 AS decile
            FROM per),
          dec AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
              CAST(sum(c) AS BIGINT) AS decile_cents
            FROM r GROUP BY 1)
          SELECT decile, n_customers, decile_cents,
            round(CAST(sum(decile_cents) OVER (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
              / CAST(sum(decile_cents) OVER () AS DOUBLE), 4) AS cum_share
          FROM dec ORDER BY decile""",
    "q79_hhi" ->
      """WITH sp AS (SELECT s.s_nationkey AS nation, l.l_suppkey,
              CAST(sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
                * 100) AS BIGINT)) AS BIGINT) AS c
            FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
            GROUP BY 1, 2)
          SELECT nation, CAST(count(*) AS BIGINT) AS n_suppliers,
            CAST(sum(c) AS BIGINT) AS total_cents,
            round(CAST(sum(CAST(c AS HUGEINT) * c) AS DOUBLE) /
              (CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE)), 4) AS hhi,
            round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 4)
              AS top_share
          FROM sp GROUP BY 1 ORDER BY 1""",
    "q80_seasonal_decompose" -> q80OracleSql,
    "q101_seasonal_strength" ->
      s"""WITH q80 AS ($q80OracleSql),
          sn AS (SELECT nation,
              CAST(round(trend * 1e4) AS BIGINT) AS tq,
              CAST(round(seasonal * 1e4) AS BIGINT) AS sq,
              CAST(round(residual * 1e4) AS BIGINT) AS rq
            FROM q80),
          m AS (SELECT nation, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(rq) AS HUGEINT) AS s_r,
              sum(CAST(rq AS HUGEINT) * rq) AS q_r,
              CAST(sum(sq + rq) AS HUGEINT) AS s_sr,
              sum(CAST(sq + rq AS HUGEINT) * (sq + rq)) AS q_sr,
              CAST(sum(tq + rq) AS HUGEINT) AS s_tr,
              sum(CAST(tq + rq AS HUGEINT) * (tq + rq)) AS q_tr
            FROM sn GROUP BY nation)
          SELECT nation, n AS n_months,
            round(greatest(0.0, 1.0 -
              (CAST(n AS DOUBLE) * CAST(q_r AS DOUBLE)
                - CAST(s_r AS DOUBLE) * CAST(s_r AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(q_tr AS DOUBLE)
                - CAST(s_tr AS DOUBLE) * CAST(s_tr AS DOUBLE))), 4)
              AS trend_strength,
            round(greatest(0.0, 1.0 -
              (CAST(n AS DOUBLE) * CAST(q_r AS DOUBLE)
                - CAST(s_r AS DOUBLE) * CAST(s_r AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(q_sr AS DOUBLE)
                - CAST(s_sr AS DOUBLE) * CAST(s_sr AS DOUBLE))), 4)
              AS seasonal_strength
          FROM m ORDER BY nation""",

    "q66_skew_census" ->
      """WITH kc AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt
            FROM lineitem GROUP BY 1),
          st AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
              CAST(sum(cnt) AS BIGINT) AS n_rows,
              CAST(max(cnt) AS BIGINT) AS max_cnt FROM kc),
          tp AS (SELECT CAST(sum(cnt) AS BIGINT) AS top10 FROM (
              SELECT cnt FROM kc ORDER BY cnt DESC, l_partkey LIMIT 10))
          SELECT n_keys, n_rows, max_cnt,
            round(n_rows * 1.0 / n_keys, 4) AS avg_cnt,
            round((max_cnt * n_keys) * 1.0 / n_rows, 4) AS skew_ratio,
            round(top10 * 1.0 / n_rows, 4) AS top10_share
          FROM st CROSS JOIN tp""",
    "q63_abc" ->
      """WITH pp AS (SELECT l_partkey,
              CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS rev
            FROM lineitem GROUP BY 1),
          cen AS (SELECT rev, CAST(count(*) AS BIGINT) AS c
                  FROM pp GROUP BY 1),
          w AS (SELECT rev, c, rev * c AS bc,
              COALESCE(CAST(sum(rev * c) OVER (ORDER BY rev DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                AS BIGINT), 0) AS cum_start,
              CAST(sum(rev * c) OVER () AS BIGINT) AS total
            FROM cen)
          SELECT CASE WHEN 5 * cum_start < 4 * total THEN 'A'
                      WHEN 20 * cum_start < 19 * total THEN 'B'
                      ELSE 'C' END AS abc_class,
            CAST(sum(c) AS BIGINT) AS n_parts,
            CAST(sum(bc) AS BIGINT) AS class_cents,
            round(sum(bc) * 1.0 / max(total), 4) AS share
          FROM w GROUP BY 1 ORDER BY 1""",
    "q64_dup_invoices" ->
      """WITH o AS (SELECT o_custkey, o_orderkey,
              CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
              CAST(floor(epoch(o_orderdate)) AS BIGINT) AS sec
            FROM orders)
          SELECT a.o_custkey, a.o_orderkey AS order_a,
            b.o_orderkey AS order_b, a.cents AS cents_a, b.cents AS cents_b,
            abs(a.sec - b.sec) AS gap_s
          FROM o a JOIN o b ON a.o_custkey = b.o_custkey
            AND a.o_orderkey < b.o_orderkey
          WHERE abs(a.sec - b.sec) <= 2592000
            AND 100 * abs(a.cents - b.cents) <= 5 * a.cents
          ORDER BY 1, 2, 3""",
    "q61_benford" ->
      """WITH d AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice)
                AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
            FROM orders),
          g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n
                FROM d GROUP BY 1),
          t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM g)
          SELECT digit, n,
            round(n * 1.0 / (SELECT total FROM t), 4) AS obs_p,
            round(log10(1.0 + 1.0 / digit), 4) AS exp_p,
            round(round(n * 1.0 / (SELECT total FROM t), 4) -
              round(log10(1.0 + 1.0 / digit), 4), 4) AS dev
          FROM g ORDER BY digit""",
    "q62_interpurchase" ->
      """WITH p AS (SELECT user_id, ts, event_id,
              CAST(floor(epoch(ts)) AS BIGINT) AS sec
            FROM events WHERE event_type = 'purchase'),
          g AS (SELECT user_id, sec - lag(sec) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS gap_s FROM p)
          SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
            CAST(min(gap_s) AS BIGINT) AS min_gap_s,
            CAST(max(gap_s) AS BIGINT) AS max_gap_s,
            round(avg(gap_s), 4) AS avg_gap_s
          FROM g WHERE gap_s IS NOT NULL
          GROUP BY user_id ORDER BY user_id""",
    "q59_weighted_quartiles" ->
      """WITH cen AS (SELECT l_returnflag AS flag,
              CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
              CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS w
            FROM lineitem GROUP BY 1, 2),
          c AS (SELECT flag, cents, w,
              CAST(sum(w) OVER (PARTITION BY flag ORDER BY cents
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cumw,
              CAST(sum(w) OVER (PARTITION BY flag) AS BIGINT) AS tot
            FROM cen)
          SELECT flag,
            min(CASE WHEN 4 * cumw >= tot THEN cents END) AS wp25,
            min(CASE WHEN 2 * cumw >= tot THEN cents END) AS wp50,
            min(CASE WHEN 4 * cumw >= 3 * tot THEN cents END) AS wp75,
            max(tot) AS total_weight
          FROM c GROUP BY flag ORDER BY flag""",
    "q60_gini_spend" ->
      """WITH spend AS (SELECT o.o_custkey, n.n_name AS nation,
              CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS cents
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2),
          cen AS (SELECT nation, cents, CAST(count(*) AS BIGINT) AS c
                  FROM spend GROUP BY 1, 2),
          w AS (SELECT nation, cents, c,
              COALESCE(CAST(sum(c) OVER (PARTITION BY nation ORDER BY cents
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                AS BIGINT), 0) AS p
            FROM cen),
          g AS (SELECT nation, CAST(sum(c) AS BIGINT) AS n,
              CAST(sum(cents * c) AS BIGINT) AS sx,
              CAST(sum(cents * (c * p + (c * (c + 1)) // 2)) AS BIGINT) AS rs
            FROM w GROUP BY nation)
          SELECT nation, n AS n_customers, sx AS total_cents,
            round(2.0 * CAST(rs AS DOUBLE) / CAST(n * sx AS DOUBLE)
              - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE), 4) AS gini
          FROM g WHERE sx > 0 ORDER BY nation""",
    "q58_assoc_rules" ->
      s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
          n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_ord
                FROM li),
          item AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS sup
                   FROM li GROUP BY 1),
          pair AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb,
              CAST(count(*) AS BIGINT) AS sup_ab
            FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
              AND a.l_partkey <> b.l_partkey
            GROUP BY 1, 2 HAVING count(*) >= $ruleMinSupport)
          SELECT pa, pb, sup_ab,
            round(CAST(sup_ab AS DOUBLE) / CAST(ia.sup AS DOUBLE), 4)
              AS confidence,
            round(CAST(sup_ab * n.n_ord AS DOUBLE) /
              CAST(ia.sup * ib.sup AS DOUBLE), 4) AS lift
          FROM pair JOIN item ia ON pa = ia.l_partkey
                    JOIN item ib ON pb = ib.l_partkey
                    CROSS JOIN n
          WHERE 10 * sup_ab >= ia.sup
          ORDER BY lift DESC, pa, pb LIMIT 20""",
    "q57_cusum" ->
      """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
              CAST(count(*) AS BIGINT) AS x
            FROM events GROUP BY 1),
          o AS (SELECT day, x,
              CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
              CAST(sum(x) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum,
              CAST(count(*) OVER () AS BIGINT) AS n,
              CAST(sum(x) OVER () AS BIGINT) AS total
            FROM d),
          f AS (SELECT day, x, n * cum - t * total AS dev, total FROM o)
          SELECT day, x,
            round(CAST(dev AS DOUBLE) / CAST(total AS DOUBLE), 4)
              AS cusum_norm
          FROM f WHERE 10 * abs(dev) >= total ORDER BY day""",
    "q56_decile_lift" ->
      s"""WITH j AS (SELECT d.n_chars AS score,
              CASE WHEN e.label >= $aucPosCut THEN 1 ELSE 0 END AS pos
            FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
          g0 AS (SELECT score, CAST(count(*) AS BIGINT) AS n_tot,
              CAST(sum(pos) AS BIGINT) AS n_pos
            FROM j GROUP BY score),
          g AS (SELECT score, n_tot, n_pos,
              COALESCE(CAST(sum(n_tot) OVER (ORDER BY score DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                AS BIGINT), 0) AS cum_before,
              CAST(sum(n_tot) OVER () AS BIGINT) AS total,
              CAST(sum(n_pos) OVER () AS BIGINT) AS total_pos
            FROM g0),
          d AS (SELECT CAST(1 + (10 * cum_before) // total AS INT) AS decile,
              n_tot, n_pos, total, total_pos FROM g),
          per AS (SELECT decile, CAST(sum(n_tot) AS BIGINT) AS n,
              CAST(sum(n_pos) AS BIGINT) AS n_pos,
              max(total) AS total, max(total_pos) AS total_pos
            FROM d GROUP BY decile),
          c AS (SELECT decile, n, n_pos, total, total_pos,
              CAST(sum(n) OVER (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_n,
              CAST(sum(n_pos) OVER (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_pos
            FROM per)
          SELECT decile, n, n_pos, cum_pos,
            round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 4) AS pos_rate,
            round(CAST(cum_pos * total AS DOUBLE) /
              CAST(cum_n * total_pos AS DOUBLE), 4) AS cum_lift
          FROM c ORDER BY decile""",
    "q55_rfm" ->
      """WITH c AS (SELECT o_custkey,
              CAST(count(*) AS BIGINT) AS f,
              CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS m,
              date_diff('day', CAST(max(o_orderdate) AS DATE),
                (SELECT CAST(max(o_orderdate) AS DATE) FROM orders)) AS r
            FROM orders GROUP BY 1),
          b AS (SELECT
              quantile_cont(CAST(f AS DOUBLE), [0.2, 0.4, 0.6, 0.8]) AS bf,
              quantile_cont(CAST(m AS DOUBLE), [0.2, 0.4, 0.6, 0.8]) AS bm,
              quantile_cont(CAST(r AS DOUBLE), [0.2, 0.4, 0.6, 0.8]) AS br
            FROM c),
          s AS (SELECT
              CASE WHEN CAST(r AS DOUBLE) <= br[1] THEN 5
                   WHEN CAST(r AS DOUBLE) <= br[2] THEN 4
                   WHEN CAST(r AS DOUBLE) <= br[3] THEN 3
                   WHEN CAST(r AS DOUBLE) <= br[4] THEN 2 ELSE 1 END AS r_score,
              CASE WHEN CAST(f AS DOUBLE) <= bf[1] THEN 1
                   WHEN CAST(f AS DOUBLE) <= bf[2] THEN 2
                   WHEN CAST(f AS DOUBLE) <= bf[3] THEN 3
                   WHEN CAST(f AS DOUBLE) <= bf[4] THEN 4 ELSE 5 END AS f_score,
              CASE WHEN CAST(m AS DOUBLE) <= bm[1] THEN 1
                   WHEN CAST(m AS DOUBLE) <= bm[2] THEN 2
                   WHEN CAST(m AS DOUBLE) <= bm[3] THEN 3
                   WHEN CAST(m AS DOUBLE) <= bm[4] THEN 4 ELSE 5 END AS m_score,
              m
            FROM c, b)
          SELECT r_score, f_score, m_score,
            CAST(count(*) AS BIGINT) AS n_customers,
            CAST(sum(m) AS BIGINT) AS sum_cents,
            CAST(sum(m) // count(*) AS BIGINT) AS avg_cents
          FROM s GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "q54_seasonal_anomaly" ->
      """WITH h AS (SELECT date_trunc('hour', ts) AS hr_ts,
              CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1),
          sl AS (SELECT hr_ts, cnt, CAST(dayofweek(hr_ts) AS INT) AS dow,
              CAST(hour(hr_ts) AS INT) AS hr FROM h),
          se AS (SELECT dow, hr, CAST(sum(cnt) AS BIGINT) AS total,
              CAST(count(*) AS BIGINT) AS n_hours
            FROM sl GROUP BY dow, hr)
          SELECT sl.hr_ts, sl.dow, sl.hr, sl.cnt,
            round(CAST(sl.cnt * se.n_hours AS DOUBLE) /
              CAST(se.total AS DOUBLE), 4) AS ratio
          FROM sl JOIN se USING (dow, hr)
          WHERE 2 * sl.cnt * se.n_hours >= 3 * se.total
          ORDER BY sl.hr_ts""",
    "q52_auc" ->
      s"""WITH j AS (SELECT d.n_chars AS score,
              CASE WHEN e.label >= $aucPosCut THEN 1 ELSE 0 END AS pos
            FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
          g AS (SELECT score, CAST(count(*) AS BIGINT) AS n_tot,
              CAST(sum(pos) AS BIGINT) AS n_pos
            FROM j GROUP BY score),
          c AS (SELECT score, n_tot, n_pos,
              COALESCE(CAST(sum(n_tot) OVER (ORDER BY score
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                AS BIGINT), 0) AS cum_before
            FROM g),
          a AS (SELECT CAST(sum(n_pos) AS BIGINT) AS np,
              CAST(sum(n_tot) - sum(n_pos) AS BIGINT) AS nn,
              CAST(sum(n_pos * (2 * cum_before + n_tot + 1)) AS BIGINT) AS s2
            FROM c)
          SELECT np AS n_pos, nn AS n_neg,
            CASE WHEN np * nn = 0 THEN NULL
              ELSE round(CAST(s2 - np * (np + 1) AS DOUBLE) /
                CAST(2 * np * nn AS DOUBLE), 4) END AS auc
          FROM a""",
    "q53_skyline" ->
      """WITH p AS (SELECT p_partkey, p_size,
            CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents
          FROM part)
          SELECT p_partkey, price_cents, p_size FROM p a
          WHERE NOT EXISTS (SELECT 1 FROM p b
            WHERE b.price_cents <= a.price_cents AND b.p_size >= a.p_size
              AND (b.price_cents < a.price_cents OR b.p_size > a.p_size))
          ORDER BY price_cents, p_partkey""",
    "q51_incremental_rollup" ->
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q73_prorate" ->
      """WITH li AS (SELECT l_orderkey, l_linenumber,
              CAST(round(l_quantity) AS BIGINT) AS qty
            FROM lineitem),
          tq AS (SELECT l_orderkey, CAST(sum(qty) AS BIGINT) AS tot_qty
            FROM li GROUP BY 1),
          o AS (SELECT o_orderkey AS l_orderkey,
              CAST(floor(o_totalprice * 100) AS BIGINT) AS order_cents
            FROM orders),
          b AS (SELECT li.l_orderkey, li.l_linenumber, li.qty,
              (o.order_cents * li.qty) // tq.tot_qty AS base,
              (o.order_cents * li.qty) % tq.tot_qty AS frac,
              o.order_cents
            FROM li JOIN tq USING (l_orderkey) JOIN o USING (l_orderkey)),
          r AS (SELECT l_orderkey, l_linenumber, qty, base,
              order_cents - sum(base) OVER (PARTITION BY l_orderkey) AS leftover,
              row_number() OVER (PARTITION BY l_orderkey
                ORDER BY frac DESC, l_linenumber, qty) AS rk
            FROM b)
          SELECT l_orderkey, l_linenumber,
            CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
              AS alloc_cents
          FROM r ORDER BY l_orderkey, l_linenumber""",
    "q72_scd2_incremental" ->
      """WITH ch AS (SELECT user_id, event_id, ts AS valid_from,
              CAST(floor(value / 25) AS INT) AS tier
            FROM events WHERE event_type = 'purchase')
          SELECT user_id, event_id, valid_from,
            lead(valid_from) OVER (PARTITION BY user_id
              ORDER BY valid_from, event_id) AS valid_to, tier
          FROM ch ORDER BY user_id, valid_from, event_id""",
    "q46_scd2" ->
      """WITH ch AS (SELECT user_id, event_id, ts AS valid_from,
              CAST(floor(value / 25) AS INT) AS tier
            FROM events WHERE event_type = 'purchase'),
          dim AS (SELECT user_id, event_id, valid_from, tier,
              lead(valid_from) OVER (PARTITION BY user_id
                ORDER BY valid_from, event_id) AS valid_to
            FROM ch),
          act AS (SELECT user_id, ts FROM events
                  WHERE event_type <> 'purchase')
          SELECT d.user_id, d.event_id, d.valid_from, d.valid_to, d.tier,
            CAST(count(a.ts) AS BIGINT) AS n_activity
          FROM dim d LEFT JOIN act a ON a.user_id = d.user_id
            AND a.ts >= d.valid_from
            AND (d.valid_to IS NULL OR a.ts < d.valid_to)
          GROUP BY 1, 2, 3, 4, 5
          ORDER BY 1, 3, 2""",
    "q47_copurchase" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
          SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
            CAST(count(*) AS BIGINT) AS n_orders
          FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
            AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2
          ORDER BY n_orders DESC, part_a, part_b LIMIT 20""",
    "q48_transitions" ->
      """WITH s AS (SELECT user_id, event_type,
              lag(event_type) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS prev_type
            FROM events),
          c AS (SELECT prev_type, event_type AS next_type,
              CAST(count(*) AS BIGINT) AS n
            FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2)
          SELECT prev_type, next_type, n,
            round(CAST(n AS DOUBLE) /
              CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE), 4) AS p
          FROM c ORDER BY prev_type, next_type""",
    "q50_sole_returns" ->
      """WITH l1 AS (SELECT l_orderkey, l_suppkey FROM lineitem
            WHERE l_returnflag = 'R')
          SELECT s.s_suppkey, s.s_name,
            CAST(count(*) AS BIGINT) AS n_sole_returns
          FROM l1 JOIN supplier s ON s.s_suppkey = l1.l_suppkey
          WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
            AND NOT EXISTS (SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_returnflag = 'R')
          GROUP BY 1, 2
          ORDER BY n_sole_returns DESC, s_suppkey LIMIT 20""",
    "q49_trailing_dau" ->
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
            FROM events),
          days AS (SELECT DISTINCT day FROM du),
          x AS (SELECT CAST(unnest(generate_series(CAST(day AS TIMESTAMP),
                  CAST(day AS TIMESTAMP) + INTERVAL 6 DAY,
                  INTERVAL 1 DAY)) AS DATE) AS obs_day,
                user_id
            FROM du)
          SELECT x.obs_day, CAST(count(DISTINCT x.user_id) AS BIGINT) AS dau7
          FROM x JOIN days d ON x.obs_day = d.day
          GROUP BY 1 ORDER BY 1""")
}
