package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.CacheScope.ScopedPersist
import graft.sources.Tables

/** Advanced SQL surface (SURVEY.md §2.B D25): GROUPING SETS, correlated
  * scalar subqueries, RANGE-frame windows, and explicit skew-salted
  * joins. These close the gap between "the operators the reference's
  * test queries touch" and "the operators a user of a general engine
  * reaches for next" — each is a distinct Catalyst code path (grouping
  * expansion, subquery decorrelation, range frame evaluation, manual
  * salting vs AQE skew handling).
  *
  * Scale notes:
  *  - q24 grouping-set expansion happens MAP-SIDE before the partial
  *    aggregate, so the shuffle carries ≤ |groups|·|sets| rows, not
  *    |rows|·|sets|.
  *  - q25's correlated scalar subquery is decorrelated by Catalyst
  *    (RewriteCorrelatedScalarSubquery) into an aggregate + join on the
  *    correlation key — the hand-written equivalent of which is exactly
  *    what a 100 TB plan wants (no per-row re-execution).
  *  - q26's RANGE frame is evaluated with a sliding accumulator per
  *    partition key; the window key (o_custkey) is high-cardinality, so
  *    parallelism scales with the cluster (the q9 low-cardinality trap
  *    does not apply).
  *  - q27 demonstrates deterministic salting for skewed fact-fact
  *    joins: the probe side's hot keys are spread over `nsalts`
  *    sub-keys by a per-ROW hash (not a per-key hash — that would keep
  *    the hot key on one salt), and the build side is replicated
  *    `nsalts`×. Results are provably identical to the unsalted join
  *    (the oracle checks this); AQE's skew-join split is the automatic
  *    alternative when statistics detect the skew at runtime.
  */
object AdvancedSql {

  /** D25: GROUPING SETS — (priority, status), (priority), (status) in
    * one pass, disambiguated by grouping_id. */
  def q24GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupingSets(
        Seq(Seq($"o_orderpriority", $"o_orderstatus"),
          Seq($"o_orderpriority"), Seq($"o_orderstatus")),
        $"o_orderpriority", $"o_orderstatus")
      .agg(
        grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice"), 0).as("sum_price"))
      .select($"o_orderpriority", $"o_orderstatus", $"gid", $"n_orders", $"sum_price")
      .orderBy($"gid", $"o_orderpriority".asc_nulls_first, $"o_orderstatus".asc_nulls_first)
  }

  /** D25: correlated scalar subquery — customers above their nation's
    * average balance. Written as SQL so Catalyst's decorrelation rewrite
    * (subquery → aggregate ⋈ correlation key) is exercised; the
    * threshold is rounded to 4 dp in BOTH engines before the comparison
    * so FP summation order can never flip a row in or out. */
  def q25CorrSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("adv_customer")
    spark.sql(
      """SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS c_acctbal, nation_avg
        FROM (
          SELECT c_custkey, c_nationkey, c_acctbal,
            round((SELECT avg(c2.c_acctbal) FROM adv_customer c2
                   WHERE c2.c_nationkey = c1.c_nationkey), 4) AS nation_avg
          FROM adv_customer c1) t
        WHERE c_acctbal > nation_avg
        ORDER BY c_custkey""")
  }

  /** D25: RANGE-frame window — per customer, orders and spend in the
    * trailing 90 days (frame bounds in value space, not row space; all
    * same-day orders are peers and share one frame in both engines). */
  def q26RangeFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"day_num")
      .rangeBetween(-90, Window.currentRow)
    Tables.orders(spark, dir)
      .withColumn("day_num", datediff($"o_orderdate".cast("date"), lit("1992-01-01").cast("date")))
      .withColumn("n_90d", count(lit(1)).over(w))
      .withColumn("sum_90d", round(sum($"o_totalprice").over(w), 2))
      .select($"o_custkey", $"o_orderkey", $"day_num", $"n_90d", $"sum_90d")
      .orderBy($"o_custkey", $"day_num", $"o_orderkey")
  }

  /** Salt fan-out for q27. 8 spreads a hot key over 8 reducers at the
    * cost of an 8× build-side replication — the right trade when the
    * build side is small relative to the hot key's row count. */
  val nsalts = 8

  /** D25: skew-salted fact-fact join. Probe rows get a per-row salt
    * (crc32 of the full line identity mod nsalts); the build side is
    * replicated once per salt; the join key becomes (key, salt). The
    * merge hint pins a shuffle join so the salting is actually in the
    * plan (a broadcast of the replicated side would make it a no-op) —
    * checked in PlanSpec. */
  def q27SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_orderpriority")
      .withColumn("o_salt", explode(sequence(lit(0), lit(nsalts - 1))))
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice", $"l_discount")
      .withColumn("salt",
        pmod(crc32(concat_ws("-", $"l_orderkey", $"l_linenumber")), lit(nsalts)).cast("int"))
    li.hint("merge")
      .join(ord, $"l_orderkey" === $"o_orderkey" && $"salt" === $"o_salt")
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n_lines"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 0).as("revenue"))
      .orderBy($"o_orderpriority")
  }

  /** D25: EXISTS / NOT EXISTS predicate subqueries — customers with at
    * least one order over 150k and no completed ('F') order. Written as
    * SQL so Catalyst's RewritePredicateSubquery turns the two
    * correlated predicates into a left-semi and a left-anti join — the
    * decorrelated shape is two shuffle joins keyed on the correlation
    * key, which is exactly the 100 TB plan (no per-row subquery
    * re-execution); AdvancedSqlSpec asserts both joins appear and no
    * subquery survives to the physical plan. */
  def q28Exists(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("adv_customer")
    Tables.orders(spark, dir).createOrReplaceTempView("adv_orders")
    spark.sql(
      """SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS c_acctbal
        FROM adv_customer c
        WHERE EXISTS (SELECT 1 FROM adv_orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
          AND NOT EXISTS (SELECT 1 FROM adv_orders o2
                          WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
        ORDER BY c_custkey""")
  }

  /** D13-extension: distribution window functions — percent_rank,
    * cume_dist, ntile quartiles of each customer's orders by price.
    * Partitioned on o_custkey (high cardinality), so the per-partition
    * sorts parallelize with the cluster — deliberately NOT a 5-value
    * key like o_orderpriority, which would serialize into 5 tasks at
    * any scale (the q9 trap; q9's salted two-phase is the answer when
    * the key IS low-cardinality). Ties broken by o_orderkey in both
    * engines so rank fractions are deterministic. */
  def q29WindowDist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, dir)
      .withColumn("pct_rank", round(percent_rank().over(w), 4))
      .withColumn("cume_dist", round(cume_dist().over(w), 4))
      .withColumn("quartile", ntile(4).over(w))
      .filter($"o_custkey" < 20)
      .select($"o_custkey", $"o_orderkey", round($"o_totalprice", 2).as("o_totalprice"),
        $"pct_rank", $"cume_dist", $"quartile")
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** CDC upsert (the MERGE INTO shape) applied as a batch — the
    * dimension-maintenance step every warehouse load runs. The change
    * batch is derived deterministically from the fixture (every 10th
    * key updated, shifted keys inserted) so the oracle can rebuild it.
    *
    * Scale shape: a CDC batch is orders of magnitude smaller than the
    * base table, so BOTH sides of the merge broadcast the changes —
    * the update pass is a broadcast left join (base never shuffles)
    * and the insert pass is a broadcast anti join. A full-outer-join
    * merge would shuffle all 100 TB of base; this plan moves only the
    * changes. PlanSpec asserts the no-base-shuffle claim. */
  /** Generic broadcast-only MERGE: apply `changes` (same schema as
    * `base`) keyed on `key` — matched keys take every non-key column
    * from the change row, unmatched change rows append. The base side
    * NEVER shuffles: updates are a broadcast left join; the insert
    * residue anti-joins against the matched-key set, which is itself
    * computed with a broadcast SEMI join over base (map-side, output
    * ≤ |changes|) — the naive `changes ANTI base` would build on the
    * 100 TB side. Reused per micro-batch by the streaming CDC apply
    * (StreamingSpec). */
  def upsert(base: DataFrame, changes: DataFrame, key: String): DataFrame = {
    val payload = base.columns.filterNot(_ == key).toSeq
    val ch = changes.select(
      col(key) +: payload.map(c => col(c).as(s"__ch_$c")): _*)
    val merged = base.join(broadcast(ch), Seq(key), "left")
      .select(col(key) +:
        payload.map(c => coalesce(col(s"__ch_$c"), col(c)).as(c)): _*)
    val matched = base
      .join(broadcast(changes.select(col(key))), Seq(key), "left_semi")
      .select(col(key))
    val inserts = changes.join(broadcast(matched), Seq(key), "left_anti")
      .select(col(key) +: payload.map(col): _*)
    merged.unionByName(inserts)
  }

  def q30Upsert(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_nationkey", $"c_acctbal", $"c_mktsegment")
    val updates = base.filter($"c_custkey" % 10 === 0)
      .select($"c_custkey", $"c_nationkey",
        round($"c_acctbal" + 100.0, 2).as("c_acctbal"),
        lit("UPDATED").as("c_mktsegment"))
    val inserts = base.filter($"c_custkey" % 100 === 7)
      .select(($"c_custkey" + 1000000L).as("c_custkey"), $"c_nationkey",
        round($"c_acctbal", 2).as("c_acctbal"),
        lit("INSERTED").as("c_mktsegment"))
    upsert(base, updates.unionByName(inserts), "c_custkey")
      .select($"c_custkey", $"c_nationkey",
        round($"c_acctbal", 2).as("c_acctbal"), $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  /** D12-extension: approximate percentiles (quantile sketch — the
    * same mergeable-summary family as HLL). One pass, partial
    * aggregation, fixed-size state per group: the 100 TB shape for
    * quantiles, vs exact percentile's per-group sort. Like q8, no SQL
    * oracle (sketch internals are engine-specific); AdvancedSqlSpec
    * bounds the error vs the exact percentiles. */
  def q31ApproxPercentile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        round(percentile_approx($"l_extendedprice", lit(0.5), lit(10000)), 0)
          .as("p50_approx"),
        round(percentile_approx($"l_extendedprice", lit(0.95), lit(10000)), 0)
          .as("p95_approx"))
      .orderBy($"l_returnflag")
  }

  /** Robust outlier detection via median/MAD — the statistical data-
    * cleaning step (mean/stddev z-scores break under the very outliers
    * being hunted; median absolute deviation does not). Per user:
    * median of `value`, MAD = median(|v − med|), and the count of
    * events beyond 3·MAD.
    *
    * Scale shape: exact quantiles keyed on user_id — group count grows
    * WITH the data and per-group state is bounded by events-per-user,
    * so the ObjectHashAggregate percentile buffers stay small while
    * parallelism scales (the q31 sketch is the answer when a single
    * group is itself huge). The med/mad frames are user-cardinality —
    * NOT broadcastable at scale — so both joins stay co-partitioned
    * shuffle joins on user_id; all three shuffles share one key, and
    * AQE coalesces them onto one exchange layout. */
  def q35MadOutliers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).select($"user_id", $"value")
    val med = ev.groupBy($"user_id")
      .agg(percentile($"value", lit(0.5)).as("med"))
    val dev = ev.join(med, "user_id")
      .withColumn("adev", abs($"value" - $"med"))
    val mad = dev.groupBy($"user_id")
      .agg(percentile($"adev", lit(0.5)).as("mad"))
    dev.join(mad, "user_id")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        count(when($"adev" > lit(3.0) * $"mad", 1)).as("n_outliers"),
        round(max($"med"), 4).as("med"),
        round(max($"mad"), 4).as("mad"))
      .filter($"user_id" < 40)
      .orderBy($"user_id")
  }

  /** Decay per step and window depth for [[q36Ewma]]. The truncated
    * tail (0.8⁸ ≈ 0.17) is the standard trade for a FIXED-depth
    * window: the exact recursive EWMA needs a running-state fold
    * (c3's groupByKey shape), while 8 lags stay inside one windowed
    * projection with no custom state at all. */
  val ewmaAlpha = 0.8
  val ewmaDepth = 8

  /** Time-series feature engineering: truncated exponentially-weighted
    * moving average of each user's event values, Σ_{j<8} α^j·v_{n−j}
    * over the (ts, event_id) order. One window pass partitioned on
    * user_id (high cardinality — parallelism scales with users); the
    * 8 lag frames share a single sort. Weights are interpolated as
    * exact double literals into BOTH engines and summed left-to-right
    * so the FP result is bit-identical. */
  def q36Ewma(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val decayed = (0 until ewmaDepth).map {
      case 0 => $"value" * lit(1.0)
      case j => coalesce(lag($"value", j).over(w), lit(0.0)) *
        lit(math.pow(ewmaAlpha, j))
    }.reduceLeft(_ + _)
    Tables.events(spark, dir)
      .filter($"user_id" < 50)
      .select($"user_id", $"event_id", $"ts", $"value")
      .withColumn("ewma", round(decayed, 4))
      .select($"user_id", $"event_id", round($"value", 4).as("value"), $"ewma")
      .orderBy($"user_id", $"event_id")
  }

  /** 8-bit Morton (z-order) interleave of two bucketed keys — the
    * multi-dimensional clustering key: sorting a sink by zkey makes
    * file-level min/max ranges tight in BOTH dimensions at once, so
    * scans filtered on either column prune files (one-dimensional
    * sort keys only prune their own column). Bits are disjoint, so
    * the OR-fold is exact integer arithmetic replayed verbatim in the
    * oracle. */
  def zorder8(x: Column, y: Column): Column =
    (0 until 8).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduceLeft(_ bitwiseOR _)

  /** Z-order clustering demonstration over orders: bucket customer key
    * and order date to 8 bits each, interleave to a 16-bit zkey, and
    * report per z-range (top 4 bits) how tight the per-dimension
    * ranges are. A z-range covers a 64×64 tile of (custkey, day)
    * space — the oracle pins the exact interleave, and SinksSpec
    * writes a zkey-sorted sink and asserts both dimensions prune.
    * Pure map + one bounded (256-row) aggregate. */
  def q37Zorder(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val x = pmod($"o_custkey", lit(256L))
    val y = pmod(
      datediff($"o_orderdate".cast("date"), lit("1992-01-01").cast("date"))
        .cast("long"), lit(256L))
    Tables.orders(spark, dir)
      .select(x.as("xb"), y.as("yb"))
      .withColumn("zkey", zorder8($"xb", $"yb"))
      .withColumn("zrange", shiftright($"zkey", 12))
      .groupBy($"zrange")
      .agg(count(lit(1)).as("n_orders"),
        min($"xb").as("min_x"), max($"xb").as("max_x"),
        min($"yb").as("min_y"), max($"yb").as("max_y"))
      .orderBy($"zrange")
  }

  /** Profiled columns of `orders`: (name, profiled expression,
    * engine-stable string form for min/max). Doubles go through
    * DECIMAL(18,2) so both engines print the identical fixed-point
    * form; timestamps through DATE ('YYYY-MM-DD' in both). */
  private val profileSpecs: Seq[(String, Column, Column => Column)] = Seq(
    ("o_custkey", col("o_custkey"), (c: Column) => c.cast("string")),
    ("o_orderdate", col("o_orderdate").cast("date"), (c: Column) => c.cast("string")),
    ("o_orderkey", col("o_orderkey"), (c: Column) => c.cast("string")),
    ("o_orderpriority", col("o_orderpriority"), (c: Column) => c),
    ("o_orderstatus", col("o_orderstatus"), (c: Column) => c),
    ("o_totalprice", col("o_totalprice"),
      (c: Column) => c.cast("decimal(18,2)").cast("string")))

  /** Data-quality profiling — per column of `orders`: row count,
    * non-null count, exact distinct count, min and max (engine-stable
    * string form). The warehouse-maintenance primitive behind schema
    * drift alerts and ingest validation.
    *
    * Shape: the distinct counts are deliberately NOT in the same `agg`
    * as the rest — k distinct-aggregates in one agg plan as Catalyst's
    * Expand, replicating every row (k+1)× with a wide 4k-column buffer
    * (measured 3.4s at sf0.1). Instead: (1) counts/min/max run in one
    * Expand-free single-exchange pass; (2) distinct counts come from a
    * narrow unpivot — explode to (col-idx, injective string image),
    * groupBy both (map-side partial dedup), one distinct per group —
    * no Expand, no wide buffer (0.9s at sf0.1, row-identical). The
    * string image must identify exactly the values the typed column's
    * equality identifies: long/string/date casts are injective, and
    * the one double column is normalized with `+ 0.0` so -0.0 and 0.0
    * (equal as doubles, distinct as strings) collapse. The two tiny
    * results meet on a broadcast join keyed by column index. */
  def q39Profile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val specs = profileSpecs
    val ord = Tables.orders(spark, dir)
    val aggs = specs.zipWithIndex.flatMap { case ((_, c, f), i) =>
      Seq(count(c).as(s"nn_$i"), f(min(c)).as(s"mn_$i"), f(max(c)).as(s"mx_$i"))
    }
    val base = ord.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val pairs = ord.select(explode(array(specs.zipWithIndex.map {
      case ((n, c, _), i) =>
        val dv = if (n == "o_totalprice") (c + lit(0.0)).cast("string")
                 else c.cast("string")
        struct(lit(i).as("i"), dv.as("v"))
    }: _*)).as("p")).select($"p.i", $"p.v").filter($"v".isNotNull)
    val nd = pairs.groupBy($"i").agg(countDistinct($"v").as("ndv"))
    val pieces = specs.zipWithIndex.map { case ((n, _, _), i) =>
      struct(lit(n).as("column_name"), $"n_rows",
        col(s"nn_$i").as("n_nonnull"), lit(i).as("i"),
        col(s"mn_$i").as("min_s"), col(s"mx_$i").as("max_s"))
    }
    base.select(explode(array(pieces: _*)).as("p")).select($"p.*")
      .join(broadcast(nd), "i")
      .select($"column_name", $"n_rows", $"n_nonnull",
        $"ndv".as("n_distinct"), $"min_s", $"max_s")
      .orderBy($"column_name")
  }

  /** q42 histogram literals: fixed edges so the bucket arithmetic is
    * identical integer math in both engines (no data-dependent min/max
    * pass, no float-boundary ambiguity). */
  val histLo = 0.0
  val histWidth = 5000.0
  val histBuckets = 22

  /** D51: active-interval aggregation — "how many orders are open per
    * week", where an order's open interval is [o_orderdate,
    * max(l_shipdate)]. The classic interval-overlap count done WITHOUT
    * an inequality join, as a SWEEP LINE: each interval emits exactly
    * two delta rows (+1 at its start week, −1 one week past its end
    * week), a plain hash aggregation nets the deltas per week, and a
    * running sum over the calendar-week spine recovers the open count.
    * Replaces the per-interval covered-week explode (rows ×
    * interval-length, ~15× on this data — measured 3.4s → 1.1s at
    * sf0.1): shuffle volume is 2 rows per order regardless of interval
    * length, so decade-long intervals cost the same as one-week ones.
    * At 100 TB: one co-partitioned fact⋈fact join on the order key +
    * a 2-row Generate + one partial-aggregated shuffle of ≤ #weeks
    * rows. The final cumulative window runs over the week-level
    * aggregate only — bounded by the calendar span (hundreds of rows),
    * never by table size (t14 precedent). */
  def q40ActiveIntervals(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // pre-aggregate the fact side BEFORE the join: the partial max
    // shrinks lineitem to one row per order map-side, so the join
    // moves |orders| rows, not |lineitem|
    val lastShip = Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey").agg(max($"l_shipdate").as("end_ts"))
    // clamp: a malformed interval (ship before order) still covers its
    // start week instead of producing a negative span
    val span = Tables.orders(spark, dir)
      .join(lastShip, $"o_orderkey" === $"l_orderkey")
      .select(date_trunc("week", $"o_orderdate").as("w0"),
        greatest(date_trunc("week", $"o_orderdate"),
          date_trunc("week", $"end_ts")).as("w1"))
    val deltas = span.select(explode(array(
        struct($"w0".as("week_start"), lit(1L).as("d")),
        struct(($"w1" + expr("interval 7 days")).as("week_start"),
          lit(-1L).as("d"))
      )).as("e")).select($"e.week_start", $"e.d")
      .groupBy($"week_start").agg(sum($"d").as("d"))
    val spine = deltas
      .agg(min($"week_start").as("lo"), max($"week_start").as("hi"))
      .select(explode(sequence($"lo", $"hi",
        expr("interval 7 days"))).as("week_start"))
    spine.join(deltas, Seq("week_start"), "left")
      .withColumn("d", coalesce($"d", lit(0L)))
      .withColumn("n_open", sum($"d").over(
        Window.orderBy($"week_start")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .filter($"n_open" > 0)
      .select($"week_start", $"n_open")
      .orderBy($"week_start")
  }

  /** D52: declarative data-quality audit — one row per constraint with
    * its violation count: FK orphans (anti joins), duplicate keys,
    * nulls, range and cross-table ordering rules. Each check is a
    * single scan + aggregate (or one co-partitioned / anti join); the
    * union is of 1-row frames, so the audit costs exactly its
    * constituent scans. The FK anti joins are the runtime-bloom-filter
    * shape (D28) at deploy scale. */
  def q41QualityAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    def check(name: String, d: DataFrame): DataFrame =
      d.agg(count(lit(1)).cast("long").as("n_violations"))
        .select(lit(name).as("check_name"), $"n_violations")
    val checks = Seq(
      check("dup_orderkey",
        ord.groupBy($"o_orderkey").agg(count(lit(1)).as("c")).filter($"c" > 1)),
      check("fk_lineitem_orders",
        li.join(ord, li("l_orderkey") === ord("o_orderkey"), "left_anti")),
      check("fk_orders_customer",
        ord.join(Tables.customer(spark, dir),
          ord("o_custkey") === col("c_custkey"), "left_anti")),
      check("future_shipdate",
        li.as("l").join(ord.as("o"), $"l.l_orderkey" === $"o.o_orderkey")
          .filter($"l.l_shipdate" < $"o.o_orderdate")),
      check("neg_totalprice", ord.filter($"o_totalprice" <= 0)),
      check("null_props",
        Tables.events(spark, dir).filter($"props".isNull)),
      check("qty_range", li.filter($"l_quantity" < 1 || $"l_quantity" > 50)))
    checks.reduce(_ unionAll _).orderBy($"check_name")
  }

  /** D53: equi-width histogram of l_extendedprice — fixed edges, one
    * scan, one partial-aggregated shuffle of ≤ [[histBuckets]] rows.
    * The profiling companion to q38's exact percentiles (value-space
    * buckets vs rank-space cuts). */
  def q42Histogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val b = least(greatest(
        floor((col("l_extendedprice") - histLo) / histWidth), lit(0)),
      lit(histBuckets - 1)).cast("int")
    Tables.lineitem(spark, dir)
      .select(b.as("bucket_id"))
      .groupBy($"bucket_id")
      .agg(count(lit(1)).as("n"))
      .withColumn("lo_edge", lit(histLo) + $"bucket_id" * histWidth)
      .withColumn("hi_edge", $"lo_edge" + histWidth)
      .select($"bucket_id", $"lo_edge", $"hi_edge", $"n")
      .orderBy($"bucket_id")
  }

  /** q43 share threshold, in basis points of total revenue (integer so
    * the comparison is exact cross-engine: keep parts with
    * value_cents · 10⁴ > [[q43ShareBp]] · total_cents). */
  val q43ShareBp = 2L

  /** D58: global-threshold filter (TPC-H Q11 shape) — parts whose
    * revenue exceeds a fixed share of TOTAL revenue. The classic
    * scalar-subquery-in-HAVING pattern, kept fully declarative: one
    * partial-aggregated shuffle builds per-part revenue; the global
    * total is a second aggregate over that (already part-sized) frame,
    * broadcast back as a one-row cross join. Both consumers of the
    * per-part aggregate share the SAME shuffle exchange (ReuseExchange
    * — PlanSpec guards exactly one lineitem scan in the plan), so the
    * fact table is scanned once; an empty table yields an empty result
    * rather than a null-total failure. Revenue is integer cents
    * (floor(price·(1−disc)·100)), so per-part sums, the total and the
    * share comparison are all exact integer arithmetic —
    * threshold-boundary membership cannot flip on float summation
    * order. */
  def q43ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perPart = Tables.lineitem(spark, dir)
      .select($"l_partkey",
        floor($"l_extendedprice" * (lit(1.0) - $"l_discount") * lit(100.0))
          .cast("long").as("cents"))
      .groupBy($"l_partkey")
      .agg(sum($"cents").as("value_cents"))
    val total = perPart.agg(sum($"value_cents").as("total_cents"))
    perPart.join(broadcast(total))
      .filter($"value_cents" * lit(10000L) > lit(q43ShareBp) * $"total_cents")
      .select($"l_partkey", $"value_cents")
      .orderBy($"value_cents".desc, $"l_partkey")
  }

  /** Buffering-free EXACT global percentiles — q38's two-phase shape,
    * ungrouped: (1) one map-side-combined histogram shuffle whose
    * output is bounded by the VALUE RANGE, not the row count; driver
    * cumulation locates each needed order statistic's bucket; (2) a
    * broadcast-semi-join refinement ranks only inside the few target
    * buckets. Interpolation is bit-identical to the buffering
    * `percentile` / DuckDB `quantile_cont` (guarded in
    * AdvancedSqlSpec), so callers can swap this in with no hash
    * change. Never materializes the value set anywhere. */
  private[graft] def exactPercentiles(vals: DataFrame, ps: Seq[Double],
      width: Double = 64.0): Seq[Double] = {
    import vals.sparkSession.implicits._
    val hist = vals
      .groupBy(floor($"v" / width).cast("long").as("b"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = hist.map(_._2).sum
    val positions = ps.flatMap { p =>
      val k = p * (n - 1).toDouble
      Seq(math.floor(k).toLong, math.ceil(k).toLong)
    }.distinct
    var cum = 0L
    val spans = hist.map { case (b, c) => val s = (b, cum, c); cum += c; s }
    val targets = positions.map { pos =>
      val (b, before, _) = spans
        .find { case (_, lo, c) => pos >= lo && pos < lo + c }.get
      (pos, b, pos - before)
    }
    val tDf = targets.toDF("pos", "b", "in_b")
    val wB = Window.partitionBy($"b").orderBy($"v")
    val picked = vals.withColumn("b", floor($"v" / width).cast("long"))
      .join(broadcast(tDf.select($"b").distinct()), Seq("b"), "left_semi")
      .withColumn("rk", (row_number().over(wB) - 1).cast("long"))
      .join(broadcast(tDf), Seq("b"), "inner")
      .filter($"rk" === $"in_b")
      .select($"pos", $"v")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ps.map { p =>
      val k = p * (n - 1).toDouble
      val lo = picked(math.floor(k).toLong)
      val hi = picked(math.ceil(k).toLong)
      lo + (k - math.floor(k)) * (hi - lo)
    }
  }

  /** D59: quantile binning (feature discretization) — bucket every
    * lineitem into its global price quartile and roll up per bin. The
    * quartile boundaries are EXACT percentiles collected to the driver
    * (3 doubles) and folded into the bucket CASE as literals — the
    * broadcast-boundaries shape. The boundary pre-pass is
    * [[exactPercentiles]] (q38's two-phase histogram+refinement, no
    * value buffering anywhere), so the pass scales with the value
    * RANGE, not the row count; interpolation is bit-identical to
    * `quantile_cont` (q22/q38 precedent), so bin membership is
    * deterministic cross-engine. */
  def q44QuantileBins(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val bs = exactPercentiles(
      li.select($"l_extendedprice".as("v")), Seq(0.25, 0.5, 0.75))
    val bucket = when($"l_extendedprice" <= bs(0), "p00_25")
      .when($"l_extendedprice" <= bs(1), "p25_50")
      .when($"l_extendedprice" <= bs(2), "p50_75")
      .otherwise("p75_100")
    li.groupBy(bucket.as("bin"))
      .agg(count(lit(1)).as("n"),
        round(sum($"l_extendedprice"), 0).as("sum_price"),
        min($"l_extendedprice").as("min_price"),
        max($"l_extendedprice").as("max_price"))
      .orderBy($"bin")
  }

  /** D60: weekly cohort retention — assign every user to the week of
    * their first event (cohort), then count how many of each cohort
    * were active 0, 1, 2, … weeks later. The canonical product-
    * analytics rollup, and a two-aggregate plan: first-activity per
    * user (partial-agg min), distinct (user, week) activity, one
    * co-partitioned join on user_id, then a count-distinct rollup per
    * (cohort, offset). Week offsets are integer day-diffs of
    * week-truncated timestamps ÷ 7 — exact in both engines. */
  def q45CohortRetention(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", date_trunc("week", $"ts").as("wk"))
    val cohort = ev.groupBy($"user_id").agg(min($"wk").as("cohort_week"))
    val active = ev.distinct()
    active.join(cohort, "user_id")
      .withColumn("week_offset",
        (datediff($"wk".cast("date"), $"cohort_week".cast("date")) / 7).cast("int"))
      .groupBy($"cohort_week", $"week_offset")
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"cohort_week", $"week_offset")
  }

  /** D275: drill-down ROLLUP with share-of-parent — the three-level
    * revenue hierarchy (grand total → year → quarter) every OLAP
    * report renders, with each row carrying its share of its PARENT
    * level (the drill-down percentage q24's raw grouping sets leave
    * to the reader). Levels come from ONE rollup aggregation; the
    * share join runs on the rolled frame, which is bounded by the
    * CALENDAR (#years + 4·#years + 1 rows), never by data.
    *
    * Exactness: revenue is exact integer cents at every level;
    * share-of-parent is ONE double division per row, 4-dp; absent
    * hierarchy slots print as −1 so the cross-engine hash never
    * touches null-ordering. */
  def q113Drilldown(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.orders(spark, dir).select(
      year(to_date($"o_orderdate")).as("y"),
      quarter(to_date($"o_orderdate")).as("q"),
      floor($"o_totalprice" * 100).cast("long").as("cents"))
    val g = base.rollup($"y", $"q")
      .agg(sum($"cents").as("cents"), grouping_id().as("gid"))
      .scopedPersist()
    val total = g.filter($"gid" === 3)
      .select($"cents".as("p_cents"))
    val years = g.filter($"gid" === 1)
      .crossJoin(broadcast(total))
      .select(lit("year").as("level"), $"y".as("year"),
        lit(-1).as("quarter"), $"cents".as("revenue_cents"),
        round($"cents".cast("double") / $"p_cents".cast("double"), 4)
          .as("share_of_parent"))
    val quarters = g.filter($"gid" === 0)
      .join(broadcast(g.filter($"gid" === 1)
        .select($"y".as("py"), $"cents".as("p_cents"))), $"y" === $"py")
      .select(lit("quarter").as("level"), $"y".as("year"),
        $"q".as("quarter"), $"cents".as("revenue_cents"),
        round($"cents".cast("double") / $"p_cents".cast("double"), 4)
          .as("share_of_parent"))
    val grand = g.filter($"gid" === 3)
      .select(lit("total").as("level"), lit(-1).as("year"),
        lit(-1).as("quarter"), $"cents".as("revenue_cents"),
        lit(1.0).as("share_of_parent"))
    grand.unionAll(years).unionAll(quarters)
      .orderBy($"level", $"year", $"quarter")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q113_drilldown" -> q113Drilldown,
    "q45_cohort_retention" -> q45CohortRetention,
    "q43_important_parts" -> q43ImportantParts,
    "q44_quantile_bins" -> q44QuantileBins,
    "q40_active_intervals" -> q40ActiveIntervals,
    "q41_quality_audit" -> q41QualityAudit,
    "q42_histogram" -> q42Histogram,
    "q39_profile" -> q39Profile,
    "q35_mad_outliers" -> q35MadOutliers,
    "q36_ewma" -> q36Ewma,
    "q37_zorder" -> q37Zorder,
    "q30_upsert" -> q30Upsert,
    "q31_approx_percentile" -> q31ApproxPercentile,
    "q24_grouping_sets" -> q24GroupingSets,
    "q25_corr_subquery" -> q25CorrSubquery,
    "q26_range_frame" -> q26RangeFrame,
    "q27_salted_join" -> q27SaltedJoin,
    "q28_exists" -> q28Exists,
    "q29_window_dist" -> q29WindowDist)

  /** Exact double literals of the EWMA weights (Double.toString is the
    * shortest string that round-trips, so DuckDB parses the identical
    * bit pattern). j = 0 is written `value * 1.0` in both engines. */
  private def ewmaTermsSql: String =
    (0 until ewmaDepth).map {
      case 0 => "value * 1.0"
      case j => s"coalesce(lag(value, $j) OVER w, 0.0) * ${math.pow(ewmaAlpha, j)}"
    }.mkString(" + ")

  /** SQL twin of [[zorder8]] — disjoint bits, so + replays the OR. */
  private def zorderSql(x: String, y: String): String =
    (0 until 8).map(i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")

  /** One UNION ALL branch of the q39 oracle per profiled column.
    * `strOf` mirrors the Spark side exactly: counts/distincts run on
    * the native value, only min/max go through the stable string form. */
  private def profileBranchSql(name: String, valueExpr: String,
      strOf: String => String = e => s"CAST($e AS VARCHAR)"): String =
    s"""SELECT '$name' AS column_name, count(*) AS n_rows,
        count($valueExpr) AS n_nonnull,
        count(DISTINCT $valueExpr) AS n_distinct,
        ${strOf(s"min($valueExpr)")} AS min_s,
        ${strOf(s"max($valueExpr)")} AS max_s FROM orders"""

  val oracle: Map[String, String] = Map(
    "q113_drilldown" ->
      """WITH b AS (SELECT year(CAST(o_orderdate AS DATE)) AS y,
              quarter(CAST(o_orderdate AS DATE)) AS q,
              CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders),
          g AS (SELECT y, q, CAST(sum(cents) AS BIGINT) AS cents,
              CAST(grouping(y) * 2 + grouping(q) AS INT) AS gid
            FROM b GROUP BY ROLLUP (y, q)),
          total AS (SELECT cents AS p_cents FROM g WHERE gid = 3),
          yr AS (SELECT 'year' AS level, g.y AS year, -1 AS quarter,
              g.cents AS revenue_cents,
              round(CAST(g.cents AS DOUBLE) / CAST(t.p_cents AS DOUBLE), 4)
                AS share_of_parent
            FROM g CROSS JOIN total t WHERE g.gid = 1),
          qt AS (SELECT 'quarter' AS level, g.y AS year, g.q AS quarter,
              g.cents AS revenue_cents,
              round(CAST(g.cents AS DOUBLE) / CAST(p.cents AS DOUBLE), 4)
                AS share_of_parent
            FROM g JOIN g p ON p.gid = 1 AND p.y = g.y WHERE g.gid = 0),
          gr AS (SELECT 'total' AS level, -1 AS year, -1 AS quarter,
              cents AS revenue_cents, 1.0 AS share_of_parent
            FROM g WHERE gid = 3)
          SELECT CAST(level AS VARCHAR) AS level, CAST(year AS INT) AS year,
            CAST(quarter AS INT) AS quarter, revenue_cents, share_of_parent
          FROM (SELECT * FROM gr UNION ALL SELECT * FROM yr
                UNION ALL SELECT * FROM qt)
          ORDER BY level, year, quarter""",
    "q45_cohort_retention" ->
      """WITH a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
            FROM events),
          c AS (SELECT user_id, min(wk) AS cohort_week FROM a GROUP BY user_id)
          SELECT CAST(c.cohort_week AS TIMESTAMP) AS cohort_week,
            CAST(date_diff('day', c.cohort_week, a.wk) // 7 AS INT) AS week_offset,
            CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
          FROM a JOIN c ON a.user_id = c.user_id
          GROUP BY 1, 2 ORDER BY cohort_week, week_offset""",
    "q43_important_parts" ->
      s"""WITH pp AS (SELECT l_partkey,
              CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0)
                AS BIGINT)) AS BIGINT) AS value_cents
            FROM lineitem GROUP BY l_partkey)
          SELECT l_partkey, value_cents FROM pp
          WHERE value_cents * 10000 >
            $q43ShareBp * (SELECT sum(value_cents) FROM pp)
          ORDER BY value_cents DESC, l_partkey""",
    "q44_quantile_bins" ->
      """WITH b AS (SELECT
              quantile_cont(l_extendedprice, 0.25) AS b1,
              quantile_cont(l_extendedprice, 0.50) AS b2,
              quantile_cont(l_extendedprice, 0.75) AS b3
            FROM lineitem)
          SELECT CASE WHEN l_extendedprice <= b1 THEN 'p00_25'
                      WHEN l_extendedprice <= b2 THEN 'p25_50'
                      WHEN l_extendedprice <= b3 THEN 'p50_75'
                      ELSE 'p75_100' END AS bin,
            CAST(count(*) AS BIGINT) AS n,
            round(sum(l_extendedprice), 0) AS sum_price,
            min(l_extendedprice) AS min_price,
            max(l_extendedprice) AS max_price
          FROM lineitem, b GROUP BY 1 ORDER BY bin""",
    "q40_active_intervals" ->
      """WITH span AS (SELECT o.o_orderkey, o.o_orderdate,
              max(l.l_shipdate) AS end_ts
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY 1, 2),
          wk AS (SELECT unnest(generate_series(
              date_trunc('week', o_orderdate),
              greatest(date_trunc('week', o_orderdate),
                       date_trunc('week', end_ts)),
              INTERVAL 7 DAY)) AS week_start FROM span)
          SELECT CAST(week_start AS TIMESTAMP) AS week_start,
            CAST(count(*) AS BIGINT) AS n_open
          FROM wk GROUP BY 1 ORDER BY 1""",
    "q41_quality_audit" ->
      """SELECT * FROM (
          SELECT 'dup_orderkey' AS check_name, CAST(count(*) AS BIGINT) AS n_violations
            FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)
          UNION ALL
          SELECT 'fk_lineitem_orders', CAST(count(*) AS BIGINT) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
          UNION ALL
          SELECT 'fk_orders_customer', CAST(count(*) AS BIGINT) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
          UNION ALL
          SELECT 'future_shipdate', CAST(count(*) AS BIGINT)
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_shipdate < o.o_orderdate
          UNION ALL
          SELECT 'neg_totalprice', CAST(count(*) AS BIGINT) FROM orders
            WHERE o_totalprice <= 0
          UNION ALL
          SELECT 'null_props', CAST(count(*) AS BIGINT) FROM events
            WHERE props IS NULL
          UNION ALL
          SELECT 'qty_range', CAST(count(*) AS BIGINT) FROM lineitem
            WHERE l_quantity < 1 OR l_quantity > 50
          ) ORDER BY check_name""",
    "q42_histogram" ->
      s"""SELECT bucket_id,
            CAST($histLo + bucket_id * $histWidth AS DOUBLE) AS lo_edge,
            CAST($histLo + bucket_id * $histWidth + $histWidth AS DOUBLE) AS hi_edge,
            CAST(count(*) AS BIGINT) AS n
          FROM (SELECT CAST(least(greatest(
              floor((l_extendedprice - $histLo) / $histWidth), 0),
              ${histBuckets - 1}) AS INT) AS bucket_id FROM lineitem)
          GROUP BY bucket_id ORDER BY bucket_id""",
    "q39_profile" ->
      (Seq(
        profileBranchSql("o_custkey", "o_custkey"),
        profileBranchSql("o_orderdate", "CAST(o_orderdate AS DATE)"),
        profileBranchSql("o_orderkey", "o_orderkey"),
        profileBranchSql("o_orderpriority", "o_orderpriority", e => e),
        profileBranchSql("o_orderstatus", "o_orderstatus", e => e),
        profileBranchSql("o_totalprice", "o_totalprice",
          e => s"CAST(CAST($e AS DECIMAL(18,2)) AS VARCHAR)"))
        .mkString("", " UNION ALL ", " ORDER BY column_name")),
    "q35_mad_outliers" ->
      """WITH med AS (SELECT user_id, quantile_cont(value, 0.5) AS med
                      FROM events GROUP BY user_id),
         dev AS (SELECT e.user_id, e.value, m.med, abs(e.value - m.med) AS adev
                 FROM events e JOIN med m USING (user_id)),
         mad AS (SELECT user_id, quantile_cont(adev, 0.5) AS mad
                 FROM dev GROUP BY user_id)
         SELECT d.user_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(*) FILTER (d.adev > 3.0 * m.mad) AS BIGINT) AS n_outliers,
           round(max(d.med), 4) AS med, round(max(m.mad), 4) AS mad
         FROM dev d JOIN mad m USING (user_id)
         WHERE d.user_id < 40
         GROUP BY d.user_id ORDER BY d.user_id""",
    "q36_ewma" ->
      s"""SELECT user_id, event_id, round(value, 4) AS value,
            round($ewmaTermsSql, 4) AS ewma
          FROM events WHERE user_id < 50
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
          ORDER BY user_id, event_id""",
    "q37_zorder" ->
      s"""WITH b AS (SELECT o_custkey % 256 AS xb,
              CAST(date_diff('day', DATE '1992-01-01',
                CAST(o_orderdate AS DATE)) AS BIGINT) % 256 AS yb
            FROM orders),
          z AS (SELECT xb, yb, ${zorderSql("xb", "yb")} AS zkey FROM b)
          SELECT zkey >> 12 AS zrange, CAST(count(*) AS BIGINT) AS n_orders,
            min(xb) AS min_x, max(xb) AS max_x,
            min(yb) AS min_y, max(yb) AS max_y
          FROM z GROUP BY 1 ORDER BY 1""",
    "q30_upsert" ->
      """WITH base AS (
           SELECT c_custkey, c_nationkey, c_acctbal, c_mktsegment FROM customer),
         changes AS (
           SELECT c_custkey, c_nationkey,
             round(c_acctbal + 100.0, 2) AS c_acctbal,
             'UPDATED' AS c_mktsegment
           FROM base WHERE c_custkey % 10 = 0
           UNION ALL
           SELECT c_custkey + 1000000, c_nationkey,
             round(c_acctbal, 2), 'INSERTED'
           FROM base WHERE c_custkey % 100 = 7)
         SELECT b.c_custkey,
           coalesce(ch.c_nationkey, b.c_nationkey) AS c_nationkey,
           round(coalesce(ch.c_acctbal, b.c_acctbal), 2) AS c_acctbal,
           coalesce(ch.c_mktsegment, b.c_mktsegment) AS c_mktsegment
         FROM base b LEFT JOIN changes ch USING (c_custkey)
         UNION ALL
         SELECT ch.c_custkey, ch.c_nationkey, ch.c_acctbal, ch.c_mktsegment
         FROM changes ch LEFT JOIN base b USING (c_custkey)
         WHERE b.c_custkey IS NULL
         ORDER BY c_custkey""",
    "q24_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus,
           CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 0) AS sum_price
         FROM orders
         GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                 (o_orderpriority), (o_orderstatus))
         ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""",
    "q25_corr_subquery" ->
      """SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS c_acctbal, nation_avg
         FROM (
           SELECT c_custkey, c_nationkey, c_acctbal,
             round((SELECT avg(c2.c_acctbal) FROM customer c2
                    WHERE c2.c_nationkey = c1.c_nationkey), 4) AS nation_avg
           FROM customer c1) t
         WHERE c_acctbal > nation_avg
         ORDER BY c_custkey""",
    "q26_range_frame" ->
      """SELECT o_custkey, o_orderkey, day_num,
           CAST(count(*) OVER w AS BIGINT) AS n_90d,
           round(sum(o_totalprice) OVER w, 2) AS sum_90d
         FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 CAST(date_diff('day', DATE '1992-01-01',
                   CAST(o_orderdate AS DATE)) AS INT) AS day_num
               FROM orders) t
         WINDOW w AS (PARTITION BY o_custkey ORDER BY day_num
           RANGE BETWEEN 90 PRECEDING AND CURRENT ROW)
         ORDER BY o_custkey, day_num, o_orderkey""",
    "q27_salted_join" ->
      """SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(l_extendedprice * (1.0 - l_discount)), 0) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q28_exists" ->
      """SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS c_acctbal
         FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
           AND NOT EXISTS (SELECT 1 FROM orders o2
                           WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
         ORDER BY c_custkey""",
    "q29_window_dist" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
           round(percent_rank() OVER w, 4) AS pct_rank,
           round(cume_dist() OVER w, 4) AS cume_dist,
           CAST(ntile(4) OVER w AS INT) AS quartile
         FROM orders
         WHERE o_custkey < 20
         WINDOW w AS (PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey)
         ORDER BY o_custkey, o_orderkey""")
}
