package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.CacheScope.ScopedPersist

/** Statistical-inference operators (SURVEY.md §2.B11, D119–D122):
  * Welch's two-sample t-test, chi-square independence, Theil–Sen
  * robust slope, and linear-interpolation series imputation — the
  * experiment-analysis / robust-trend toolkit a training-data or
  * product-analytics pipeline runs after the descriptive rollups.
  *
  * Float discipline (the q60/q63 census rules applied to inference):
  * every aggregate moment is an EXACT integer (cents, counts,
  * cents²); doubles appear only in the final closed-form statistic,
  * computed by an identical IEEE expression tree on both engines from
  * those identical integers, then rounded to the 4-dp grid. No
  * `pow()` anywhere (t19: `pow` is not reliably IEEE-identical
  * cross-engine) — squares are spelled `x*x`.
  */
object Stats {

  // ---------------------------------------------------------------- q67

  /** D119: Welch's unequal-variance two-sample t-test over a
    * deterministic 50/50 user split — the A/B-experiment readout.
    * Arms are assigned by the first hex digit of `md5(user_id)`
    * (the c5/t7 no-RNG gate: reproducible on any engine, no seed
    * state), the metric is purchase value in integer cents.
    *
    * One partial-aggregated pass produces the six exact moments
    * (n, Σx, Σx² per arm, conditional-sum form — no second scan, no
    * join); the t statistic, Welch–Satterthwaite df, and arm means
    * are driver-free closed forms over that one-row frame. Σx² of
    * cents stays far inside BIGINT at any SF the fixture ships;
    * Σx·Σx is formed in DOUBLE (q52's overflow rule: cast before
    * multiply).
    *
    * Scale shape: a single map-side-combined aggregate to ONE row —
    * the cheapest possible distributed query; nothing downstream of
    * the scan ever shuffles more than that row. */
  def q67WelchTtest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .select(
        when(substring(md5($"user_id".cast("string")), 1, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7"), lit("A"))
          .otherwise(lit("B")).as("arm"),
        floor($"value" * 100).cast("long").as("cents"))
    val m = ev.agg(
      sum(when($"arm" === "A", lit(1L)).otherwise(lit(0L))).as("n_a"),
      sum(when($"arm" === "A", $"cents").otherwise(lit(0L))).as("s1_a"),
      sum(when($"arm" === "A", $"cents" * $"cents").otherwise(lit(0L))).as("s2_a"),
      sum(when($"arm" === "B", lit(1L)).otherwise(lit(0L))).as("n_b"),
      sum(when($"arm" === "B", $"cents").otherwise(lit(0L))).as("s1_b"),
      sum(when($"arm" === "B", $"cents" * $"cents").otherwise(lit(0L))).as("s2_b"))
    // identical IEEE expression tree as the oracle: mean = s1/n,
    // var = (s2 − s1·s1/n) / (n−1), se2 = va/na + vb/nb,
    // t = (ma − mb)/sqrt(se2), df = se2² / (Σ (vi/ni)²/(ni−1))
    val d = "CAST(%s AS DOUBLE)"
    val va = s"((${d.format("s2_a")} - ${d.format("s1_a")} * ${d.format("s1_a")} / ${d.format("n_a")}) / ${d.format("n_a - 1")})"
    val vb = s"((${d.format("s2_b")} - ${d.format("s1_b")} * ${d.format("s1_b")} / ${d.format("n_b")}) / ${d.format("n_b - 1")})"
    val sea = s"($va / ${d.format("n_a")})"
    val seb = s"($vb / ${d.format("n_b")})"
    m.select(
      $"n_a", $"n_b",
      expr(s"round(${d.format("s1_a")} / ${d.format("n_a")} / 100.0, 4)").as("mean_a"),
      expr(s"round(${d.format("s1_b")} / ${d.format("n_b")} / 100.0, 4)").as("mean_b"),
      expr(s"round((${d.format("s1_a")} / ${d.format("n_a")} - ${d.format("s1_b")} / ${d.format("n_b")}) / sqrt($sea + $seb), 4)").as("t_stat"),
      expr(s"round(($sea + $seb) * ($sea + $seb) / ($sea * $sea / ${d.format("n_a - 1")} + $seb * $seb / ${d.format("n_b - 1")}), 4)").as("df"))
  }

  // ---------------------------------------------------------------- q68

  /** D120: chi-square test of independence between order status and
    * order priority — "does fulfillment state depend on priority?".
    * Output is the full contingency census: one row per (status,
    * priority) cell with observed n, expected count under
    * independence, and the cell's chi-square contribution; the
    * statistic is Σ contrib over the ≤ |status|·|priority| cells.
    *
    * Row/column/grand totals ride windows over the CELL CENSUS
    * (≤ 15 rows — bounded by attribute cardinality, the t14
    * bounded-global-window exemption), so the fact table is scanned
    * exactly once and partial-aggregates map-side. Expected counts
    * form row·col in DOUBLE (cast before multiply — at warehouse
    * scale BIGINT·BIGINT of two marginals overflows). */
  def q68Chi2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.orders(spark, dir)
      .groupBy($"o_orderstatus".as("status"), $"o_orderpriority".as("priority"))
      .agg(count(lit(1)).as("n"))
    val wr = Window.partitionBy($"status")
    val wc = Window.partitionBy($"priority")
    val wt = Window.partitionBy()
    cells
      .withColumn("row_n", sum($"n").over(wr))
      .withColumn("col_n", sum($"n").over(wc))
      .withColumn("tot", sum($"n").over(wt))
      .select(
        $"status", $"priority", $"n",
        round(expr("CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(tot AS DOUBLE)"), 4).as("expected"),
        round(expr("""(CAST(n AS DOUBLE) - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(tot AS DOUBLE))
            * (CAST(n AS DOUBLE) - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(tot AS DOUBLE))
            / (CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(tot AS DOUBLE))"""), 4)
          .as("contrib"))
      .orderBy($"status", $"priority")
  }

  // ---------------------------------------------------------------- q69

  /** Maximum day lag for a q69 slope pair — the windowed Theil–Sen
    * variant: slopes are only formed between observations ≤ this many
    * days apart, so pair fan-out is LINEAR in series length (n·lag),
    * not quadratic, and the estimator stays local in time. */
  val tsMaxLagDays = 60

  /** Shared (nation, day, cents) daily-revenue census for q69/q70 —
    * ONE co-partitioned orders⋈customer equi-join + partial agg. */
  private def dailyRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .groupBy($"c_nationkey".as("nation"),
        datediff(to_date($"o_orderdate"), lit("1970-01-01")).as("day"))
      .agg(sum(floor($"o_totalprice" * 100).cast("long")).as("cents"))
  }

  /** D121: windowed Theil–Sen robust trend — per nation, the median
    * pairwise slope of (day, daily revenue cents) over pairs at most
    * [[tsMaxLagDays]] days apart. Insensitive to ~29% outliers, the
    * robust companion to q65's Holt smoothing and p7's OLS.
    *
    * The pair stage is a self-equi-join of the DAILY census on nation
    * with the lag bound as a join filter: fan-out per series is
    * n·lag — LINEAR in series length (the unbounded C(n,2) variant
    * benched 239s at sf0.1; the lag bound is both the scale fix and a
    * standard estimator variant). The daily census itself is the only
    * corpus-sized aggregate.
    *
    * Median discipline: NO `percentile` aggregate (it buffers every
    * group value in one reducer — the measured bottleneck). Instead
    * the interpolated 0.5-quantile is spelled explicitly: row_number
    * + count windows over the slope frame pick the two middle
    * elements per nation, and the median is lo + (hi−lo)·0.5 — the
    * identical IEEE expression both engines evaluate on identical
    * doubles (slopes are Δcents/Δdays from exact integers). */
  def q69TheilSen(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = dailyRevenue(spark, dir)
    // banded pair join (the q20/D24 trick): d2 ∈ (d1, d1+lag] implies
    // band(d2) ∈ {band(d1), band(d1)+1} at band width = lag, so the
    // left side fans out ×2 on a band key and the join prunes ~97% of
    // same-nation candidates BEFORE the lag filter (nation-only join:
    // span² candidates/nation; banded: ~2·lag·span)
    val a = daily.select($"nation", $"day".as("d1"), $"cents".as("c1"),
      explode(array(expr(s"day div $tsMaxLagDays"),
        expr(s"day div $tsMaxLagDays + 1"))).as("bk"))
    val b = daily.select($"nation", $"day".as("d2"), $"cents".as("c2"),
      expr(s"day div $tsMaxLagDays").as("bk"))
    val slopes = a.join(b, Seq("nation", "bk"))
      .filter($"d1" < $"d2" && $"d2" - $"d1" <= tsMaxLagDays)
      .select($"nation",
        expr("CAST(c2 - c1 AS DOUBLE) / CAST(d2 - d1 AS DOUBLE)").as("slope"))
    val wRank = Window.partitionBy($"nation").orderBy($"slope")
    val wAll = Window.partitionBy($"nation")
    slopes
      .withColumn("rn", row_number().over(wRank))
      .withColumn("cnt", count(lit(1)).over(wAll))
      .filter($"rn" === expr("(cnt + 1) div 2") ||
        $"rn" === expr("cnt div 2 + 1"))
      .groupBy($"nation")
      .agg(max($"cnt").as("n_pairs"),
        round(expr("min(slope) + (max(slope) - min(slope)) * 0.5"), 4)
          .as("slope_cpd"))
      .orderBy($"nation")
  }

  // ---------------------------------------------------------------- q70

  /** D122: linear-interpolation imputation of a daily revenue series
    * — per nation, every calendar day between that nation's first and
    * last observed order day, with missing days filled by linear
    * interpolation between the surrounding observed days (the
    * time-series companion of q34's step gap-fill: q34 carries the
    * last value forward, q70 draws the line).
    *
    * The calendar explode is `sequence(min_day, max_day)` per nation
    * — Generate bounded by the date span, never by row count. The
    * bracketing observed points come from two IGNORE-NULLS RUNNING
    * window passes — the "next" bracket runs over day DESC, because a
    * `[currentRow, unboundedFollowing]` frame re-aggregates from
    * scratch per row in Spark (O(span²) per nation; measured 3.3s of
    * q70's original 9.7s — both directions as running frames are
    * O(span)). No self-join, no range join; the census is persisted
    * across its two consumptions (calendar bounds + join — the q43
    * no-second-scan discipline). Interpolated values are
    * `prev + (next−prev)·(d−dp)/(dn−dp)` in DOUBLE from exact
    * integers, 4-dp rounded; observed days reproduce their exact
    * census value. */
  def q70Interpolate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = dailyRevenue(spark, dir)
      .scopedPersist()
    val cal = daily.groupBy($"nation")
      .agg(min($"day").as("d0"), max($"day").as("d1"))
      .select($"nation", explode(sequence($"d0", $"d1")).as("day"))
    val joined = cal.join(daily, Seq("nation", "day"), "left")
    val wPrev = Window.partitionBy($"nation").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy($"nation").orderBy($"day".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined
      .withColumn("pc", last($"cents", ignoreNulls = true).over(wPrev))
      .withColumn("pd", last(when($"cents".isNotNull, $"day"), ignoreNulls = true).over(wPrev))
      .withColumn("nc", last($"cents", ignoreNulls = true).over(wNext))
      .withColumn("nd", last(when($"cents".isNotNull, $"day"), ignoreNulls = true).over(wNext))
      .select($"nation", $"day",
        round(when($"cents".isNotNull, $"cents".cast("double"))
          .otherwise(expr("""CAST(pc AS DOUBLE) + CAST(nc - pc AS DOUBLE)
              * (CAST(day - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE))""")), 4)
          .as("filled_cents"),
        $"cents".isNotNull.as("is_observed"))
      .orderBy($"nation", $"day")
  }

  // ---------------------------------------------------------------- q71

  /** D128: Spearman rank correlation between quantity and extended
    * price per return flag — the monotone-association companion of
    * q67/p7 (robust to any monotone transform, the standard screen
    * before fitting a parametric model).
    *
    * Ties use AVERAGE ranks, kept exact as DOUBLED ranks
    * `R = 2·rank_min + ties − 1` (an integer — no .5 floats anywhere);
    * the constant factor cancels in the correlation. Rho is the
    * Pearson of the rank vectors computed from six EXACT moments in
    * DECIMAL(38,0) (the p9/D111 overflow discipline: ΣR² terms pass
    * 2⁶³ at warehouse scale; DuckDB's HUGEINT plays the same role),
    * with ONE double conversion per closed-form term at the end —
    * identical IEEE tree both engines, 4-dp grid.
    *
    * Scale shape: two rank windows + two tie-census windows per
    * variable, all PARTITIONED BY the group key (one hash exchange,
    * in-partition sorts), then a partial-aggregated six-moment
    * rollup co-partitioned with the windows. No joins, no pair
    * stage. */
  def q71Spearman(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spearman(Tables.lineitem(spark, dir).select(
      $"l_returnflag".as("flag"),
      floor($"l_quantity" * 100).cast("long").as("qc"),
      floor($"l_extendedprice" * 100).cast("long").as("pc")))
  }

  /** Core Spearman pipeline over any (flag, qc, pc) frame — split out
    * so specs can drive synthetic monotone/anti-monotone corpora
    * through the exact prod path. */
  private[graft] def spearman(base: DataFrame): DataFrame = {
    import base.sparkSession.implicits._
    val rankQ = Window.partitionBy($"flag").orderBy($"qc")
    val tieQ = Window.partitionBy($"flag", $"qc")
    val rankP = Window.partitionBy($"flag").orderBy($"pc")
    val tieP = Window.partitionBy($"flag", $"pc")
    val ranked = base
      .withColumn("rx", lit(2L) * rank().over(rankQ) + count(lit(1)).over(tieQ) - 1L)
      .withColumn("ry", lit(2L) * rank().over(rankP) + count(lit(1)).over(tieP) - 1L)
      .select($"flag",
        $"rx".cast("decimal(38,0)").as("rx"), $"ry".cast("decimal(38,0)").as("ry"))
    ranked.groupBy($"flag")
      .agg(count(lit(1)).as("n"),
        sum($"rx").as("sx"), sum($"ry").as("sy"),
        sum($"rx" * $"ry").as("sxy"),
        sum($"rx" * $"rx").as("sxx"),
        sum($"ry" * $"ry").as("syy"))
      .select($"flag", $"n",
        round(
          expr("""CAST(n * sxy - sx * sy AS DOUBLE) /
            sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
                 CAST(n * syy - sy * sy AS DOUBLE))"""), 4).as("rho"))
      .orderBy($"flag")
  }

  // ---------------------------------------------------------------- q74

  /** D133: Mann–Kendall trend test — per nation, the nonparametric
    * "is this series trending?" readout over MONTHLY revenue, the
    * standard robust companion to q69's Theil–Sen slope (MK answers
    * "is there a trend", Theil–Sen answers "how steep").
    *
    *   S     = Σ_{i<j} sign(y_j − y_i)            (months ordered)
    *   VarS  = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18   (tie-corrected)
    *   Z     = (S∓1)/√VarS  (continuity-corrected; 0 when S = 0)
    *
    * Everything through S, the tie census, and the two polynomial
    * terms is EXACT integer arithmetic; doubles appear only in the
    * final /18 and the Z closed form, identical IEEE trees both
    * engines, 4-dp grid (the q67 discipline).
    *
    * Scale shape: the corpus-sized work is ONE co-partitioned
    * orders⋈customer join + partial-aggregated monthly census; the
    * pair stage is a self-join of that census — C(months, 2) per
    * nation, bounded by the CALENDAR (n·(n−1)/2 over ~84 months),
    * never by row count, so it is SF-independent (the q69 daily pair
    * stage needed the lag band; months don't). Tie and pair frames
    * co-partition on nation. */
  def q74MannKendall(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val monthly = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .groupBy($"c_nationkey".as("nation"),
        (year($"o_orderdate") * 12 + month($"o_orderdate")).as("m"))
      .agg(sum(floor($"o_totalprice" * 100).cast("long")).as("cents"))
      .scopedPersist()
    val s = monthly.as("a").join(monthly.as("b"),
        $"a.nation" === $"b.nation" && $"a.m" < $"b.m")
      .groupBy($"a.nation".as("nation"))
      .agg(sum(when($"b.cents" > $"a.cents", 1L)
        .when($"b.cents" < $"a.cents", -1L).otherwise(0L)).as("s_stat"))
    val ties = monthly.groupBy($"nation", $"cents")
      .agg(count(lit(1)).as("t"))
      .groupBy($"nation")
      .agg(sum($"t").as("n_m"),
        sum($"t" * ($"t" - 1L) * (lit(2L) * $"t" + 5L)).as("tie_term"))
    s.join(ties, "nation")
      .select($"nation", $"n_m".as("n_months"), $"s_stat",
        round(expr("""CAST(n_m * (n_m - 1) * (2 * n_m + 5) - tie_term
            AS DOUBLE) / 18.0"""), 4).as("var_s"),
        round(expr("""CASE WHEN s_stat = 0 OR n_m * (n_m - 1) * (2 * n_m + 5)
              - tie_term = 0 THEN 0.0
            WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
              / sqrt(CAST(n_m * (n_m - 1) * (2 * n_m + 5) - tie_term
                AS DOUBLE) / 18.0)
            ELSE CAST(s_stat + 1 AS DOUBLE)
              / sqrt(CAST(n_m * (n_m - 1) * (2 * n_m + 5) - tie_term
                AS DOUBLE) / 18.0) END"""), 4).as("z_stat"))
      .orderBy($"nation")
  }

  // ---------------------------------------------------------------- q75

  /** D134: PR-AUC — tie-grouped average precision + best-F1 operating
    * point for the q52 ranking task (score = document n_chars, positive
    * = embedding label ≥ aucPosCut). q52 grades the ranking by ROC;
    * under class imbalance the PR view is the one a retrieval/filter
    * pipeline actually tunes on, and the F1 row IS the threshold pick.
    *
    * Ties are handled at the SCORE-GROUP level (the q52/q71 rank
    * discipline): groups descend by score; after group g,
    * precision P_g = cumPos_g / cumTot_g and AP = Σ_g nPos_g·P_g / nPos.
    * All counts are exact integers; the AP summation runs as an
    * ORDERED running-frame window (score DESC), so the double
    * accumulation order is the same sequential fold on both engines —
    * no aggregate-order freedom (the e9/q70 running-frame argument).
    * Best-F1 maximizes F1_g = 2·cumPos_g/(cumTot_g + nPos) over
    * groups; ties break toward the HIGHER score (fewer kept rows).
    *
    * Scale shape: one corpus-sized equi-join + partial-aggregated
    * group-by score; every window runs over the SCORE-CARDINALITY
    * frame (bounded by the score's integer range — the t14 bounded-
    * global-window exemption q52 already relies on). */
  def q75PrAuc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = Tables.documents(spark, dir)
      .join(Tables.embeddings(spark, dir), $"vec_id" === $"doc_id")
      .select($"n_chars".as("score"),
        ($"label" >= Analytics.aucPosCut).cast("long").as("pos"))
      .groupBy($"score")
      .agg(count(lit(1)).as("n_tot"), sum($"pos").as("n_pos"))
      // consumed by BOTH the AP and best-F1 branches: persist so the
      // corpus join+agg runs once (the q43 no-second-scan discipline)
      .scopedPersist()
    val wCum = Window.orderBy($"score".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    val cum = g
      .withColumn("cum_tot", sum($"n_tot").over(wCum))
      .withColumn("cum_pos", sum($"n_pos").over(wCum))
      .withColumn("np", sum($"n_pos").over(wAll))
      .withColumn("nn", (sum($"n_tot").over(wAll) - $"np").cast("long"))
      .withColumn("term",
        expr("CAST(n_pos AS DOUBLE) * (CAST(cum_pos AS DOUBLE) / CAST(cum_tot AS DOUBLE))"))
      .withColumn("f1",
        expr("2.0 * CAST(cum_pos AS DOUBLE) / CAST(cum_tot + np AS DOUBLE)"))
    val ap = cum
      .withColumn("ap_sum", sum($"term").over(wCum))
      .withColumn("rn", row_number().over(Window.orderBy($"score")))
      .filter($"rn" === 1) // lowest score = final term of the DESC fold
      .select($"np".as("n_pos"), $"nn".as("n_neg"),
        round(expr("ap_sum / CAST(np AS DOUBLE)"), 4).as("ap"))
    val best = cum
      .withColumn("rn", row_number().over(Window.orderBy($"f1".desc, $"score".desc)))
      .filter($"rn" === 1)
      .select(round($"f1", 4).as("best_f1"), $"score".as("best_f1_score"))
    ap.crossJoin(best)
  }

  // ---------------------------------------------------------------- q76

  /** Arm predicate for the q76 two-sample split: urgent-ish orders
    * (priority 1/2) vs the rest. */
  private val ksArmASql = "o_orderpriority IN ('1-URGENT', '2-HIGH')"

  /** q76 prefix-bucket width in cents ($10k): the bucket census is
    * bounded by the VALUE RANGE / width, never by row count. */
  val ksBucketCents = 1000000L

  /** D135: two-sample Kolmogorov–Smirnov test — is the order-value
    * distribution of urgent-priority orders different from the rest?
    * D = max_v |F_A(v) − F_B(v)|, reported with the value where the
    * max is attained and the λ = D·√(nA·nB/(nA+nB)) normalization.
    *
    * Exactness: at each distinct value the CDF gap is the INTEGER
    * |cumA·nB − cumB·nA| over the common denominator nA·nB, so the
    * max is an integer max — no float comparison anywhere until the
    * final division (the q67 discipline; products ride DECIMAL(38,0),
    * the q71 overflow rule). Tie at the max breaks toward the
    * smallest value.
    *
    * Scale shape: the running CDFs do NOT use a global ordered window
    * (which single-partitions at corpus scale). Instead the q38
    * two-phase split: per-value arm counts partial-aggregate once;
    * values bucket by [[ksBucketCents]]; the BUCKET census (bounded by
    * value range) takes a global prefix window and broadcasts back as
    * per-bucket offsets; within-bucket running sums are windows
    * PARTITIONED BY bucket. The argmax is a TakeOrdered top-1, not a
    * global sort. */
  def q76KsTest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byV = Tables.orders(spark, dir)
      .select(expr(s"CASE WHEN $ksArmASql THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END").as("in_a"),
        floor($"o_totalprice" * 100).cast("long").as("cents"))
      .groupBy($"cents")
      .agg(sum($"in_a").as("ca"), (count(lit(1)) - sum($"in_a")).as("cb"))
      .withColumn("b", expr(s"cents div $ksBucketCents"))
    val bAgg = byV.groupBy($"b")
      .agg(sum($"ca").as("sa"), sum($"cb").as("sb"))
    val wPre = Window.orderBy($"b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bPre = bAgg // bucket census: bounded by value range (t14 exemption)
      .withColumn("off_a", coalesce(sum($"sa").over(wPre), lit(0L)))
      .withColumn("off_b", coalesce(sum($"sb").over(wPre), lit(0L)))
      .select($"b", $"off_a", $"off_b")
    val tot = bAgg.agg(sum($"sa").as("n_a"), sum($"sb").as("n_b"))
    val wIn = Window.partitionBy($"b").orderBy($"cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val top = byV
      .join(broadcast(bPre), "b")
      .withColumn("cum_a", $"off_a" + sum($"ca").over(wIn))
      .withColumn("cum_b", $"off_b" + sum($"cb").over(wIn))
      .crossJoin(broadcast(tot))
      .withColumn("gap", expr("""abs(CAST(cum_a AS DECIMAL(38,0)) * n_b
          - CAST(cum_b AS DECIMAL(38,0)) * n_a)"""))
      .orderBy($"gap".desc, $"cents")
      .limit(1)
    top.select($"n_a", $"n_b", $"cents".as("d_at_cents"),
      round(expr("CAST(gap AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))"), 4)
        .as("d_stat"),
      round(expr("""CAST(gap AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
          * sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
            / CAST(n_a + n_b AS DOUBLE))"""), 4).as("ks_lambda"))
  }

  // ---------------------------------------------------------------- q77

  /** Max ACF lag (days). */
  val acfMaxLag = 7

  /** D136: autocorrelation function — per nation, the ACF of the
    * ZERO-FILLED daily revenue series at lags 1..[[acfMaxLag]] days
    * (days with no orders are real zero-revenue days here, unlike
    * q70's interpolation view — documented series semantics). The
    * weekly-seasonality readout that motivates q54's day-of-week
    * profile: a spike at lag 7 = weekly cycle.
    *
    * Exactness (the q71 rank trick applied to moments): multiply the
    * centered series through by n, z_t = n·y_t − Σy — an exact
    * integer in DECIMAL(38,0) — so r_k = Σ z_t·z_{t−k} / Σ z_t² has
    * the n² factor cancel and EVERYTHING up to the final division is
    * exact integer arithmetic. One double division per (nation, lag),
    * 4-dp grid.
    *
    * Scale shape: the calendar explode is bounded by the date span
    * (q70); the lag products are `lag()` windows PARTITIONED BY
    * nation — one hash exchange + in-partition sort, no self-join;
    * both moment rollups partial-aggregate. */
  def q77Acf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = dailyRevenue(spark, dir)
      .scopedPersist()
    val cal = daily.groupBy($"nation")
      .agg(min($"day").as("d0"), max($"day").as("d1"))
      .select($"nation", explode(sequence($"d0", $"d1")).as("day"))
    val filled = cal.join(daily, Seq("nation", "day"), "left")
      .withColumn("y", coalesce($"cents", lit(0L)))
    val stats = filled.groupBy($"nation")
      .agg(count(lit(1)).as("n"), sum($"y").as("s"))
    val z = filled.join(stats, "nation")
      .withColumn("z",
        ($"n".cast("decimal(38,0)") * $"y" - $"s").cast("decimal(38,0)"))
    val w = Window.partitionBy($"nation").orderBy($"day")
    val withLags = z.select(
      Seq($"nation", $"z") ++
        (1 to acfMaxLag).map(k => lag($"z", k).over(w).as(s"z$k")): _*)
      .scopedPersist()
    val den = withLags.groupBy($"nation").agg(sum($"z" * $"z").as("den"))
    val nums = withLags
      .select($"nation", $"z",
        posexplode(array((1 to acfMaxLag).map(k => col(s"z$k")): _*))
          .as(Seq("pos", "zl")))
      .filter($"zl".isNotNull)
      .select($"nation", ($"pos" + 1).as("lag"), ($"z" * $"zl").as("prod"))
      .groupBy($"nation", $"lag").agg(sum($"prod").as("num"))
    nums.join(den, "nation")
      .select($"nation", $"lag",
        round(expr("CAST(num AS DOUBLE) / CAST(den AS DOUBLE)"), 4).as("acf"))
      .orderBy($"nation", $"lag")
  }

  // ---------------------------------------------------------------- q78

  /** Churn cutoff: a customer whose last order is more than this many
    * days before the corpus's max order date has churned (event); the
    * rest are right-censored at the corpus horizon. */
  val kmChurnDays = 365

  /** D137: Kaplan–Meier survival curve of customer lifetime — time
    * from first to last order for churned customers (the event),
    * right-censored at (horizon − first order) for still-active ones.
    * The standard churn/retention readout q45's cohort grid
    * approximates; KM handles censoring correctly.
    *
    *   S(t) = Π_{u ≤ t, d_u > 0} (1 − d_u / n_u)
    *
    * Float discipline: NO exp/ln cumulation (libm `ln` is not
    * guaranteed IEEE-identical cross-engine) — the survival product
    * is a SEQUENTIAL ascending-time fold of the exact per-step ratios
    * (IEEE multiply is correctly rounded, so two sequential folds of
    * identical doubles agree bit-for-bit): the oracle replays it as a
    * recursive CTE (the q65 recurrence idiom), and the engine folds
    * the collected risk table on the driver — legitimate because the
    * event-time grid is bounded by the CALENDAR (distinct lifetime
    * days), never by customer count (the q38 bounded-collect
    * exemption). Everything distributed — per-customer spans, the
    * event/censor census, at-risk running counts — is exact-integer
    * windows over that bounded grid.
    *
    * Output: one row per event time (d_t ≥ 1): t_days, n_risk,
    * n_events, n_censored (censored at exactly t_days; censor-only
    * times shrink later n_risk but emit no row — standard KM support),
    * survival 4-dp. Equal-time convention: events precede censoring,
    * so both count in that time's n_risk. */
  def q78KaplanMeier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val spans = Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(min(to_date($"o_orderdate")).as("first_d"),
        max(to_date($"o_orderdate")).as("last_d"))
    val horizon = spans.agg(max($"last_d").as("h"))
    val obs = spans.crossJoin(broadcast(horizon))
      .select(
        when(datediff($"h", $"last_d") > kmChurnDays,
          datediff($"last_d", $"first_d"))
          .otherwise(datediff($"h", $"first_d")).cast("long").as("t"),
        (datediff($"h", $"last_d") > kmChurnDays).cast("long").as("ev"))
    // bounded grid: one row per distinct observed time (calendar-bounded)
    val grid = obs.groupBy($"t")
      .agg(sum($"ev").as("d"), (count(lit(1)) - sum($"ev")).as("c"))
    val wPre = Window.orderBy($"t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy()
    val risk = grid
      .withColumn("n_risk",
        sum($"d" + $"c").over(wAll) -
          coalesce(sum($"d" + $"c").over(wPre), lit(0L)))
      .orderBy($"t")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // sequential ascending-time product fold (exact driver arithmetic
    // on the bounded grid; mirrors the oracle's recursive CTE order)
    var s = 1.0
    val out = risk.flatMap { case (t, d, c, n) =>
      if (d > 0) {
        s = s * (1.0 - d.toDouble / n.toDouble)
        Some((t, n, d, c,
          BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      } else None // censor-only times fold nothing; d=0 keeps s
    }
    out.toIndexedSeq
      .toDF("t_days", "n_risk", "n_events", "n_censored", "survival")
      .orderBy($"t_days")
  }

  // ---------------------------------------------------------------- q83

  /** D151: one-way ANOVA — does mean order value differ by day of
    * week? F = (SSB/(k−1)) / (SSW/(N−k)) plus the η² effect size,
    * the k-group generalization of q67's two-arm t-test.
    *
    * Moments (n, Σy, Σy²) per group are EXACT integers in
    * DECIMAL(38,0). SSB needs Σ_g S_g²/n_g — a sum of RATIONALS — so
    * it rides an ORDERED running frame over the ≤ 7-row group census
    * (dow order), making the double fold sequential and identical on
    * both engines (the q75 AP-fold argument); SST comes from the
    * exact global moments. One F and one η² division at the end,
    * 4-dp.
    *
    * Scale shape: one map-side-combined aggregate to ≤ 7 rows, then
    * arithmetic on that bounded census — nothing downstream of the
    * scan shuffles more. */
  def q83Anova(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = Tables.orders(spark, dir)
      .select((dayofweek($"o_orderdate") - 1).as("dow"), // 0=Sunday, both engines
        floor($"o_totalprice" * 100).cast("long").as("y"))
      .groupBy($"dow")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum($"y").cast("decimal(38,0)").as("s"),
        sum($"y".cast("decimal(38,0)") * $"y").as("q"))
    val wCum = Window.orderBy($"dow")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    g.withColumn("k", count(lit(1)).over(wAll))
      .withColumn("nn", sum($"n").over(wAll))
      .withColumn("ss", sum($"s").over(wAll))
      .withColumn("qq", sum($"q").over(wAll))
      .withColumn("ssb_run",
        sum(expr("CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)"))
          .over(wCum))
      .withColumn("rn", row_number().over(Window.orderBy($"dow".desc)))
      .filter($"rn" === 1) // last row of the dow-ordered fold
      .select($"k".cast("long").as("k_groups"), $"nn".cast("long").as("n"),
        round(expr("""((ssb_run - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)
              / CAST(nn AS DOUBLE)) / CAST(k - 1 AS DOUBLE)) /
            ((CAST(qq AS DOUBLE) - ssb_run) / CAST(nn - k AS DOUBLE))"""), 4)
          .as("f_stat"),
        round(expr("""(ssb_run - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)
              / CAST(nn AS DOUBLE)) /
            (CAST(qq AS DOUBLE) - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)
              / CAST(nn AS DOUBLE))"""), 4).as("eta_sq"))
  }

  // ---------------------------------------------------------------- q88

  /** D164: Wald–Wolfowitz runs test — per nation, is the daily-revenue
    * series randomly scattered around its median, or does it cluster
    * (momentum) / alternate (mean-reversion)? The randomness screen
    * that q74's monotone-trend test can't express.
    *
    * Days equal to the median drop (the classic dichotomization);
    * R = number of sign runs via the islands trick (sign ≠ previous
    * sign ⇒ run start — ONE lag window per nation, no sequential
    * scan); n₊, n₋, R are exact integers and E[R], Var[R], Z are one
    * fixed IEEE closed form each, 4-dp. The median uses the q69
    * row_number spelling over the calendar-bounded daily census.
    *
    * Scale shape: daily census (one partial-aggregated join), two
    * bounded per-nation window passes, a ≤|nations|-row rollup. */
  def q88RunsTest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = dailyRevenue(spark, dir)
      .scopedPersist()
    val wR = Window.partitionBy($"nation").orderBy($"cents", $"day")
    val wA = Window.partitionBy($"nation")
    val med = daily
      .withColumn("rn", row_number().over(wR))
      .withColumn("cnt", count(lit(1)).over(wA))
      .filter($"rn" === expr("(cnt + 1) div 2") ||
        $"rn" === expr("cnt div 2 + 1"))
      .groupBy($"nation")
      .agg(expr("min(cents) + (max(cents) - min(cents)) * 0.5").as("med"))
    val signed = daily.join(broadcast(med), "nation")
      .filter($"cents".cast("double") =!= $"med")
      .withColumn("sgn", ($"cents".cast("double") > $"med").cast("int"))
    val wSeq = Window.partitionBy($"nation").orderBy($"day")
    val runs = signed
      .withColumn("prev", lag($"sgn", 1).over(wSeq))
      .groupBy($"nation")
      .agg(sum($"sgn".cast("long")).as("n_pos"),
        (count(lit(1)) - sum($"sgn".cast("long"))).as("n_neg"),
        sum(when($"prev".isNull || $"prev" =!= $"sgn", 1L).otherwise(0L))
          .as("n_runs"))
    runs.select($"nation", $"n_pos", $"n_neg", $"n_runs",
      round(expr("""(CAST(n_runs AS DOUBLE) -
          (1.0 + 2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)
            / CAST(n_pos + n_neg AS DOUBLE))) /
        sqrt(2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)
          * (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)
            - CAST(n_pos + n_neg AS DOUBLE))
          / (CAST(n_pos + n_neg AS DOUBLE) * CAST(n_pos + n_neg AS DOUBLE)
            * CAST(n_pos + n_neg - 1 AS DOUBLE)))"""), 4).as("z_stat"))
      .orderBy($"nation")
  }

  // ---------------------------------------------------------------- q89

  /** D169: paired t-test on month-over-month revenue growth — per
    * nation, are consecutive-month revenue DIFFERENCES centered at
    * zero? The paired design removes the between-month level variance
    * that q67's two-sample form would drown in; contiguous months
    * only (a gap breaks the pair, the q80 span discipline).
    *
    * Differences come from ONE lag window per nation; their moments
    * (n, Σd, Σd²) are exact integers in DECIMAL(38,0); t = d̄/(s/√n)
    * and the mean difference are single IEEE closed forms, 4-dp (the
    * q67 discipline on the paired design). */
  def q89PairedTtest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val monthly = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .groupBy($"c_nationkey".as("nation"),
        (year($"o_orderdate") * 12 + month($"o_orderdate")).as("m"))
      .agg(sum(floor($"o_totalprice" * 100).cast("long")).as("cents"))
    val wSeq = Window.partitionBy($"nation").orderBy($"m")
    monthly
      .withColumn("pm", lag($"m", 1).over(wSeq))
      .withColumn("pc", lag($"cents", 1).over(wSeq))
      .filter($"pm".isNotNull && $"m" === $"pm" + 1)
      .withColumn("d", $"cents" - $"pc")
      .groupBy($"nation")
      .agg(count(lit(1)).as("n_pairs"),
        sum($"d".cast("decimal(38,0)")).as("sd"),
        sum($"d".cast("decimal(38,0)") * $"d").as("sdd"))
      .select($"nation", $"n_pairs",
        round(expr("CAST(sd AS DOUBLE) / CAST(n_pairs AS DOUBLE)"), 4)
          .as("mean_diff_cents"),
        round(expr("""(CAST(sd AS DOUBLE) / CAST(n_pairs AS DOUBLE)) /
            sqrt(((CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)
              / CAST(n_pairs AS DOUBLE)) / CAST(n_pairs - 1 AS DOUBLE))
              / CAST(n_pairs AS DOUBLE))"""), 4).as("t_stat"))
      .orderBy($"nation")
  }

  /** D172: offline revenue CHANGEPOINT — per nation, the single best
    * structural break of the monthly revenue series (binary
    * segmentation's first split): the boundary k minimizing
    * SSE_left(1..k) + SSE_right(k+1..T), reported with the segment
    * means and the residual SSE. The "when did this market shift"
    * question a trend audit asks before fitting anything fancier
    * (q54/q87 flag points; this finds the regime boundary).
    *
    * Determinism: monthly cents are exact longs (the q89 series);
    * prefix sums and totals are exact DECIMAL(38,0)/HUGEINT; each SSE
    * is ONE IEEE expression over those exact inputs (the p-family
    * shared-by-construction argument); the argmin ranks on
    * (cost, t) so bit-equal costs take the earliest split.
    *
    * Scale shape: one monthly-rollup shuffle of the orders scan
    * (map-side combined), then windows over high-cardinality nation
    * partitions whose length is bounded by months-per-nation — the
    * candidate-split frame is #nations × #months rows, never data-
    * sized. */
  def q90Changepoint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val monthly = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .groupBy($"c_nationkey".as("nation"),
        (year($"o_orderdate") * 12 + month($"o_orderdate")).as("m"))
      .agg(sum(floor($"o_totalprice" * 100).cast("long")).as("cents"))
    val wSeq = Window.partitionBy($"nation").orderBy($"m")
    val wCum = wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val t = monthly
      .withColumn("t", row_number().over(wSeq))
      .withColumn("cs", sum($"cents".cast("decimal(38,0)")).over(wCum))
      .withColumn("css",
        sum(($"cents".cast("decimal(38,0)") * $"cents")).over(wCum))
    val tot = monthly.groupBy($"nation").agg(
      count(lit(1)).as("tn"),
      sum($"cents".cast("decimal(38,0)")).as("ts"),
      sum(($"cents".cast("decimal(38,0)") * $"cents")).as("tss"))
    val cand = t.join(tot, "nation").filter($"t" < $"tn")
      .withColumn("sse_l", expr(
        """CAST(css AS DOUBLE)
           - CAST(cs AS DOUBLE) * CAST(cs AS DOUBLE) / CAST(t AS DOUBLE)"""))
      .withColumn("sse_r", expr(
        """(CAST(tss AS DOUBLE) - CAST(css AS DOUBLE))
           - (CAST(ts AS DOUBLE) - CAST(cs AS DOUBLE))
             * (CAST(ts AS DOUBLE) - CAST(cs AS DOUBLE))
             / CAST(tn - t AS DOUBLE)"""))
      .withColumn("cost", $"sse_l" + $"sse_r")
    val wRank = Window.partitionBy($"nation").orderBy($"cost".asc, $"t".asc)
    cand.withColumn("rk", row_number().over(wRank)).filter($"rk" === 1)
      .select($"nation", $"tn".as("n_months"), $"t".as("split_t"),
        $"m".as("split_m"),
        round(expr("CAST(cs AS DOUBLE) / CAST(t AS DOUBLE)"), 4)
          .as("mean_before_cents"),
        round(expr(
          """(CAST(ts AS DOUBLE) - CAST(cs AS DOUBLE))
             / CAST(tn - t AS DOUBLE)"""), 4).as("mean_after_cents"),
        // cost is cents^2-scale (~1e18): a 4-dp round is not even
        // representable and the two engines' scaling differs past
        // 2^53 — round to integer, where both return the double as-is
        round($"cost", 0).as("sse_total"))
      .orderBy($"nation")
  }

  // ---------------------------------------------------------------- q92

  /** D182: Mann–Whitney U rank-sum test over q67's A/B split — the
    * NONPARAMETRIC companion to the Welch t: "does one arm's purchase
    * value stochastically dominate the other", valid without any
    * normality assumption (the readout a metrics review trusts when
    * q66's skew census says the distribution is heavy-tailed).
    *
    *   U_A = ΣR_A − n_A(n_A+1)/2,   z = (U_A − n_An_B/2)/σ,
    *   σ² = (n_An_B/12)·((n+1) − Σ(t³−t)/(n(n−1)))   (tie-corrected)
    *
    * Exactness: pooled average ranks ride the q71 DOUBLED-rank trick
    * lifted to the VALUE CENSUS — per distinct cents value,
    * 2·avgrank = 2·cumBefore + n_v + 1 is an integer, so ΣR and the
    * tie term Σ(t³−t) are exact DECIMAL(38,0) sums; doubles appear
    * only in the one closed-form z/effect-size expression (identical
    * IEEE tree both engines, 4-dp grid; U itself is half-integer —
    * exact in IEEE).
    *
    * Scale shape: the rank window runs over the DISTINCT-VALUE census
    * (bounded by the price domain — the q38 two-phase precedent), not
    * the event stream; the stream is touched once by a map-side-
    * combined census aggregate, and everything after is census-sized. */
  def q92MannWhitney(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .select(
        when(substring(md5($"user_id".cast("string")), 1, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7"), lit("A"))
          .otherwise(lit("B")).as("arm"),
        floor($"value" * 100).cast("long").as("cents"))
    val census = ev.groupBy($"cents").agg(
      sum(when($"arm" === "A", 1L).otherwise(0L)).as("na"),
      sum(when($"arm" === "B", 1L).otherwise(0L)).as("nb"))
      .withColumn("nv", $"na" + $"nb")
    val wCum = Window.orderBy($"cents")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = census
      .withColumn("cb", coalesce(sum($"nv").over(wCum), lit(0L)))
    val m = ranked.agg(
      sum($"na").as("n_a"), sum($"nb").as("n_b"),
      sum(($"na".cast("decimal(38,0)") * (lit(2L) * $"cb" + $"nv" + 1L)))
        .as("r2a"),
      sum(($"nv".cast("decimal(38,0)") * $"nv" * $"nv" - $"nv")).as("ties"))
    val d = "CAST(%s AS DOUBLE)"
    val ua = s"(${d.format("r2a - n_a * (n_a + 1)")} / 2.0)"
    val nn = "(n_a + n_b)"
    val varU = s"(${d.format("n_a")} * ${d.format("n_b")} / 12.0 * " +
      s"(${d.format(s"$nn + 1")} - ${d.format("ties")} / " +
      s"(${d.format(nn)} * ${d.format(s"$nn - 1")})))"
    m.select($"n_a", $"n_b",
      expr(ua).as("u_a"),
      expr(s"round(($ua - ${d.format("n_a")} * ${d.format("n_b")} / 2.0)" +
        s" / sqrt($varU), 4)").as("z"),
      expr(s"round(2.0 * $ua / (${d.format("n_a")} * ${d.format("n_b")})" +
        " - 1.0, 4)").as("rank_biserial"))
  }

  // ---------------------------------------------------------------- q93

  /** D183: Cramér's V association summary between order status and
    * priority — q68's contingency table collapsed to the ONE-row
    * effect-size readout (χ², dof, V = √(χ²/(n·min(r−1, c−1)))): the
    * number a dashboard tracks over time, where q68 is the per-cell
    * drill-down.
    *
    * Determinism: summing the ≤ r·c per-cell χ² contributions as raw
    * doubles would be ORDER-DEPENDENT; instead each cell's (identical
    * IEEE tree, q68's expression) contribution is snapped to a
    * 1e-6 integer grid — floor(contrib·1e6 + 0.5) — and summed as an
    * exact BIGINT, so the total is order-free on both engines. One
    * division chain at the end, 4-dp.
    *
    * Scale shape: identical to q68 — one map-side-combined cell
    * census (≤ |status|·|priority| rows), marginals as windows over
    * that bounded census, one final one-row aggregate. */
  def q93CramersV(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.orders(spark, dir)
      .groupBy($"o_orderstatus".as("status"), $"o_orderpriority".as("priority"))
      .agg(count(lit(1)).as("n"))
    val wr = Window.partitionBy($"status")
    val wc = Window.partitionBy($"priority")
    val wt = Window.partitionBy()
    val contrib = cells
      .withColumn("row_n", sum($"n").over(wr))
      .withColumn("col_n", sum($"n").over(wc))
      .withColumn("tot", sum($"n").over(wt))
      .withColumn("c6", expr(
        """CAST(floor(
             (CAST(n AS DOUBLE) - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(tot AS DOUBLE))
             * (CAST(n AS DOUBLE) - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(tot AS DOUBLE))
             / (CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(tot AS DOUBLE))
             * 1000000.0 + 0.5) AS BIGINT)"""))
    contrib.agg(
      max($"tot").as("n"),
      countDistinct($"status").as("n_rows"),
      countDistinct($"priority").as("n_cols"),
      sum($"c6").as("chi6"))
      .select($"n", $"n_rows", $"n_cols",
        (($"n_rows" - 1L) * ($"n_cols" - 1L)).as("dof"),
        round($"chi6".cast("double") / 1e6, 4).as("chi2"),
        expr("""round(sqrt(CAST(chi6 AS DOUBLE) / 1000000.0
            / (CAST(n AS DOUBLE) * CAST(least(n_rows, n_cols) - 1 AS DOUBLE))), 4)""")
          .as("cramers_v"))
  }

  // ---------------------------------------------------------------- q94

  /** The paired periods [[q94Mcnemar]] compares. */
  val mcnemarY1 = 1994; val mcnemarY2 = 1995

  /** D189: McNemar's test on paired binary outcomes — per customer,
    * "active (≥1 order) in 1994" vs "active in 1995", testing whether
    * activation and churn between the two years are symmetric (the
    * within-subject companion to q67/q92's between-group tests: each
    * customer is their own control).
    *
    *   χ² = (|b − c| − 1)² / (b + c)   (continuity-corrected),
    *
    * b = active-then-churned, c = newly-activated. Every cell count is
    * an exact integer from conditional aggregates; χ² is one IEEE
    * division, 4-dp, NULL when b + c = 0 (no discordant pairs — the
    * statistic is undefined, not zero).
    *
    * Scale shape: one year-filtered orders scan partial-aggregated by
    * customer (map-side combine), one co-partitioned left join onto
    * the customer dimension (inactive customers are real d-cell
    * members), one one-row rollup. */
  def q94Mcnemar(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val act = Tables.orders(spark, dir)
      .filter(year($"o_orderdate").isin(mcnemarY1, mcnemarY2))
      .groupBy($"o_custkey")
      .agg(max(when(year($"o_orderdate") === mcnemarY1, 1L).otherwise(0L))
        .as("a1"),
        max(when(year($"o_orderdate") === mcnemarY2, 1L).otherwise(0L))
          .as("a2"))
    Tables.customer(spark, dir).select($"c_custkey")
      .join(act, $"c_custkey" === $"o_custkey", "left")
      .na.fill(0L, Seq("a1", "a2"))
      .agg(count(lit(1)).as("n_customers"),
        sum($"a1" * $"a2").as("n_both"),
        sum($"a1" * (lit(1L) - $"a2")).as("only_y1"),
        sum((lit(1L) - $"a1") * $"a2").as("only_y2"))
      .select($"n_customers", $"n_both", $"only_y1", $"only_y2",
        when($"only_y1" + $"only_y2" > 0L, round(expr(
          """(CAST(abs(only_y1 - only_y2) - 1 AS DOUBLE)
             * CAST(abs(only_y1 - only_y2) - 1 AS DOUBLE))
             / CAST(only_y1 + only_y2 AS DOUBLE)"""), 4)).as("chi2"))
  }

  // ---------------------------------------------------------------- q95

  /** D193: Brown–Forsythe (median-based Levene) test — are the
    * per-return-flag price VARIANCES equal? The homogeneity screen
    * q83's ANOVA quietly assumes (and q67's Welch exists to dodge):
    * one-way ANOVA run on z = |y − median_g|, with the median (not
    * the mean) making the test robust to the heavy tails q66 reports.
    *
    * Exactness: work in DOUBLED cents — med2 = v_lo + v_hi (the two
    * middle order statistics, equal when n_g is odd) is an exact
    * integer, so every deviation z = |2y − med2| is an exact long and
    * the ANOVA moments are exact DECIMAL(38,0). Group medians come
    * from the q38 two-phase distinct-value census (never a row sort);
    * Σ S_g²/n_g rides the q83 ordered-fold over the ≤ |flags| census
    * so the rational sum is sequential and identical on both engines.
    *
    * Scale shape: ONE map-side-combined (flag, value) census pass;
    * medians, deviations and moments all live on census-sized frames
    * (value-domain-bounded); the final fold touches ≤ |flags| rows. */
  def q95Levene(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val census = Tables.lineitem(spark, dir)
      .select($"l_returnflag".as("flag"),
        floor($"l_extendedprice" * 100).cast("long").as("v"))
      .groupBy($"flag", $"v").agg(count(lit(1)).as("cnt"))
    val wSeq = Window.partitionBy($"flag").orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAllF = Window.partitionBy($"flag")
    val withCum = census
      .withColumn("cb", coalesce(sum($"cnt").over(wSeq), lit(0L)))
      .withColumn("ng", sum($"cnt").over(wAllF))
    val med = withCum
      .withColumn("lo", expr("(ng + 1) div 2"))
      .withColumn("hi", expr("(ng + 2) div 2"))
      .groupBy($"flag")
      .agg(sum(when($"cb" < $"lo" && $"lo" <= $"cb" + $"cnt", $"v")
          .otherwise(0L)).as("vlo"),
        sum(when($"cb" < $"hi" && $"hi" <= $"cb" + $"cnt", $"v")
          .otherwise(0L)).as("vhi"))
      .select($"flag", ($"vlo" + $"vhi").as("med2"))
    val g = withCum.join(med, "flag")
      .select($"flag", abs(lit(2L) * $"v" - $"med2").as("z"), $"cnt")
      .groupBy($"flag")
      .agg(sum($"cnt").cast("decimal(38,0)").as("n"),
        sum($"cnt" * $"z").cast("decimal(38,0)").as("s"),
        sum($"cnt".cast("decimal(38,0)") * $"z" * $"z").as("q"))
    val wCum = Window.orderBy($"flag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    g.withColumn("k", count(lit(1)).over(wAll))
      .withColumn("nn", sum($"n").over(wAll))
      .withColumn("ss", sum($"s").over(wAll))
      .withColumn("qq", sum($"q").over(wAll))
      .withColumn("ssb_run",
        sum(expr("CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)"))
          .over(wCum))
      .withColumn("rn", row_number().over(Window.orderBy($"flag".desc)))
      .filter($"rn" === 1)
      .select($"k".cast("long").as("k_groups"), $"nn".cast("long").as("n"),
        round(expr("""((ssb_run - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)
              / CAST(nn AS DOUBLE)) / CAST(k - 1 AS DOUBLE)) /
            ((CAST(qq AS DOUBLE) - ssb_run) / CAST(nn - k AS DOUBLE))"""), 4)
          .as("f_stat"),
        round(expr("""(ssb_run - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)
              / CAST(nn AS DOUBLE)) /
            (CAST(qq AS DOUBLE) - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)
              / CAST(nn AS DOUBLE))"""), 4).as("eta_sq"))
  }

  // ---------------------------------------------------------------- q96

  /** D194: Durbin–Watson serial-correlation diagnostic — per nation,
    * fit the linear monthly-revenue trend by exact-moment OLS, then
    * DW = Σ(e_t − e_{t−1})² / Σe_t² over the residuals: "after
    * removing the trend, do the errors still remember last month?"
    * (DW ≈ 2 = independent, → 0 = positive autocorrelation, → 4 =
    * alternation). q77's ACF reads the RAW series; DW reads the
    * REGRESSION residuals — the standard validity check before
    * trusting p7-style trend fits.
    *
    * Determinism: (a, b) come from exact DECIMAL(38,0) moments by one
    * IEEE closed form; each residual is the identical double on both
    * engines and is snapped to the centicent grid (floor(e·100+0.5))
    * so both DW sums are exact integers; one division, 4-dp.
    *
    * Scale shape: one monthly-rollup shuffle (map-side combined),
    * a ≤ #nations moment census broadcast back onto the months, ONE
    * lag window partitioned by nation (bounded by months-per-nation),
    * one final per-nation rollup. */
  def q96DurbinWatson(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val monthly = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .groupBy($"c_nationkey".as("nation"),
        (year($"o_orderdate") * 12 + month($"o_orderdate")).as("m"))
      .agg(sum(floor($"o_totalprice" * 100).cast("long")).as("y"))
      .withColumn("t", row_number().over(
        Window.partitionBy($"nation").orderBy($"m")).cast("long"))
    val mom = monthly.groupBy($"nation").agg(
      count(lit(1)).as("n"),
      sum($"t").cast("decimal(38,0)").as("st"),
      sum($"t" * $"t").cast("decimal(38,0)").as("stt"),
      sum($"y").cast("decimal(38,0)").as("sy"),
      sum($"t".cast("decimal(38,0)") * $"y").as("sty"))
      .withColumn("b", expr(
        """(CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
            - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
            - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))"""))
      .withColumn("a", expr(
        "(CAST(sy AS DOUBLE) - b * CAST(st AS DOUBLE)) / CAST(n AS DOUBLE)"))
      .select($"nation", $"n", $"a", $"b")
    val resid = monthly.join(mom, "nation")
      .withColumn("eq", expr(
        """CAST(floor((CAST(y AS DOUBLE) - a - b * CAST(t AS DOUBLE))
           * 100.0 + 0.5) AS BIGINT)"""))
      .withColumn("pe", lag($"eq", 1).over(
        Window.partitionBy($"nation").orderBy($"t")))
    resid.groupBy($"nation")
      .agg(max($"n").as("n_months"),
        sum(when($"pe".isNotNull,
          ($"eq" - $"pe").cast("decimal(38,0)") * ($"eq" - $"pe"))
          .otherwise(lit(0L).cast("decimal(38,0)"))).as("num"),
        sum($"eq".cast("decimal(38,0)") * $"eq").as("den"))
      .select($"nation", $"n_months",
        round(expr("CAST(num AS DOUBLE) / CAST(den AS DOUBLE)"), 4)
          .as("dw"),
        round(expr("1.0 - CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / 2.0"), 4)
          .as("rho_approx"))
      .orderBy($"nation")
  }

  // ---------------------------------------------------------------- q99

  /** D204: Kruskal–Wallis rank test — does line-item price
    * stochastically differ across return flags? The k-group
    * generalization of q92's Mann–Whitney (and the nonparametric
    * companion to q83's ANOVA / q95's Brown–Forsythe):
    *
    *   H = [12/(n(n+1)) · Σ_g R_g²/n_g − 3(n+1)] / (1 − Σ(t³−t)/(n³−n))
    *
    * Exactness: pooled average ranks ride the q92 doubled-rank census
    * (2·avgrank integers over the DISTINCT-VALUE frame); each group's
    * doubled rank sum R2_g and the tie term are exact DECIMAL(38,0);
    * Σ R_g²/n_g is a ≤ |flags|-row rational fold on the q83 ordered
    * frame (sequential, identical on both engines); one H expression,
    * 4-dp.
    *
    * Scale shape: ONE map-side (flag, value) census pass; the rank
    * window runs over the DISTINCT-VALUE frame (q38 two-phase
    * precedent); everything after is ≤ |flags| rows. */
  def q99KruskalWallis(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val census = Tables.lineitem(spark, dir)
      .select($"l_returnflag".as("flag"),
        floor($"l_extendedprice" * 100).cast("long").as("v"))
      .groupBy($"flag", $"v").agg(count(lit(1)).as("cnt"))
    // pooled doubled ranks need the cross-flag value census
    val pooled = census.groupBy($"v").agg(sum($"cnt").as("nv"))
      .withColumn("cb", coalesce(sum($"nv").over(
        Window.orderBy($"v").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val g = census.join(pooled, "v")
      .groupBy($"flag")
      .agg(sum($"cnt").cast("decimal(38,0)").as("ng"),
        sum(($"cnt".cast("decimal(38,0)") *
          (lit(2L) * $"cb" + $"nv" + 1L))).as("r2g"))
    val ties = pooled.agg(
      sum($"nv").as("n"),
      sum(($"nv".cast("decimal(38,0)") * $"nv" * $"nv" - $"nv")).as("tsum"))
    val wCum = Window.orderBy($"flag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    g.withColumn("k", count(lit(1)).over(wAll))
      .withColumn("rr_run", sum(expr(
        """CAST(r2g AS DOUBLE) / 2.0 * (CAST(r2g AS DOUBLE) / 2.0)
           / CAST(ng AS DOUBLE)""")).over(wCum))
      .withColumn("rn", row_number().over(Window.orderBy($"flag".desc)))
      .filter($"rn" === 1)
      .crossJoin(broadcast(ties))
      .select($"k".cast("long").as("k_groups"), $"n",
        round(expr(
          """(12.0 / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)) * rr_run
             - 3.0 * CAST(n + 1 AS DOUBLE))
             / (1.0 - CAST(tsum AS DOUBLE)
                / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                   - CAST(n AS DOUBLE)))"""), 4).as("h_stat"))
  }

  // --------------------------------------------------------------- q100

  /** D207: two-proportion z-test — HIGH-VALUE conversion (fraction
    * of users with ≥ 1 purchase of value ≥ [[convThreshold]]) between
    * q67's A/B arms, pooled-variance z: the binary-outcome member of
    * the test family (q67/q92 compare VALUE distributions; most
    * product experiments ship a conversion rate). The threshold keeps
    * the outcome non-degenerate on a fixture where every user
    * purchases something. Continuity-uncorrected, pooled p̂ — the
    * standard large-n form.
    *
    * Exactness: per-arm user and converter counts are exact integers
    * from one distinct-user census; p̂s and z are one IEEE expression
    * chain, 4-dp.
    *
    * Scale shape: ONE user-keyed partial-aggregated census (users ≪
    * events), then a one-row rollup. */
  /** q100's high-value purchase floor. */
  val convThreshold = 90.0

  def q100TwoProportion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val users = Tables.events(spark, dir)
      .groupBy($"user_id")
      .agg(max(($"event_type" === "purchase" &&
        $"value" >= convThreshold).cast("long")).as("conv"))
      .select(
        when(substring(md5($"user_id".cast("string")), 1, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7"), lit("A"))
          .otherwise(lit("B")).as("arm"),
        $"conv")
    val m = users.agg(
      sum(when($"arm" === "A", 1L).otherwise(0L)).as("n_a"),
      sum(when($"arm" === "A", $"conv").otherwise(0L)).as("x_a"),
      sum(when($"arm" === "B", 1L).otherwise(0L)).as("n_b"),
      sum(when($"arm" === "B", $"conv").otherwise(0L)).as("x_b"))
    val d = "CAST(%s AS DOUBLE)"
    val pa = s"(${d.format("x_a")} / ${d.format("n_a")})"
    val pb = s"(${d.format("x_b")} / ${d.format("n_b")})"
    val pp = s"(${d.format("x_a + x_b")} / ${d.format("n_a + n_b")})"
    m.select($"n_a", $"x_a", $"n_b", $"x_b",
      expr(s"round($pa, 4)").as("p_a"),
      expr(s"round($pb, 4)").as("p_b"),
      expr(s"""round(($pa - $pb) / sqrt($pp * (1.0 - $pp)
          * (1.0 / ${d.format("n_a")} + 1.0 / ${d.format("n_b")})), 4)""")
        .as("z"))
  }

  // --------------------------------------------------------------- q103

  /** Shared IEEE expression fragments for [[q103JarqueBera]] — built
    * once and interpolated into BOTH the Spark plan and the DuckDB
    * oracle so the two engines evaluate the identical operator tree
    * over the identical exact-integer moments (the q67 discipline;
    * squares spelled x*x, never pow). */
  private val jbMu = "(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))"
  private val jbM2 =
    s"((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) - $jbMu * $jbMu)"
  private val jbM3 =
    s"""((CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))
        - 3.0 * $jbMu * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
        + 2.0 * $jbMu * $jbMu * $jbMu)"""
  private val jbM4 =
    s"""((CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE))
        - 4.0 * $jbMu * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))
        + 6.0 * $jbMu * $jbMu * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
        - 3.0 * $jbMu * $jbMu * $jbMu * $jbMu)"""
  private val jbSkew = s"($jbM3 / ($jbM2 * sqrt($jbM2)))"
  private val jbKurt = s"($jbM4 / ($jbM2 * $jbM2))"
  private val jbStat =
    s"""((CAST(n AS DOUBLE) / 6.0)
        * ($jbSkew * $jbSkew
           + (($jbKurt - 3.0) * ($jbKurt - 3.0)) / 4.0))"""

  /** D218: Jarque–Bera normality audit per event type — sample
    * skewness, excess kurtosis, and JB = n/6·(S² + K²/4) over the
    * integerized metric v = floor(value): the distribution-shape
    * screen an experimentation / anomaly pipeline runs before
    * trusting any z- or t-based readout (q67/q100 assume the tails
    * this query measures).
    *
    * Exactness: the four raw moments Σv..Σv⁴ are EXACT integers from
    * ONE partial-aggregated pass — v⁴ ≤ ~1e11 per row fits BIGINT
    * comfortably, and the third/fourth sums accumulate as
    * DECIMAL(38,0) (s17's order-free discipline) because Σv⁴ outgrows
    * BIGINT around 1e8 rows — long before 100 TB. Central moments,
    * skewness, kurtosis, and JB are ONE shared IEEE expression tree
    * ([[jbStat]]) interpolated into both engines, 4-dp.
    *
    * Scale shape: one map-side-combined aggregate to ≤ |event_type|
    * rows; nothing after the scan shuffles more than that. */
  def q103JarqueBera(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val m = Tables.events(spark, dir)
      .select($"event_type", floor($"value").cast("long").as("v"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"v").as("s1"),
        sum($"v" * $"v").as("s2"),
        sum(($"v" * $"v" * $"v").cast("decimal(38,0)")).as("s3"),
        sum((($"v" * $"v") * ($"v" * $"v")).cast("decimal(38,0)")).as("s4"))
    m.select($"event_type", $"n",
        expr(s"round($jbMu, 4)").as("mean_v"),
        expr(s"round($jbSkew, 4)").as("skewness"),
        expr(s"round($jbKurt - 3.0, 4)").as("ex_kurtosis"),
        expr(s"round($jbStat, 4)").as("jb_stat"))
      .orderBy($"event_type")
  }

  // --------------------------------------------------------------- q105

  /** D222: Friedman rank test — does monthly revenue RANKING differ
    * systematically across order priorities, treating each month as a
    * matched block? The nonparametric repeated-measures companion to
    * q83's one-way ANOVA: ANOVA compares level MEANS across
    * independent groups; Friedman ranks the k=5 priorities WITHIN
    * each month and asks whether some priority is consistently
    * ranked higher, immune to month-level scale shifts (seasonality,
    * growth) that inflate q83's between-month variance.
    *
    * Exactness: per-(month, priority) revenue is an exact cent sum;
    * within-block average ranks ride the q92 DOUBLED-rank census
    * trick (2·below + ties + 1 — exact integers, no fractional rank
    * state); only complete blocks (all 5 priorities present) enter,
    * so rank sums are directly comparable. Q = 12/(n·k·(k+1))·ΣR_j²
    * − 3·n·(k+1) (classic uncorrected form, average ranks for ties)
    * is one IEEE tree over exact integer sums, 4-dp.
    *
    * Scale shape: one partial-aggregated rollup to the (months × 5)
    * block frame; ranking windows PARTITION BY month (parallel in
    * blocks); the final Q rides a window over the 5-row rank-sum
    * frame (the t14 bounded-global-window exemption). */
  def q105Friedman(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val monthly = Tables.orders(spark, dir)
      .select((year($"o_orderdate") * 12 + month($"o_orderdate")).as("mo"),
        $"o_orderpriority".as("priority"),
        floor($"o_totalprice" * 100).cast("long").as("cents"))
      .groupBy($"mo", $"priority").agg(sum($"cents").as("rev"))
      .scopedPersist()
    val complete = monthly.groupBy($"mo").agg(count(lit(1)).as("kk"))
      .filter($"kk" === 5).select($"mo")
    val rows = monthly.join(complete, "mo")
    val cen = rows.groupBy($"mo", $"rev").agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy($"mo").orderBy($"rev")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = cen
      .withColumn("cb", coalesce(sum($"cnt").over(wCum), lit(0L)))
      .select($"mo", $"rev",
        (lit(2L) * $"cb" + $"cnt" + lit(1L)).as("rank2"))
    val rsum = rows.join(ranked, Seq("mo", "rev"))
      .groupBy($"priority")
      .agg(count(lit(1)).as("n_blocks"), sum($"rank2").as("r2"))
    val wAll = Window
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    rsum
      .withColumn("ssum",
        sum($"r2".cast("decimal(38,0)") * $"r2").over(wAll))
      .select($"priority", $"n_blocks",
        expr("CAST(r2 AS DOUBLE) / 2.0").as("rank_sum"),
        expr("round(CAST(r2 AS DOUBLE) / (2.0 * CAST(n_blocks AS DOUBLE)), 4)")
          .as("mean_rank"),
        expr("""round(12.0 / (CAST(n_blocks AS DOUBLE) * 5.0 * 6.0)
            * (CAST(ssum AS DOUBLE) / 4.0)
            - 3.0 * CAST(n_blocks AS DOUBLE) * 6.0, 4)""").as("q_stat"))
      .orderBy($"priority")
  }

  // --------------------------------------------------------------- q112

  /** BH false-discovery-rate level. */
  val bhAlpha = 0.05

  /** Shared IEEE fragments for [[q112BhFdr]] (the q103 discipline).
    * z over the exact integer census columns (n, x, nr, xr, nt, xt);
    * the two-sided normal p-value over column z via the
    * Abramowitz–Stegun 7.1.26 erf polynomial (|err| < 1.5e-7):
    * p = 2(1 − Φ(|z|)) = erfc(|z|/√2) = poly(t)·exp(−x²). */
  private val bhZSql =
    """((CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
        - CAST(xr AS DOUBLE) / CAST(nr AS DOUBLE))
        / sqrt((CAST(xt AS DOUBLE) / CAST(nt AS DOUBLE))
          * (1.0 - CAST(xt AS DOUBLE) / CAST(nt AS DOUBLE))
          * (1.0 / CAST(n AS DOUBLE) + 1.0 / CAST(nr AS DOUBLE))))"""
  private val bhXSql = "(abs(z) / sqrt(2.0))"
  private val bhTSql = s"(1.0 / (1.0 + 0.3275911 * $bhXSql))"
  private val bhPSql =
    s"""((((((1.061405429 * $bhTSql - 1.453152027) * $bhTSql
        + 1.421413741) * $bhTSql - 0.284496736) * $bhTSql
        + 0.254829592) * $bhTSql) * exp(-$bhXSql * $bhXSql))"""

  /** D262: Benjamini–Hochberg FDR over the per-nation test family —
    * for every nation, a pooled two-proportion z-test of its URGENT
    * order share against the rest of the world, then the BH step-up
    * procedure at α = [[bhAlpha]] across all m simultaneous tests:
    * the multiple-comparisons control that turns q67/q100-style
    * per-group readouts into an honest discovery list (25 uncorrected
    * tests at α=.05 expect a false positive; a per-nation anomaly
    * dashboard without FDR control IS that false positive).
    *
    * Determinism: the per-nation census (n, x) and complements are
    * exact integers; z and p are ONE shared IEEE tree interpolated
    * into both engines ([[bhZSql]]/[[bhPSql]] — exp() is the t12/t26
    * transcendental precedent); ranks order by (raw p, nation); the
    * BH cutoff k* = max rank with p ≤ αk/m and the rejected flags are
    * integer comparisons on those shared doubles.
    *
    * Scale shape: one partial-aggregated census to ≤ |nation| rows,
    * a 1-row total broadcast-crossed in, and windows over the
    * m-row frame — nothing after the scan is data-sized. */
  def q112BhFdr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val byNation = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, dir)),
        $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name".as("nation"))
      .agg(count(lit(1)).as("n"),
        sum(($"o_orderpriority" === "1-URGENT").cast("long")).as("x"))
    val tot = byNation.agg(sum($"n").as("nt"), sum($"x").as("xt"),
      count(lit(1)).as("m"))
    val base = byNation.crossJoin(broadcast(tot))
      .withColumn("nr", $"nt" - $"n").withColumn("xr", $"xt" - $"x")
      .withColumn("z", expr(bhZSql))
      .withColumn("p", expr(bhPSql))
    val w = Window.orderBy($"p", $"nation")
    val all = Window.partitionBy()
    base.withColumn("p_rank", row_number().over(w))
      .withColumn("flag",
        when(expr(s"p <= $bhAlpha * CAST(p_rank AS DOUBLE) / CAST(m AS DOUBLE)"),
          $"p_rank").otherwise(lit(0)))
      .withColumn("kstar", max($"flag").over(all))
      .select($"nation", $"n".as("n_orders"), $"x".as("n_urgent"),
        round($"z", 4).as("z"), round($"p", 4).as("p_value"),
        $"p_rank", ($"p_rank" <= $"kstar").cast("int").as("rejected"))
      .orderBy($"nation")
  }

  // ------------------------------------------------------------ registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q112_bh_fdr" -> q112BhFdr,
    "q92_mann_whitney" -> q92MannWhitney,
    "q93_cramers_v" -> q93CramersV,
    "q94_mcnemar" -> q94Mcnemar,
    "q95_levene" -> q95Levene,
    "q96_durbin_watson" -> q96DurbinWatson,
    "q99_kruskal_wallis" -> q99KruskalWallis,
    "q100_two_proportion" -> q100TwoProportion,
    "q103_jarque_bera" -> q103JarqueBera,
    "q105_friedman" -> q105Friedman,
    "q67_welch_ttest" -> q67WelchTtest,
    "q68_chi2" -> q68Chi2,
    "q69_theilsen" -> q69TheilSen,
    "q70_interpolate" -> q70Interpolate,
    "q71_spearman" -> q71Spearman,
    "q74_mann_kendall" -> q74MannKendall,
    "q75_pr_auc" -> q75PrAuc,
    "q76_ks_test" -> q76KsTest,
    "q77_acf" -> q77Acf,
    "q78_kaplan_meier" -> q78KaplanMeier,
    "q83_anova" -> q83Anova,
    "q88_runs_test" -> q88RunsTest,
    "q89_paired_ttest" -> q89PairedTtest,
    "q90_changepoint" -> q90Changepoint)

  val oracle: Map[String, String] = Map(
    "q112_bh_fdr" ->
      s"""WITH c AS (SELECT n.n_name AS nation,
              CAST(count(*) AS BIGINT) AS n,
              CAST(count(*) FILTER (WHERE o.o_orderpriority = '1-URGENT')
                AS BIGINT) AS x
            FROM orders o JOIN customer cu ON o.o_custkey = cu.c_custkey
              JOIN nation n ON cu.c_nationkey = n.n_nationkey
            GROUP BY 1),
          t AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
              CAST(sum(x) AS BIGINT) AS xt,
              CAST(count(*) AS BIGINT) AS m FROM c),
          b AS (SELECT c.nation, c.n, c.x, t.nt, t.xt, t.m,
              t.nt - c.n AS nr, t.xt - c.x AS xr
            FROM c CROSS JOIN t),
          z0 AS (SELECT *, $bhZSql AS z FROM b),
          p0 AS (SELECT *, $bhPSql AS p FROM z0),
          r0 AS (SELECT *, CAST(row_number()
              OVER (ORDER BY p, nation) AS INT) AS p_rank FROM p0),
          f0 AS (SELECT *, CASE WHEN p <= $bhAlpha
                * CAST(p_rank AS DOUBLE) / CAST(m AS DOUBLE)
              THEN p_rank ELSE 0 END AS flag FROM r0),
          k0 AS (SELECT *, max(flag) OVER () AS kstar FROM f0)
          SELECT nation, n AS n_orders, x AS n_urgent,
            round(z, 4) AS z, round(p, 4) AS p_value, p_rank,
            CAST(CASE WHEN p_rank <= kstar THEN 1 ELSE 0 END AS INT)
              AS rejected
          FROM k0 ORDER BY nation""",
    "q105_friedman" ->
      """WITH m AS (SELECT (year(o_orderdate) * 12 + month(o_orderdate))
                  AS mo, o_orderpriority AS priority,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev
              FROM orders GROUP BY 1, 2),
          cb AS (SELECT mo FROM m GROUP BY mo HAVING count(*) = 5),
          r AS (SELECT m.* FROM m JOIN cb USING (mo)),
          cen AS (SELECT mo, rev, CAST(count(*) AS BIGINT) AS cnt
                  FROM r GROUP BY 1, 2),
          rk AS (SELECT mo, rev,
                  2 * coalesce(sum(cnt) OVER (PARTITION BY mo ORDER BY rev
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    + cnt + 1 AS rank2
                 FROM cen),
          rs AS (SELECT priority, CAST(count(*) AS BIGINT) AS n_blocks,
                  CAST(sum(rank2) AS BIGINT) AS r2
                 FROM r JOIN rk USING (mo, rev) GROUP BY priority),
          t AS (SELECT *, sum(CAST(r2 AS HUGEINT) * r2) OVER () AS ssum
                FROM rs)
          SELECT priority, n_blocks,
            CAST(r2 AS DOUBLE) / 2.0 AS rank_sum,
            round(CAST(r2 AS DOUBLE) / (2.0 * CAST(n_blocks AS DOUBLE)), 4)
              AS mean_rank,
            round(12.0 / (CAST(n_blocks AS DOUBLE) * 5.0 * 6.0)
              * (CAST(ssum AS DOUBLE) / 4.0)
              - 3.0 * CAST(n_blocks AS DOUBLE) * 6.0, 4) AS q_stat
          FROM t ORDER BY priority""",
    "q103_jarque_bera" ->
      s"""WITH e AS (SELECT event_type, CAST(floor(value) AS BIGINT) AS v
                     FROM events),
          m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(v) AS BIGINT) AS s1,
                  CAST(sum(v * v) AS BIGINT) AS s2,
                  sum(v * v * v) AS s3,
                  sum((v * v) * (v * v)) AS s4
                FROM e GROUP BY event_type)
          SELECT event_type, n,
            round($jbMu, 4) AS mean_v,
            round($jbSkew, 4) AS skewness,
            round($jbKurt - 3.0, 4) AS ex_kurtosis,
            round($jbStat, 4) AS jb_stat
          FROM m ORDER BY event_type""",
    "q100_two_proportion" ->
      """WITH u AS (SELECT user_id,
              CAST(max(CASE WHEN event_type = 'purchase' AND value >= 90.0
                THEN 1 ELSE 0 END) AS BIGINT) AS conv
            FROM events GROUP BY user_id),
          a AS (SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                IN ('0','1','2','3','4','5','6','7') THEN 'A' ELSE 'B' END
                AS arm, conv
            FROM u),
          m AS (SELECT
              CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
                AS n_a,
              CAST(sum(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS BIGINT)
                AS x_a,
              CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
                AS n_b,
              CAST(sum(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS BIGINT)
                AS x_b
            FROM a)
          SELECT n_a, x_a, n_b, x_b,
            round(CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE), 4) AS p_a,
            round(CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE), 4) AS p_b,
            round((CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                - CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE))
              / sqrt((CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                * (1.0 - CAST(x_a + x_b AS DOUBLE)
                   / CAST(n_a + n_b AS DOUBLE))
                * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))),
              4) AS z
          FROM m""",
    "q99_kruskal_wallis" ->
      """WITH census AS (SELECT l_returnflag AS flag,
              CAST(floor(l_extendedprice * 100) AS BIGINT) AS v,
              CAST(count(*) AS BIGINT) AS cnt
            FROM lineitem GROUP BY 1, 2),
          pooled AS (SELECT v, CAST(sum(cnt) AS BIGINT) AS nv,
              COALESCE(CAST(sum(sum(cnt)) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                AS BIGINT), 0) AS cb
            FROM census GROUP BY v),
          g AS (SELECT c.flag, CAST(sum(c.cnt) AS HUGEINT) AS ng,
              sum(CAST(c.cnt AS HUGEINT) * (2 * p.cb + p.nv + 1)) AS r2g
            FROM census c JOIN pooled p USING (v) GROUP BY c.flag),
          ties AS (SELECT CAST(sum(nv) AS BIGINT) AS n,
              sum(CAST(nv AS HUGEINT) * nv * nv - nv) AS tsum
            FROM pooled),
          f AS (SELECT flag,
              CAST(count(*) OVER () AS BIGINT) AS k,
              sum(CAST(r2g AS DOUBLE) / 2.0 * (CAST(r2g AS DOUBLE) / 2.0)
                / CAST(ng AS DOUBLE)) OVER (ORDER BY flag
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS rr_run,
              row_number() OVER (ORDER BY flag DESC) AS rn
            FROM g)
          SELECT f.k AS k_groups, t.n,
            round((12.0 / (CAST(t.n AS DOUBLE) * CAST(t.n + 1 AS DOUBLE))
                * f.rr_run - 3.0 * CAST(t.n + 1 AS DOUBLE))
              / (1.0 - CAST(t.tsum AS DOUBLE)
                 / (CAST(t.n AS DOUBLE) * CAST(t.n AS DOUBLE)
                    * CAST(t.n AS DOUBLE) - CAST(t.n AS DOUBLE))), 4)
              AS h_stat
          FROM f CROSS JOIN ties t WHERE f.rn = 1""",
    "q96_durbin_watson" ->
      """WITH monthly AS (SELECT c.c_nationkey AS nation,
              year(o.o_orderdate) * 12 + month(o.o_orderdate) AS m,
              CAST(sum(floor(o.o_totalprice * 100)) AS BIGINT) AS y
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2),
          tt AS (SELECT nation, m, y,
              CAST(row_number() OVER (PARTITION BY nation ORDER BY m)
                AS BIGINT) AS t
            FROM monthly),
          mom AS (SELECT nation,
              CAST(count(*) AS BIGINT) AS n,
              CAST(sum(t) AS HUGEINT) AS st,
              CAST(sum(t * t) AS HUGEINT) AS stt,
              CAST(sum(y) AS HUGEINT) AS sy,
              sum(CAST(t AS HUGEINT) * y) AS sty
            FROM tt GROUP BY nation),
          ab AS (SELECT nation, n,
              (CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
                - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) AS b,
              st, sy
            FROM mom),
          ab2 AS (SELECT nation, n, b,
              (CAST(sy AS DOUBLE) - b * CAST(st AS DOUBLE))
                / CAST(n AS DOUBLE) AS a
            FROM ab),
          r AS (SELECT tt.nation, ab2.n,
              CAST(floor((CAST(tt.y AS DOUBLE) - ab2.a
                - ab2.b * CAST(tt.t AS DOUBLE)) * 100.0 + 0.5)
                AS BIGINT) AS eq,
              lag(CAST(floor((CAST(tt.y AS DOUBLE) - ab2.a
                - ab2.b * CAST(tt.t AS DOUBLE)) * 100.0 + 0.5)
                AS BIGINT)) OVER (PARTITION BY tt.nation ORDER BY tt.t)
                AS pe
            FROM tt JOIN ab2 USING (nation)),
          f AS (SELECT nation, CAST(max(n) AS BIGINT) AS n_months,
              sum(CASE WHEN pe IS NOT NULL
                THEN CAST(eq - pe AS HUGEINT) * (eq - pe)
                ELSE CAST(0 AS HUGEINT) END) AS num,
              sum(CAST(eq AS HUGEINT) * eq) AS den
            FROM r GROUP BY nation)
          SELECT nation, n_months,
            round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 4) AS dw,
            round(1.0 - CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / 2.0, 4)
              AS rho_approx
          FROM f ORDER BY nation""",
    "q95_levene" ->
      """WITH census AS (SELECT l_returnflag AS flag,
              CAST(floor(l_extendedprice * 100) AS BIGINT) AS v,
              CAST(count(*) AS BIGINT) AS cnt
            FROM lineitem GROUP BY 1, 2),
          cum AS (SELECT flag, v, cnt,
              COALESCE(CAST(sum(cnt) OVER (PARTITION BY flag ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                AS BIGINT), 0) AS cb,
              CAST(sum(cnt) OVER (PARTITION BY flag) AS BIGINT) AS ng
            FROM census),
          med AS (SELECT flag,
              CAST(sum(CASE WHEN cb < (ng + 1) // 2
                  AND (ng + 1) // 2 <= cb + cnt THEN v ELSE 0 END)
                + sum(CASE WHEN cb < (ng + 2) // 2
                  AND (ng + 2) // 2 <= cb + cnt THEN v ELSE 0 END)
                AS BIGINT) AS med2
            FROM cum GROUP BY flag),
          g AS (SELECT c.flag,
              CAST(sum(c.cnt) AS HUGEINT) AS n,
              CAST(sum(c.cnt * abs(2 * c.v - m.med2)) AS HUGEINT) AS s,
              sum(CAST(c.cnt AS HUGEINT) * abs(2 * c.v - m.med2)
                * abs(2 * c.v - m.med2)) AS q
            FROM cum c JOIN med m USING (flag) GROUP BY c.flag),
          f AS (SELECT flag, n, s, q,
              CAST(count(*) OVER () AS BIGINT) AS k,
              sum(n) OVER () AS nn,
              sum(s) OVER () AS ss,
              sum(q) OVER () AS qq,
              sum(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                OVER (ORDER BY flag
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS ssb_run,
              row_number() OVER (ORDER BY flag DESC) AS rn
            FROM g)
          SELECT k AS k_groups, CAST(nn AS BIGINT) AS n,
            round(((ssb_run - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)
                / CAST(nn AS DOUBLE)) / CAST(k - 1 AS DOUBLE)) /
              ((CAST(qq AS DOUBLE) - ssb_run) / CAST(nn - k AS DOUBLE)), 4)
              AS f_stat,
            round((ssb_run - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)
                / CAST(nn AS DOUBLE)) /
              (CAST(qq AS DOUBLE) - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)
                / CAST(nn AS DOUBLE)), 4) AS eta_sq
          FROM f WHERE rn = 1""",
    "q94_mcnemar" ->
      s"""WITH act AS (SELECT o_custkey,
              CAST(max(CASE WHEN year(o_orderdate) = $mcnemarY1
                THEN 1 ELSE 0 END) AS BIGINT) AS a1,
              CAST(max(CASE WHEN year(o_orderdate) = $mcnemarY2
                THEN 1 ELSE 0 END) AS BIGINT) AS a2
            FROM orders
            WHERE year(o_orderdate) IN ($mcnemarY1, $mcnemarY2)
            GROUP BY o_custkey),
          j AS (SELECT COALESCE(a.a1, 0) AS a1, COALESCE(a.a2, 0) AS a2
            FROM customer c LEFT JOIN act a ON c.c_custkey = a.o_custkey),
          m AS (SELECT CAST(count(*) AS BIGINT) AS n_customers,
              CAST(sum(a1 * a2) AS BIGINT) AS n_both,
              CAST(sum(a1 * (1 - a2)) AS BIGINT) AS only_y1,
              CAST(sum((1 - a1) * a2) AS BIGINT) AS only_y2
            FROM j)
          SELECT n_customers, n_both, only_y1, only_y2,
            CASE WHEN only_y1 + only_y2 > 0 THEN
              round((CAST(abs(only_y1 - only_y2) - 1 AS DOUBLE)
                  * CAST(abs(only_y1 - only_y2) - 1 AS DOUBLE))
                / CAST(only_y1 + only_y2 AS DOUBLE), 4) END AS chi2
          FROM m""",
    "q92_mann_whitney" ->
      """WITH e AS (SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                IN ('0','1','2','3','4','5','6','7') THEN 'A' ELSE 'B' END AS arm,
              CAST(floor(value * 100) AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase'),
          census AS (SELECT cents,
              CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS na,
              CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS nb
            FROM e GROUP BY cents),
          rk AS (SELECT na, nb, na + nb AS nv,
              COALESCE(CAST(sum(na + nb) OVER (ORDER BY cents
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                0) AS cb
            FROM census),
          m AS (SELECT CAST(sum(na) AS BIGINT) AS n_a,
              CAST(sum(nb) AS BIGINT) AS n_b,
              sum(CAST(na AS HUGEINT) * (2 * cb + nv + 1)) AS r2a,
              sum(CAST(nv AS HUGEINT) * nv * nv - nv) AS ties
            FROM rk),
          f AS (SELECT n_a, n_b,
              CAST(r2a - n_a * (n_a + 1) AS DOUBLE) / 2.0 AS u_a,
              CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0 *
                (CAST(n_a + n_b + 1 AS DOUBLE) - CAST(ties AS DOUBLE) /
                 (CAST(n_a + n_b AS DOUBLE) * CAST(n_a + n_b - 1 AS DOUBLE)))
                AS var_u
            FROM m)
          SELECT n_a, n_b, u_a,
            round((u_a - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)
              / sqrt(var_u), 4) AS z,
            round(2.0 * u_a / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
              - 1.0, 4) AS rank_biserial
          FROM f""",
    "q93_cramers_v" ->
      """WITH cells AS (SELECT o_orderstatus AS status,
              o_orderpriority AS priority, CAST(count(*) AS BIGINT) AS n
            FROM orders GROUP BY 1, 2),
          w AS (SELECT status, priority, n,
              CAST(sum(n) OVER (PARTITION BY status) AS BIGINT) AS row_n,
              CAST(sum(n) OVER (PARTITION BY priority) AS BIGINT) AS col_n,
              CAST(sum(n) OVER () AS BIGINT) AS tot
            FROM cells),
          c AS (SELECT tot,
              CAST(floor(
                (CAST(n AS DOUBLE) - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(tot AS DOUBLE))
                * (CAST(n AS DOUBLE) - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(tot AS DOUBLE))
                / (CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(tot AS DOUBLE))
                * 1000000.0 + 0.5) AS BIGINT) AS c6,
              status, priority
            FROM w)
          SELECT CAST(max(tot) AS BIGINT) AS n,
            CAST(count(DISTINCT status) AS BIGINT) AS n_rows,
            CAST(count(DISTINCT priority) AS BIGINT) AS n_cols,
            CAST((count(DISTINCT status) - 1)
              * (count(DISTINCT priority) - 1) AS BIGINT) AS dof,
            round(CAST(sum(c6) AS DOUBLE) / 1000000.0, 4) AS chi2,
            round(sqrt(CAST(sum(c6) AS DOUBLE) / 1000000.0
              / (CAST(max(tot) AS DOUBLE)
                 * CAST(least(count(DISTINCT status),
                              count(DISTINCT priority)) - 1 AS DOUBLE))), 4)
              AS cramers_v
          FROM c""",
    "q67_welch_ttest" ->
      """WITH e AS (SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                IN ('0','1','2','3','4','5','6','7') THEN 'A' ELSE 'B' END AS arm,
              CAST(floor(value * 100) AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase'),
          m AS (SELECT
              CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
              CAST(sum(CASE WHEN arm = 'A' THEN cents ELSE 0 END) AS BIGINT) AS s1_a,
              CAST(sum(CASE WHEN arm = 'A' THEN cents * cents ELSE 0 END) AS BIGINT) AS s2_a,
              CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
              CAST(sum(CASE WHEN arm = 'B' THEN cents ELSE 0 END) AS BIGINT) AS s1_b,
              CAST(sum(CASE WHEN arm = 'B' THEN cents * cents ELSE 0 END) AS BIGINT) AS s2_b
            FROM e),
          v AS (SELECT n_a, n_b,
              CAST(s1_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS ma,
              CAST(s1_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mb,
              ((CAST(s2_a AS DOUBLE) - CAST(s1_a AS DOUBLE) * CAST(s1_a AS DOUBLE) / CAST(n_a AS DOUBLE)) / CAST(n_a - 1 AS DOUBLE)) / CAST(n_a AS DOUBLE) AS sea,
              ((CAST(s2_b AS DOUBLE) - CAST(s1_b AS DOUBLE) * CAST(s1_b AS DOUBLE) / CAST(n_b AS DOUBLE)) / CAST(n_b - 1 AS DOUBLE)) / CAST(n_b AS DOUBLE) AS seb
            FROM m)
          SELECT n_a, n_b,
            round(ma / 100.0, 4) AS mean_a,
            round(mb / 100.0, 4) AS mean_b,
            round((ma - mb) / sqrt(sea + seb), 4) AS t_stat,
            round((sea + seb) * (sea + seb)
              / (sea * sea / CAST(n_a - 1 AS DOUBLE)
                 + seb * seb / CAST(n_b - 1 AS DOUBLE)), 4) AS df
          FROM v""",
    "q71_spearman" ->
      """WITH b AS (SELECT l_returnflag AS flag,
              CAST(floor(l_quantity * 100) AS BIGINT) AS qc,
              CAST(floor(l_extendedprice * 100) AS BIGINT) AS pc
            FROM lineitem),
          r AS (SELECT flag,
              2 * rank() OVER (PARTITION BY flag ORDER BY qc)
                + count(*) OVER (PARTITION BY flag, qc) - 1 AS rx,
              2 * rank() OVER (PARTITION BY flag ORDER BY pc)
                + count(*) OVER (PARTITION BY flag, pc) - 1 AS ry
            FROM b),
          m AS (SELECT flag, CAST(count(*) AS BIGINT) AS n,
              sum(CAST(rx AS HUGEINT)) AS sx, sum(CAST(ry AS HUGEINT)) AS sy,
              sum(CAST(rx AS HUGEINT) * CAST(ry AS HUGEINT)) AS sxy,
              sum(CAST(rx AS HUGEINT) * CAST(rx AS HUGEINT)) AS sxx,
              sum(CAST(ry AS HUGEINT) * CAST(ry AS HUGEINT)) AS syy
            FROM r GROUP BY flag)
          SELECT flag, n,
            round(CAST(n * sxy - sx * sy AS DOUBLE) /
              sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
                   CAST(n * syy - sy * sy AS DOUBLE)), 4) AS rho
          FROM m ORDER BY flag""",
    "q68_chi2" ->
      """WITH cells AS (SELECT o_orderstatus AS status,
              o_orderpriority AS priority, CAST(count(*) AS BIGINT) AS n
            FROM orders GROUP BY 1, 2),
          w AS (SELECT status, priority, n,
              CAST(sum(n) OVER (PARTITION BY status) AS BIGINT) AS row_n,
              CAST(sum(n) OVER (PARTITION BY priority) AS BIGINT) AS col_n,
              CAST(sum(n) OVER () AS BIGINT) AS tot
            FROM cells)
          SELECT status, priority, n,
            round(CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(tot AS DOUBLE), 4) AS expected,
            round((CAST(n AS DOUBLE) - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(tot AS DOUBLE))
              * (CAST(n AS DOUBLE) - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(tot AS DOUBLE))
              / (CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(tot AS DOUBLE)), 4) AS contrib
          FROM w ORDER BY status, priority""",
    "q69_theilsen" ->
      s"""WITH daily AS (SELECT c.c_nationkey AS nation,
              date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE)) AS day,
              CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2),
          pr AS (SELECT a.nation,
              CAST(b.cents - a.cents AS DOUBLE) / CAST(b.day - a.day AS DOUBLE) AS slope
            FROM daily a JOIN daily b
              ON a.nation = b.nation AND a.day < b.day
              AND b.day - a.day <= $tsMaxLagDays),
          r AS (SELECT nation, slope,
              row_number() OVER (PARTITION BY nation ORDER BY slope) AS rn,
              CAST(count(*) OVER (PARTITION BY nation) AS BIGINT) AS cnt
            FROM pr)
          SELECT nation, CAST(max(cnt) AS BIGINT) AS n_pairs,
            round(min(slope) + (max(slope) - min(slope)) * 0.5, 4) AS slope_cpd
          FROM r WHERE rn = (cnt + 1) // 2 OR rn = cnt // 2 + 1
          GROUP BY nation ORDER BY nation""",
    "q70_interpolate" ->
      """WITH daily AS (SELECT c.c_nationkey AS nation,
              date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE)) AS day,
              CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2),
          cal AS (SELECT nation, unnest(generate_series(min(day), max(day))) AS day
            FROM daily GROUP BY nation),
          j AS (SELECT cal.nation, cal.day, daily.cents
            FROM cal LEFT JOIN daily
              ON cal.nation = daily.nation AND cal.day = daily.day),
          w AS (SELECT nation, day, cents,
              last_value(cents IGNORE NULLS) OVER (PARTITION BY nation ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pc,
              last_value(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS)
                OVER (PARTITION BY nation ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
              last_value(cents IGNORE NULLS) OVER (PARTITION BY nation ORDER BY day DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nc,
              last_value(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS)
                OVER (PARTITION BY nation ORDER BY day DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nd
            FROM j)
          SELECT nation, CAST(day AS INT) AS day,
            round(CASE WHEN cents IS NOT NULL THEN CAST(cents AS DOUBLE)
              ELSE CAST(pc AS DOUBLE) + CAST(nc - pc AS DOUBLE)
                * (CAST(day - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE)) END, 4)
              AS filled_cents,
            cents IS NOT NULL AS is_observed
          FROM w ORDER BY nation, day""",
    "q74_mann_kendall" ->
      """WITH mon AS (SELECT c.c_nationkey AS nation,
              year(o.o_orderdate) * 12 + month(o.o_orderdate) AS m,
              CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2),
          s AS (SELECT a.nation,
              CAST(sum(CASE WHEN b.cents > a.cents THEN 1
                WHEN b.cents < a.cents THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
            FROM mon a JOIN mon b ON a.nation = b.nation AND a.m < b.m
            GROUP BY 1),
          t AS (SELECT nation, CAST(sum(t) AS BIGINT) AS n_m,
              CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
            FROM (SELECT nation, cents, CAST(count(*) AS BIGINT) AS t
                  FROM mon GROUP BY 1, 2)
            GROUP BY 1)
          SELECT s.nation, t.n_m AS n_months, s.s_stat,
            round(CAST(n_m * (n_m - 1) * (2 * n_m + 5) - tie_term
              AS DOUBLE) / 18.0, 4) AS var_s,
            round(CASE WHEN s_stat = 0 OR n_m * (n_m - 1) * (2 * n_m + 5)
                  - tie_term = 0 THEN 0.0
              WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
                / sqrt(CAST(n_m * (n_m - 1) * (2 * n_m + 5) - tie_term
                  AS DOUBLE) / 18.0)
              ELSE CAST(s_stat + 1 AS DOUBLE)
                / sqrt(CAST(n_m * (n_m - 1) * (2 * n_m + 5) - tie_term
                  AS DOUBLE) / 18.0) END, 4) AS z_stat
          FROM s JOIN t USING (nation) ORDER BY nation""",
    "q75_pr_auc" ->
      s"""WITH j AS (SELECT d.n_chars AS score,
              CASE WHEN e.label >= ${Analytics.aucPosCut} THEN 1 ELSE 0 END AS pos
            FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
          g AS (SELECT score, CAST(count(*) AS BIGINT) AS n_tot,
              CAST(sum(pos) AS BIGINT) AS n_pos
            FROM j GROUP BY 1),
          c AS (SELECT score, n_tot, n_pos,
              CAST(sum(n_tot) OVER (ORDER BY score DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tot,
              CAST(sum(n_pos) OVER (ORDER BY score DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos,
              CAST(sum(n_pos) OVER () AS BIGINT) AS np,
              CAST(sum(n_tot) OVER () - sum(n_pos) OVER () AS BIGINT) AS nn
            FROM g),
          d2 AS (SELECT *,
              CAST(n_pos AS DOUBLE) * (CAST(cum_pos AS DOUBLE) / CAST(cum_tot AS DOUBLE)) AS term,
              2.0 * CAST(cum_pos AS DOUBLE) / CAST(cum_tot + np AS DOUBLE) AS f1
            FROM c),
          a AS (SELECT np, nn,
              sum(term) OVER (ORDER BY score DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ap_sum,
              row_number() OVER (ORDER BY score) AS rn
            FROM d2),
          apr AS (SELECT np AS n_pos, nn AS n_neg,
              round(ap_sum / CAST(np AS DOUBLE), 4) AS ap
            FROM a WHERE rn = 1),
          b AS (SELECT round(f1, 4) AS best_f1, score AS best_f1_score,
              row_number() OVER (ORDER BY f1 DESC, score DESC) AS rn
            FROM d2)
          SELECT n_pos, n_neg, ap, best_f1, best_f1_score
          FROM apr CROSS JOIN (SELECT best_f1, best_f1_score FROM b WHERE rn = 1)""",
    "q76_ks_test" ->
      """WITH v AS (SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END AS in_a,
              CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders),
          g AS (SELECT cents, CAST(sum(in_a) AS BIGINT) AS ca,
              CAST(count(*) - sum(in_a) AS BIGINT) AS cb
            FROM v GROUP BY 1),
          c AS (SELECT cents,
              CAST(sum(ca) OVER (ORDER BY cents
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) AS cum_a,
              CAST(sum(cb) OVER (ORDER BY cents
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) AS cum_b,
              CAST(sum(ca) OVER () AS BIGINT) AS n_a,
              CAST(sum(cb) OVER () AS BIGINT) AS n_b
            FROM g),
          m AS (SELECT *, abs(cum_a * n_b - cum_b * n_a) AS gap FROM c),
          t AS (SELECT * FROM m ORDER BY gap DESC, cents LIMIT 1)
          SELECT n_a, n_b, cents AS d_at_cents,
            round(CAST(gap AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 4) AS d_stat,
            round(CAST(gap AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
              * sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                / CAST(n_a + n_b AS DOUBLE)), 4) AS ks_lambda
          FROM t""",
    "q77_acf" ->
      s"""WITH daily AS (SELECT c.c_nationkey AS nation,
              date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE)) AS day,
              CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2),
          cal AS (SELECT nation, unnest(generate_series(min(day), max(day))) AS day
            FROM daily GROUP BY nation),
          f AS (SELECT cal.nation, cal.day, COALESCE(daily.cents, 0) AS y
            FROM cal LEFT JOIN daily
              ON cal.nation = daily.nation AND cal.day = daily.day),
          st AS (SELECT nation, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(y) AS BIGINT) AS s FROM f GROUP BY 1),
          z AS (SELECT f.nation, f.day,
              CAST(st.n AS HUGEINT) * f.y - st.s AS z
            FROM f JOIN st ON f.nation = st.nation),
          den AS (SELECT nation, sum(z * z) AS den FROM z GROUP BY 1),
          nums AS (SELECT a.nation, l.k AS lag, sum(a.z * b.z) AS num
            FROM z a
            JOIN (VALUES (1), (2), (3), (4), (5), (6), (7)) l(k) ON true
            JOIN z b ON b.nation = a.nation AND b.day = a.day - l.k
            GROUP BY 1, 2)
          SELECT n.nation, CAST(n.lag AS INT) AS lag,
            round(CAST(n.num AS DOUBLE) / CAST(d.den AS DOUBLE), 4) AS acf
          FROM nums n JOIN den d ON n.nation = d.nation
          ORDER BY n.nation, n.lag""",
    "q78_kaplan_meier" ->
      s"""WITH RECURSIVE sp AS (SELECT o_custkey,
              min(CAST(o_orderdate AS DATE)) AS fd,
              max(CAST(o_orderdate AS DATE)) AS ld
            FROM orders GROUP BY 1),
          hz AS (SELECT max(ld) AS h FROM sp),
          obs AS (SELECT
              CASE WHEN date_diff('day', ld, h) > $kmChurnDays
                THEN date_diff('day', fd, ld)
                ELSE date_diff('day', fd, h) END AS t,
              CASE WHEN date_diff('day', ld, h) > $kmChurnDays
                THEN 1 ELSE 0 END AS ev
            FROM sp CROSS JOIN hz),
          grid AS (SELECT CAST(t AS BIGINT) AS t,
              CAST(sum(ev) AS BIGINT) AS d,
              CAST(count(*) - sum(ev) AS BIGINT) AS c
            FROM obs GROUP BY 1),
          r0 AS (SELECT t, d, c,
              CAST(sum(d + c) OVER ()
                - COALESCE(sum(d + c) OVER (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS n_risk
            FROM grid),
          ev AS (SELECT t, d, c, n_risk,
              row_number() OVER (ORDER BY t) AS rn
            FROM r0 WHERE d > 0),
          rec AS (
            SELECT t, d, c, n_risk, rn,
              1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS s
            FROM ev WHERE rn = 1
            UNION ALL
            SELECT e.t, e.d, e.c, e.n_risk, e.rn,
              rec.s * (1.0 - CAST(e.d AS DOUBLE) / CAST(e.n_risk AS DOUBLE))
            FROM rec JOIN ev e ON e.rn = rec.rn + 1)
          SELECT t AS t_days, n_risk, d AS n_events, c AS n_censored,
            round(s, 4) AS survival
          FROM rec ORDER BY t""",
    "q83_anova" ->
      """WITH g AS (SELECT CAST(dayofweek(o_orderdate) AS INT) AS dow,
              CAST(count(*) AS HUGEINT) AS n,
              sum(CAST(CAST(floor(o_totalprice * 100) AS BIGINT) AS HUGEINT))
                AS s,
              sum(CAST(CAST(floor(o_totalprice * 100) AS BIGINT) AS HUGEINT)
                * CAST(floor(o_totalprice * 100) AS BIGINT)) AS q
            FROM orders GROUP BY 1),
          w AS (SELECT dow, n, s, q,
              CAST(count(*) OVER () AS BIGINT) AS k,
              sum(n) OVER () AS nn,
              sum(s) OVER () AS ss,
              sum(q) OVER () AS qq,
              sum(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                OVER (ORDER BY dow
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS ssb_run,
              row_number() OVER (ORDER BY dow DESC) AS rn
            FROM g)
          SELECT k AS k_groups, CAST(nn AS BIGINT) AS n,
            round(((ssb_run - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)
                / CAST(nn AS DOUBLE)) / CAST(k - 1 AS DOUBLE)) /
              ((CAST(qq AS DOUBLE) - ssb_run) / CAST(nn - k AS DOUBLE)), 4)
              AS f_stat,
            round((ssb_run - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)
                / CAST(nn AS DOUBLE)) /
              (CAST(qq AS DOUBLE) - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)
                / CAST(nn AS DOUBLE)), 4) AS eta_sq
          FROM w WHERE rn = 1""",
    "q88_runs_test" ->
      """WITH daily AS (SELECT c.c_nationkey AS nation,
              date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE))
                AS day,
              CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2),
          mrk AS (SELECT *,
              row_number() OVER (PARTITION BY nation
                ORDER BY cents, day) AS rn,
              CAST(count(*) OVER (PARTITION BY nation) AS BIGINT) AS cnt
            FROM daily),
          med AS (SELECT nation,
              min(cents) + (max(cents) - min(cents)) * 0.5 AS med
            FROM mrk WHERE rn = (cnt + 1) // 2 OR rn = cnt // 2 + 1
            GROUP BY nation),
          sg AS (SELECT d.nation, d.day,
              CAST(CAST(d.cents AS DOUBLE) > m.med AS INT) AS sgn
            FROM daily d JOIN med m ON d.nation = m.nation
            WHERE CAST(d.cents AS DOUBLE) <> m.med),
          rz AS (SELECT nation, sgn,
              lag(sgn) OVER (PARTITION BY nation ORDER BY day) AS prev
            FROM sg),
          agg AS (SELECT nation,
              CAST(sum(sgn) AS BIGINT) AS n_pos,
              CAST(count(*) - sum(sgn) AS BIGINT) AS n_neg,
              CAST(sum(CASE WHEN prev IS NULL OR prev <> sgn THEN 1 ELSE 0 END)
                AS BIGINT) AS n_runs
            FROM rz GROUP BY 1)
          SELECT nation, n_pos, n_neg, n_runs,
            round((CAST(n_runs AS DOUBLE) -
                (1.0 + 2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)
                  / CAST(n_pos + n_neg AS DOUBLE))) /
              sqrt(2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)
                * (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)
                  - CAST(n_pos + n_neg AS DOUBLE))
                / (CAST(n_pos + n_neg AS DOUBLE) * CAST(n_pos + n_neg AS DOUBLE)
                  * CAST(n_pos + n_neg - 1 AS DOUBLE))), 4) AS z_stat
          FROM agg ORDER BY nation""",
    "q89_paired_ttest" ->
      """WITH mon AS (SELECT c.c_nationkey AS nation,
              year(o.o_orderdate) * 12 + month(o.o_orderdate) AS m,
              CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2),
          lg AS (SELECT nation, m, cents,
              lag(m) OVER (PARTITION BY nation ORDER BY m) AS pm,
              lag(cents) OVER (PARTITION BY nation ORDER BY m) AS pc
            FROM mon),
          d AS (SELECT nation, CAST(cents - pc AS HUGEINT) AS d
            FROM lg WHERE pm IS NOT NULL AND m = pm + 1),
          agg AS (SELECT nation, CAST(count(*) AS BIGINT) AS n_pairs,
              sum(d) AS sd, sum(d * d) AS sdd
            FROM d GROUP BY 1)
          SELECT nation, n_pairs,
            round(CAST(sd AS DOUBLE) / CAST(n_pairs AS DOUBLE), 4)
              AS mean_diff_cents,
            round((CAST(sd AS DOUBLE) / CAST(n_pairs AS DOUBLE)) /
              sqrt(((CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE)
                  * CAST(sd AS DOUBLE) / CAST(n_pairs AS DOUBLE))
                / CAST(n_pairs - 1 AS DOUBLE))
                / CAST(n_pairs AS DOUBLE)), 4) AS t_stat
          FROM agg ORDER BY nation""",
    "q90_changepoint" ->
      """WITH mon AS (SELECT c.c_nationkey AS nation,
              CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) AS INT) AS m,
              CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2),
          tt AS (SELECT nation, m, cents,
              CAST(row_number() OVER (PARTITION BY nation ORDER BY m)
                AS INT) AS t,
              sum(CAST(cents AS HUGEINT)) OVER (PARTITION BY nation
                ORDER BY m ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS cs,
              sum(CAST(cents AS HUGEINT) * cents) OVER (PARTITION BY nation
                ORDER BY m ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS css
            FROM mon),
          tot AS (SELECT nation, CAST(count(*) AS BIGINT) AS tn,
              sum(CAST(cents AS HUGEINT)) AS ts,
              sum(CAST(cents AS HUGEINT) * cents) AS tss
            FROM mon GROUP BY 1),
          cand AS (SELECT tt.nation, tt.m, tt.t, tot.tn, tt.cs, tot.ts,
              CAST(css AS DOUBLE)
                - CAST(cs AS DOUBLE) * CAST(cs AS DOUBLE)
                  / CAST(t AS DOUBLE) AS sse_l,
              (CAST(tss AS DOUBLE) - CAST(css AS DOUBLE))
                - (CAST(ts AS DOUBLE) - CAST(cs AS DOUBLE))
                  * (CAST(ts AS DOUBLE) - CAST(cs AS DOUBLE))
                  / CAST(tn - t AS DOUBLE) AS sse_r
            FROM tt JOIN tot USING (nation) WHERE tt.t < tot.tn),
          r AS (SELECT *, sse_l + sse_r AS cost,
              row_number() OVER (PARTITION BY nation
                ORDER BY sse_l + sse_r, t) AS rk
            FROM cand)
          SELECT nation, tn AS n_months, t AS split_t, m AS split_m,
            round(CAST(cs AS DOUBLE) / CAST(t AS DOUBLE), 4)
              AS mean_before_cents,
            round((CAST(ts AS DOUBLE) - CAST(cs AS DOUBLE))
              / CAST(tn - t AS DOUBLE), 4) AS mean_after_cents,
            round(cost, 0) AS sse_total
          FROM r WHERE rk = 1 ORDER BY nation""")
}
