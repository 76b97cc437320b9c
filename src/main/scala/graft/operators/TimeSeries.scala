package graft.operators

import java.sql.Date

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.CacheScope.ScopedPersist
import graft.sources.Tables

/** One observation of a per-nation daily revenue series. */
case class HoltIn(nation: String, day: Date, y: Long)

/** One smoothed observation: level/trend state after folding this day,
  * plus the one-step-ahead forecast error the PREVIOUS state made. */
case class HoltOut(nation: String, day: Date, cents: Long,
    level: Double, trend: Double, forecast_err: Double)

/** One q98 backtest verdict per nation. */
case class BacktestOut(nation: String, n_train: Long, n_test: Long,
    mae_cents: Double, mape: Double)

/** D113: Holt linear (double-exponential) smoothing over per-nation
  * daily revenue — the classic level+trend forecaster, run as a
  * per-series sequential fold:
  *
  *   l_t = ½·y_t + ½·(l_{t−1} + b_{t−1})
  *   b_t = ½·(l_t − l_{t−1}) + ½·b_{t−1}
  *   err_t = y_t − (l_{t−1} + b_{t−1})      (one-step forecast error)
  *
  * α = β = ½ are EXACT binary fractions, so each step is a fixed
  * sequence of IEEE multiplies/adds on identical doubles in both
  * engines — the fold IS the evaluation order, so there is no
  * summation-order freedom anywhere and the 4-dp output rounding
  * can never flip (the cosSql identical-structure argument applied
  * to a recurrence). Initialization: l₁ = y₁, b₁ = 0, err₁ = 0.
  * The series index is OBSERVATION order (days with no orders are
  * skipped, not zero-filled — documented series semantics).
  *
  * Scale shape: the daily census is one partial-aggregated groupBy;
  * the fold is `groupByKey(nation).flatMapSortedGroups(day)` — the
  * c3/e10 secondary-sort shape: O(1) state per series, series fold in
  * parallel, the sort rides the shuffle. The oracle replays the
  * identical recurrence as a recursive CTE (e10 pattern). */
object TimeSeries {

  private[operators] def holtFold(
      it: Iterator[HoltIn]): Iterator[HoltOut] = {
    var has = false
    var l = 0.0
    var b = 0.0
    it.map { r =>
      val y = r.y.toDouble
      val (err, nl, nb) =
        if (!has) (0.0, y, 0.0)
        else {
          val e = y - (l + b)
          val l1 = 0.5 * y + 0.5 * (l + b)
          val b1 = 0.5 * (l1 - l) + 0.5 * b
          (e, l1, b1)
        }
      has = true; l = nl; b = nb
      HoltOut(r.nation, r.day, r.y, l, b, err)
    }
  }

  def q65Holt(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, dir)),
        $"c_nationkey" === $"n_nationkey")
      .select($"n_name".as("nation"), to_date($"o_orderdate").as("day"),
        floor($"o_totalprice" * 100).cast("long").as("cents"))
      .groupBy($"nation", $"day").agg(sum($"cents").as("y"))
      .as[HoltIn]
    daily.groupByKey(_.nation)
      .flatMapSortedGroups($"day") { (_: String, it: Iterator[HoltIn]) =>
        holtFold(it)
      }
      .toDF()
      .select($"nation", $"day", $"cents",
        round($"level", 4).as("level"), round($"trend", 4).as("trend"),
        round($"forecast_err", 4).as("forecast_err"))
      .orderBy($"nation", $"day")
  }

  /** One smoothed q86 observation: level/trend + the day-of-week
    * seasonal state AFTER folding this day, plus the one-step error
    * the PREVIOUS state made. */
  private[operators] case class HwOut(nation: String, day: Date, cents: Long,
      level: Double, trend: Double, seasonal: Double, forecast_err: Double)

  /** D160: additive Holt–Winters — q65's level+trend fold extended
    * with a 7-slot day-of-week seasonal state (weekly retail cycle):
    *
    *   err = y − (l + b + s_dw)
    *   l'  = ½(y − s_dw) + ½(l + b)
    *   b'  = ½(l' − l) + ½b
    *   s_dw' = ½(y − l') + ½ s_dw
    *
    * α = β = γ = ½ are exact dyadics, so every step is a fixed IEEE
    * sequence with no summation-order freedom (the q65 argument, now
    * with 9 state doubles). Init: l₁ = y₁, b = 0, s ≡ 0. The seasonal
    * index is the epoch-day mod 7 (a pure integer both engines derive
    * from the same date arithmetic). Observation order = observed
    * days (gaps skipped, the q65 series semantics).
    *
    * Scale shape: identical to q65 — one partial-aggregated daily
    * census, then `groupByKey(nation).flatMapSortedGroups(day)` with
    * O(1) state (9 doubles) per series; the oracle replays the fold
    * as a recursive CTE carrying the 7 seasonal columns. */
  def q86HoltWinters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, dir)),
        $"c_nationkey" === $"n_nationkey")
      .select($"n_name".as("nation"), to_date($"o_orderdate").as("day"),
        floor($"o_totalprice" * 100).cast("long").as("cents"))
      .groupBy($"nation", $"day").agg(sum($"cents").as("y"))
      .as[HoltIn]
    daily.groupByKey(_.nation)
      .flatMapSortedGroups($"day") { (_: String, it: Iterator[HoltIn]) =>
        hwFold(it)
      }
      .toDF()
      .select($"nation", $"day", $"cents",
        round($"level", 4).as("level"), round($"trend", 4).as("trend"),
        round($"seasonal", 4).as("seasonal"),
        round($"forecast_err", 4).as("forecast_err"))
      .orderBy($"nation", $"day")
  }

  private[operators] def hwFold(it: Iterator[HoltIn]): Iterator[HwOut] = {
    var has = false
    var l = 0.0
    var b = 0.0
    val s = Array.fill(7)(0.0)
    it.map { r =>
      val y = r.y.toDouble
      val dw = java.lang.Math.floorMod(r.day.toLocalDate.toEpochDay, 7L).toInt
      val (err, nl, nb, ns) =
        if (!has) (0.0, y, 0.0, 0.0)
        else {
          val sd = s(dw)
          val e = y - (l + b + sd)
          val l1 = 0.5 * (y - sd) + 0.5 * (l + b)
          val b1 = 0.5 * (l1 - l) + 0.5 * b
          val s1 = 0.5 * (y - l1) + 0.5 * sd
          (e, l1, b1, s1)
        }
      has = true; l = nl; b = nb; s(dw) = ns
      HwOut(r.nation, r.day, r.y, l, b, ns, err)
    }
  }

  /** D223: OHLC downsampling — per-nation WEEKLY open/high/low/close
    * candles plus order count and revenue from the raw order stream,
    * the canonical time-series resample (finance candles; any
    * metric's "first/peak/trough/latest per bucket" rollup). Open and
    * close are the chronologically first/last order's total in the
    * bucket with a total-order tie-break (orderdate, then orderkey),
    * so the candle is deterministic under any partitioning — the
    * first()/last() aggregates Spark offers are explicitly
    * order-dependent and are exactly what this operator avoids.
    *
    * Exactness: all five candle fields are exact integer cents /
    * counts (no doubles anywhere).
    *
    * Scale shape: one orders⋈customer shuffle join (nation
    * broadcast); both row_number windows PARTITION BY (nation, week)
    * — high-cardinality, parallel in buckets; then ONE
    * partial-aggregated rollup. Conditional max(when(rn=1)) turns the
    * endpoint picks into plain aggregates — no self-join back. */
  def q106OhlcResample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir)
        .select($"c_custkey".as("o_custkey"), $"c_nationkey"), "o_custkey")
      .join(broadcast(Tables.nation(spark, dir)
        .select($"n_nationkey".as("c_nationkey"), $"n_name".as("nation"))),
        "c_nationkey")
      .select($"nation",
        (datediff(to_date($"o_orderdate"), lit("1970-01-01")) / 7)
          .cast("long").as("week"),
        $"o_orderdate", $"o_orderkey",
        floor($"o_totalprice" * 100).cast("long").as("cents"))
    val wAsc = Window.partitionBy($"nation", $"week")
      .orderBy($"o_orderdate", $"o_orderkey")
    val wDesc = Window.partitionBy($"nation", $"week")
      .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    o.withColumn("rna", row_number().over(wAsc))
      .withColumn("rnd", row_number().over(wDesc))
      .groupBy($"nation", $"week")
      .agg(count(lit(1)).as("n_orders"),
        max(when($"rna" === 1, $"cents")).as("open_cents"),
        max($"cents").as("high_cents"),
        min($"cents").as("low_cents"),
        max(when($"rnd" === 1, $"cents")).as("close_cents"),
        sum($"cents").as("volume_cents"))
      .orderBy($"nation", $"week")
  }

  /** Rolling-regression window length (days) and the minimum observed
    * days before a slope is emitted (half the window). */
  val rollWindowDays = 28
  val rollMinDays = 14

  /** D239: rolling linear trend — a [[rollWindowDays]]-day rolling OLS
    * of daily revenue on time: per day, the regression SLOPE
    * (cents/day — the local growth rate, the statistic a "revenue is
    * decelerating" alert thresholds on) and INTERCEPT over the
    * trailing window. Complements the q65/q86 exponential smoothers
    * (recursive, infinite memory) with the fixed-memory local trend,
    * and q69's global Theil–Sen with a time-resolved readout.
    *
    * Determinism: daily revenue is an exact integer cents sum; the
    * day index anchors at 1995-01-01 (the fixture's first order) so
    * all five window sums (n, Σt, Σy, Σty, Σt²) are exact BIGINTs;
    * slope/intercept are the closed forms computed in DOUBLE from
    * those exact integers — the same two-operand IEEE ops in both
    * engines, so 2-dp rounds match bit-for-bit (no summation-order
    * freedom anywhere).
    *
    * Scale shape: ONE partial-aggregated rollup to the daily census
    * (calendar-bounded — rows = days, not orders), then an
    * unpartitioned range-frame window over that census; emit only
    * windows with ≥ [[rollMinDays]] observed days (the ramp-in is
    * noise). */
  def q107RollingTrend(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.orders(spark, dir)
      .select(datediff(to_date($"o_orderdate"), lit("1995-01-01"))
          .cast("long").as("t"),
        floor($"o_totalprice" * 100).cast("long").as("cents"))
      .groupBy($"t").agg(sum($"cents").as("y"))
    val w = Window.orderBy($"t").rangeBetween(-(rollWindowDays - 1), 0)
    daily.select($"t",
        count(lit(1)).over(w).as("n"),
        sum($"t").over(w).as("st"),
        sum($"y").over(w).as("sy"),
        sum($"t" * $"y").over(w).as("sty"),
        sum($"t" * $"t").over(w).as("stt"))
      .filter($"n" >= rollMinDays)
      .select($"t".as("day"), $"n".as("n_days"),
        round(($"n".cast("double") * $"sty" - $"st".cast("double") * $"sy") /
          ($"n".cast("double") * $"stt" - $"st".cast("double") * $"st"), 2)
          .as("slope_cents"),
        round(($"sy".cast("double") * $"stt" - $"st".cast("double") * $"sty") /
          ($"n".cast("double") * $"stt" - $"st".cast("double") * $"st"), 2)
          .as("icept_cents"))
      .orderBy($"day")
  }

  /** Max lead/lag (days) scanned by [[q110Ccf]]. */
  val ccfMaxLag = 7

  /** D254: cross-correlation function between two event series — the
    * lead-lag diagnostic ("do views TODAY predict purchases in L
    * days?") a marketing/causal pipeline reads before fitting any
    * lagged model. For each lag in ±[[ccfMaxLag]]: Pearson r between
    * the daily 'view' count and the lag-shifted daily 'purchase'
    * count, over the days where both series exist.
    *
    * Determinism: the daily series are INTEGER counts, so each lag's
    * six moments (n, Σx, Σy, Σxy, Σx², Σy²) accumulate as exact
    * decimal(38,0) sums (the p12 discipline — integer addition
    * commutes, so cross-engine partial-agg order cannot flip them);
    * r's one double division + sqrt happens on those exact integers,
    * then rounds 4-dp in the FRAME (Spark round ≡ DuckDB round).
    *
    * Scale shape: one partial-aggregated pass reduces events to ≤
    * #days daily rows; the lag explode (×15) and self-join run on
    * that days-sized frame, and the moment census is ≤ 15 rows — the
    * driver finish is a k-row census (the audited p12 shape). */
  def q110Ccf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .filter($"event_type".isin("view", "purchase"))
      .groupBy(to_date($"ts").as("day"))
      .agg(sum(when($"event_type" === "view", 1L).otherwise(0L)).as("x"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("y"))
      .scopedPersist()
    def s(e: org.apache.spark.sql.Column, n: String) =
      sum(e.cast("decimal(38,0)")).as(n)
    val lagged = daily.select($"day", $"x")
      .withColumn("lag",
        explode(typedLit((-ccfMaxLag to ccfMaxLag).toArray)))
    val m = lagged
      .join(daily.select($"day".as("day2"), $"y"),
        expr("day2 = date_add(day, lag)"))
      .groupBy($"lag")
      // cast BEFORE multiplying: long*long would wrap past ~3e9 daily
      // counts while the oracle's HUGEINT product stays exact
      .agg(count(lit(1)).as("n"), s($"x", "sx"), s($"y", "sy"),
        s($"x".cast("decimal(38,0)") * $"y", "sxy"),
        s($"x".cast("decimal(38,0)") * $"x", "sxx"),
        s($"y".cast("decimal(38,0)") * $"y", "syy"))
      .collect()
    // ≤ 15-row census: finish r on exact BigDecimal moments driver-side
    val rows = m.map { r =>
      val n = BigDecimal(r.getLong(1))
      def bd(i: Int) = BigDecimal(r.getDecimal(i))
      val num = n * bd(4) - bd(2) * bd(3)
      val dx = n * bd(5) - bd(2) * bd(2)
      val dy = n * bd(6) - bd(3) * bd(3)
      (r.getInt(0), r.getLong(1),
        num.toDouble / math.sqrt(dx.toDouble * dy.toDouble))
    }.toSeq
    rows.toDF("lag", "n_days", "r_raw")
      .select($"lag", $"n_days", round($"r_raw", 4).as("r"))
      .orderBy($"lag")
  }

  /** Shared IEEE expression fragments for [[q111YuleWalker]] — built
    * once and interpolated into BOTH the Spark plan and the DuckDB
    * oracle so the two engines evaluate the identical operator tree
    * over the identical exact-integer moments (the q103 discipline).
    * c_k is the biased lag-k autocovariance expanded so every input
    * is an exact integer: c_k = (p_k − ȳ(a_k+b_k) + n_k·ȳ²)/n. */
  private val ywYbar = "(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
  private def ywC(k: Int) =
    s"""((CAST(p$k AS DOUBLE) - $ywYbar * (CAST(a$k AS DOUBLE)
        + CAST(b$k AS DOUBLE)) + CAST(n$k AS DOUBLE) * $ywYbar * $ywYbar)
        / CAST(n AS DOUBLE))"""
  private val ywR1 = s"(${ywC(1)} / ${ywC(0)})"
  private val ywR2 = s"(${ywC(2)} / ${ywC(0)})"
  private val ywDen = s"(1.0 - $ywR1 * $ywR1)"
  private val ywPhi1 = s"($ywR1 * (1.0 - $ywR2) / $ywDen)"
  private val ywPhi2 = s"(($ywR2 - $ywR1 * $ywR1) / $ywDen)"

  /** D258: AR(2) fit by Yule–Walker — autoregressive coefficients
    * φ₁, φ₂ of the daily-revenue series from its lag-1/lag-2
    * autocorrelations: the first MODEL in the time-series family
    * (q77 measures the ACF; this solves the 2×2 Yule–Walker system
    * r₁ = φ₁ + φ₂r₁, r₂ = φ₁r₁ + φ₂ for the coefficients a forecaster
    * or residual-whitening step would actually use). Lags are in
    * OBSERVATION order (q65's series semantics — unobserved days are
    * skipped, not zero-filled).
    *
    * Determinism: all eleven moments (n, Σy, Σy², per-lag pair count,
    * Σy_t·y_{t−k} and the two boundary sums Σ_{t>k}y_t, Σ_{t≤n−k}y_t)
    * are EXACT integers accumulated as decimal(38,0)/HUGEINT in one
    * aggregate; autocovariances, r₁/r₂, and the YW closed forms are
    * ONE shared IEEE expression tree ([[ywPhi1]]/[[ywPhi2]])
    * interpolated into both engines, 4-dp.
    *
    * Scale shape: one partial-aggregated rollup to the daily census
    * (rows = calendar days, not orders — the q107 bound), one
    * unpartitioned lag window over that days-sized frame, ONE
    * map-side-combined aggregate to a single moment row. */
  def q111YuleWalker(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.orders(spark, dir)
      .select(to_date($"o_orderdate").as("day"),
        floor($"o_totalprice" * 100).cast("long").as("cents"))
      .groupBy($"day").agg(sum($"cents").as("y"))
    val w = Window.orderBy($"day")
    val lagged = daily.select($"y",
      lag($"y", 1).over(w).as("y1"), lag($"y", 2).over(w).as("y2"))
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    // null lag products drop out of sum() — exactly the t>k boundary
    val m = lagged.agg(
      count(lit(1)).as("n"), sum(dec($"y")).as("s"),
      sum(dec($"y") * $"y").as("p0"),
      count($"y1").as("n1"),
      sum(dec($"y") * $"y1").as("p1"),
      sum(when($"y1".isNotNull, dec($"y"))).as("a1"),
      sum(dec($"y1")).as("b1"),
      count($"y2").as("n2"),
      sum(dec($"y") * $"y2").as("p2"),
      sum(when($"y2".isNotNull, dec($"y"))).as("a2"),
      sum(dec($"y2")).as("b2"))
      .withColumn("n0", $"n").withColumn("a0", $"s").withColumn("b0", $"s")
    m.select($"n".as("n_days"),
      expr(s"round($ywR1, 4)").as("r1"),
      expr(s"round($ywR2, 4)").as("r2"),
      expr(s"round($ywPhi1, 4)").as("phi1"),
      expr(s"round($ywPhi2, 4)").as("phi2"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q65_holt" -> q65Holt,
    "q86_holt_winters" -> q86HoltWinters,
    "q98_holt_backtest" -> q98HoltBacktest,
    "q106_ohlc" -> q106OhlcResample,
    "q107_rolling_trend" -> q107RollingTrend,
    "q110_ccf" -> q110Ccf,
    "q111_yule_walker" -> q111YuleWalker)

  /** Held-out observations per series for [[q98HoltBacktest]]. */
  val backtestHoldout = 7

  /** D202: rolling-origin forecast backtest — per nation, fit q65's
    * Holt level+trend on all but the last [[backtestHoldout]] observed
    * days, forecast ŷ_{T+h} = l_T + h·b_T for the held-out tail, and
    * report MAE and MAPE against the actuals: the evaluation that
    * decides whether q65's smoothing is TRUSTABLE as a forecaster
    * (the supervised-eval pattern p13/p15/t33 apply to models,
    * applied to the time-series family — a forecast without a
    * backtest is a guess with extra steps).
    *
    * Determinism: the train fold is the identical dyadic (α = β = ½)
    * recurrence as q65 (no summation-order freedom); each holdout
    * error is one IEEE expression snapped to the cent / 1e-6-APE grid
    * so both rollup sums are exact integers; two 4-dp divisions per
    * nation at the end.
    *
    * Scale shape: same census + flatMapSortedGroups shape as q65; the
    * per-series buffer is the nation's daily census — bounded by
    * CALENDAR DAYS (the q69 argument), not data size. Series shorter
    * than the holdout emit nothing (un-backtestable, not zero). */
  def q98HoltBacktest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, dir)),
        $"c_nationkey" === $"n_nationkey")
      .select($"n_name".as("nation"), to_date($"o_orderdate").as("day"),
        floor($"o_totalprice" * 100).cast("long").as("cents"))
      .groupBy($"nation", $"day").agg(sum($"cents").as("y"))
      .as[HoltIn]
    daily.groupByKey(_.nation)
      .flatMapSortedGroups($"day") { (nation: String, it: Iterator[HoltIn]) =>
        backtestFold(nation, it)
      }
      .toDF()
      .orderBy($"nation")
  }

  private[operators] def backtestFold(nation: String,
      it: Iterator[HoltIn]): Iterator[BacktestOut] = {
    val xs = it.toVector
    if (xs.length <= backtestHoldout) Iterator.empty
    else {
      val (train, test) = xs.splitAt(xs.length - backtestHoldout)
      var has = false; var l = 0.0; var b = 0.0
      train.foreach { r =>
        val y = r.y.toDouble
        if (!has) { l = y; b = 0.0; has = true }
        else {
          val l1 = 0.5 * y + 0.5 * (l + b)
          val b1 = 0.5 * (l1 - l) + 0.5 * b
          l = l1; b = b1
        }
      }
      var se = BigInt(0); var sa = BigInt(0)
      test.zipWithIndex.foreach { case (r, i) =>
        val fhat = l + (i + 1).toDouble * b
        val err = math.abs(r.y.toDouble - fhat)
        se += BigInt(math.floor(err + 0.5).toLong)
        sa += BigInt(math.floor(err / r.y.toDouble * 1e6 + 0.5).toLong)
      }
      def r4(x: Double) =
        BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      Iterator.single(BacktestOut(nation, train.length.toLong,
        backtestHoldout.toLong,
        r4(se.toDouble / backtestHoldout.toDouble),
        r4(sa.toDouble / (backtestHoldout.toDouble * 1e6))))
    }
  }

  /** q86 oracle: the identical Holt–Winters recurrence as a recursive
    * CTE carrying the 7 day-of-week seasonal slots. Repeated
    * subexpressions (l1, s_dw) are textual duplicates — deterministic
    * IEEE, so duplication cannot diverge. */
  private def hwOracleSql: String = {
    val sdw = s"(CASE d.dw ${(0 to 6).map(i => s"WHEN $i THEN r.s$i").mkString(" ")} END)"
    val l1 = s"(0.5 * (d.y - $sdw) + 0.5 * (r.l + r.b))"
    val sInit = (0 to 6).map(i => s"CAST(0.0 AS DOUBLE) AS s$i").mkString(", ")
    val sUpd = (0 to 6).map(i =>
      s"CASE WHEN d.dw = $i THEN 0.5 * (d.y - $l1) + 0.5 * r.s$i ELSE r.s$i END AS s$i")
      .mkString(",\n              ")
    s"""WITH RECURSIVE d0 AS (
          SELECT n.n_name AS nation,
            CAST(date_trunc('day', o.o_orderdate) AS DATE) AS day,
            CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS y
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
          GROUP BY 1, 2),
        d AS (SELECT nation, day, y,
            row_number() OVER (PARTITION BY nation ORDER BY day) AS rn,
            CAST(date_diff('day', DATE '1970-01-01', day) % 7 AS INT) AS dw
          FROM d0),
        r AS (
          SELECT nation, day, y, rn, dw, CAST(y AS DOUBLE) AS l,
            CAST(0.0 AS DOUBLE) AS b, $sInit,
            CAST(0.0 AS DOUBLE) AS seas, CAST(0.0 AS DOUBLE) AS err
          FROM d WHERE rn = 1
          UNION ALL
          SELECT d.nation, d.day, d.y, d.rn, d.dw,
            $l1 AS l,
            0.5 * ($l1 - r.l) + 0.5 * r.b AS b,
            $sUpd,
            0.5 * (d.y - $l1) + 0.5 * $sdw AS seas,
            d.y - (r.l + r.b + $sdw) AS err
          FROM r JOIN d ON d.nation = r.nation AND d.rn = r.rn + 1)
        SELECT nation, day, y AS cents, round(l, 4) AS level,
          round(b, 4) AS trend, round(seas, 4) AS seasonal,
          round(err, 4) AS forecast_err
        FROM r ORDER BY nation, day"""
  }

  val oracle: Map[String, String] = Map(
    "q111_yule_walker" ->
      s"""WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
              CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS y
            FROM orders GROUP BY 1),
          l AS (SELECT y,
              lag(y, 1) OVER (ORDER BY day) AS y1,
              lag(y, 2) OVER (ORDER BY day) AS y2 FROM d),
          m AS (SELECT CAST(count(*) AS BIGINT) AS n,
              sum(CAST(y AS HUGEINT)) AS s,
              sum(CAST(y AS HUGEINT) * y) AS p0,
              CAST(count(y1) AS BIGINT) AS n1,
              sum(CAST(y AS HUGEINT) * y1) AS p1,
              sum(CASE WHEN y1 IS NOT NULL
                THEN CAST(y AS HUGEINT) END) AS a1,
              sum(CAST(y1 AS HUGEINT)) AS b1,
              CAST(count(y2) AS BIGINT) AS n2,
              sum(CAST(y AS HUGEINT) * y2) AS p2,
              sum(CASE WHEN y2 IS NOT NULL
                THEN CAST(y AS HUGEINT) END) AS a2,
              sum(CAST(y2 AS HUGEINT)) AS b2
            FROM l),
          m2 AS (SELECT m.*, n AS n0, s AS a0, s AS b0 FROM m)
          SELECT n AS n_days, round($ywR1, 4) AS r1,
            round($ywR2, 4) AS r2, round($ywPhi1, 4) AS phi1,
            round($ywPhi2, 4) AS phi2
          FROM m2""",
    "q110_ccf" ->
      s"""WITH daily AS (SELECT CAST(ts AS DATE) AS day,
              CAST(count(*) FILTER (WHERE event_type = 'view')
                AS BIGINT) AS x,
              CAST(count(*) FILTER (WHERE event_type = 'purchase')
                AS BIGINT) AS y
            FROM events WHERE event_type IN ('view', 'purchase')
            GROUP BY 1),
          l AS (SELECT unnest(generate_series(-$ccfMaxLag, $ccfMaxLag))
              AS lag),
          j AS (SELECT l.lag, a.x, b.y
            FROM daily a CROSS JOIN l
            JOIN daily b ON b.day = a.day + CAST(l.lag AS INTEGER)),
          m AS (SELECT lag, CAST(count(*) AS BIGINT) AS n,
              sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
              sum(CAST(x AS HUGEINT) * y) AS sxy,
              sum(CAST(x AS HUGEINT) * x) AS sxx,
              sum(CAST(y AS HUGEINT) * y) AS syy
            FROM j GROUP BY lag)
          SELECT CAST(lag AS INT) AS lag, n AS n_days,
            round(CAST(n * sxy - sx * sy AS DOUBLE)
              / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                   * CAST(n * syy - sy * sy AS DOUBLE)), 4) AS r
          FROM m ORDER BY lag""",
    "q107_rolling_trend" ->
      s"""WITH d AS (SELECT date_diff('day', DATE '1995-01-01',
                CAST(o_orderdate AS DATE)) AS t,
              CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS y
            FROM orders GROUP BY 1),
          w AS (SELECT t,
              CAST(count(*) OVER win AS BIGINT) AS n,
              CAST(sum(t) OVER win AS BIGINT) AS st,
              CAST(sum(y) OVER win AS BIGINT) AS sy,
              CAST(sum(t * y) OVER win AS BIGINT) AS sty,
              CAST(sum(t * t) OVER win AS BIGINT) AS stt
            FROM d
            WINDOW win AS (ORDER BY t RANGE BETWEEN
              ${rollWindowDays - 1} PRECEDING AND CURRENT ROW))
          SELECT CAST(t AS BIGINT) AS day, n AS n_days,
            round((CAST(n AS DOUBLE) * sty - CAST(st AS DOUBLE) * sy)
              / (CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st), 2)
              AS slope_cents,
            round((CAST(sy AS DOUBLE) * stt - CAST(st AS DOUBLE) * sty)
              / (CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st), 2)
              AS icept_cents
          FROM w WHERE n >= $rollMinDays ORDER BY day""",
    "q106_ohlc" ->
      """WITH o AS (SELECT n.n_name AS nation,
                (date_diff('day', DATE '1970-01-01',
                   CAST(o.o_orderdate AS DATE)) // 7) AS week,
                o.o_orderdate, o.o_orderkey,
                CAST(floor(o.o_totalprice * 100) AS BIGINT) AS cents
              FROM orders o
              JOIN customer c ON c.c_custkey = o.o_custkey
              JOIN nation n ON n.n_nationkey = c.c_nationkey),
          r AS (SELECT *,
                  row_number() OVER (PARTITION BY nation, week
                    ORDER BY o_orderdate, o_orderkey) AS rna,
                  row_number() OVER (PARTITION BY nation, week
                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rnd
                FROM o)
          SELECT nation, CAST(week AS BIGINT) AS week,
            CAST(count(*) AS BIGINT) AS n_orders,
            CAST(max(CASE WHEN rna = 1 THEN cents END) AS BIGINT)
              AS open_cents,
            CAST(max(cents) AS BIGINT) AS high_cents,
            CAST(min(cents) AS BIGINT) AS low_cents,
            CAST(max(CASE WHEN rnd = 1 THEN cents END) AS BIGINT)
              AS close_cents,
            CAST(sum(cents) AS BIGINT) AS volume_cents
          FROM r GROUP BY nation, week ORDER BY nation, week""",
    "q86_holt_winters" -> hwOracleSql,
    "q65_holt" ->
      """WITH RECURSIVE d AS (
            SELECT n.n_name AS nation,
              CAST(date_trunc('day', o.o_orderdate) AS DATE) AS day,
              CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS y,
              row_number() OVER (PARTITION BY n.n_name
                ORDER BY CAST(date_trunc('day', o.o_orderdate) AS DATE)) AS rn
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
              JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2),
          r AS (
            SELECT nation, day, y, rn, CAST(y AS DOUBLE) AS l,
              CAST(0.0 AS DOUBLE) AS b, CAST(0.0 AS DOUBLE) AS err
            FROM d WHERE rn = 1
            UNION ALL
            SELECT d.nation, d.day, d.y, d.rn,
              0.5 * d.y + 0.5 * (r.l + r.b),
              0.5 * ((0.5 * d.y + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b,
              d.y - (r.l + r.b)
            FROM r JOIN d ON d.nation = r.nation AND d.rn = r.rn + 1)
          SELECT nation, day, y AS cents, round(l, 4) AS level,
            round(b, 4) AS trend, round(err, 4) AS forecast_err
          FROM r ORDER BY nation, day""",
    "q98_holt_backtest" ->
      s"""WITH RECURSIVE d0 AS (
            SELECT n.n_name AS nation,
              CAST(date_trunc('day', o.o_orderdate) AS DATE) AS day,
              CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS y,
              row_number() OVER (PARTITION BY n.n_name
                ORDER BY CAST(date_trunc('day', o.o_orderdate) AS DATE)) AS rn
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
              JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2),
          mx AS (SELECT nation,
              CAST(count(*) AS BIGINT) - $backtestHoldout AS tn
            FROM d0 GROUP BY nation
            HAVING count(*) > $backtestHoldout),
          d AS (SELECT d0.* FROM d0 JOIN mx USING (nation)
            WHERE d0.rn <= mx.tn),
          r AS (
            SELECT nation, rn, CAST(y AS DOUBLE) AS l,
              CAST(0.0 AS DOUBLE) AS b
            FROM d WHERE rn = 1
            UNION ALL
            SELECT d.nation, d.rn,
              0.5 * d.y + 0.5 * (r.l + r.b),
              0.5 * ((0.5 * d.y + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b
            FROM r JOIN d ON d.nation = r.nation AND d.rn = r.rn + 1),
          fc AS (SELECT r.nation, r.l, r.b
            FROM r JOIN mx ON r.nation = mx.nation AND r.rn = mx.tn),
          ho AS (SELECT d0.nation, d0.rn - mx.tn AS h, d0.y
            FROM d0 JOIN mx USING (nation) WHERE d0.rn > mx.tn),
          er AS (SELECT ho.nation,
              abs(CAST(ho.y AS DOUBLE)
                - (fc.l + CAST(ho.h AS DOUBLE) * fc.b)) AS err,
              CAST(ho.y AS DOUBLE) AS yd
            FROM ho JOIN fc USING (nation)),
          ag AS (SELECT nation,
              sum(CAST(floor(err + 0.5) AS HUGEINT)) AS se,
              sum(CAST(floor(err / yd * 1e6 + 0.5) AS HUGEINT)) AS sa
            FROM er GROUP BY nation)
          SELECT ag.nation, mx.tn AS n_train,
            CAST($backtestHoldout AS BIGINT) AS n_test,
            round(CAST(se AS DOUBLE) / $backtestHoldout.0, 4) AS mae_cents,
            round(CAST(sa AS DOUBLE) / ($backtestHoldout.0 * 1e6), 4)
              AS mape
          FROM ag JOIN mx USING (nation) ORDER BY ag.nation""")
}
