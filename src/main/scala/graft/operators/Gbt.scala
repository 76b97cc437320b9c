package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.CacheScope.ScopedPersist
import graft.sources.Tables

/** D281: gradient-boosted stumps by histogram split search — the GBT
  * composition the depth-k trainer (D279) opened: T rounds of
  * least-squares stumps fit to the RESIDUALS of the running
  * prediction, learning rate ½ (Friedman 2001, "Greedy Function
  * Approximation"; the histogram formulation is the XGBoost-`hist`
  * architecture again, arXiv:1603.02754 §3.3).
  *
  * Exactness discipline (what makes this hash-replayable in DuckDB
  * when textbook GBT is float soup): the label lives on a PER-MILLE
  * integer grid (y·1000) and the running prediction F is an INTEGER
  * on that grid, so per-bin residual sums Σr = p·1000 − cnt·F and
  * squared sums Σr² are exact longs off the SAME domain-bounded bin
  * histogram every round. Leaf values are floor-means computed by
  * SHIFTED nonnegative integer division ((Σr + n·S) div n − S with
  * S = [[gbtShift]]), so truncating and flooring engines agree; the
  * learning-rate halving uses the same shift. Only the per-candidate
  * SSE criterion runs in doubles — ONE shared IEEE expression
  * ([[sseSql]]) interpolated into both engines, operands being
  * exactly-representable longs — and the reported per-round
  * `sse_after` is again an exact integer.
  *
  * Scale shape: per round, one partial-aggregated pass over the ~1.1k
  * bin histogram (value-domain bounded, never data-sized), one
  * unpartitioned cumulative window over that bin frame, a
  * TakeOrdered-1 argmin, and a 1-row collect — the p17/p19/p20
  * discipline, T times. The routing/prediction expression is a
  * literal when-chain (pure codegen, no join).
  */
object Gbt {

  /** Boosting rounds for p21. */
  val gbtRounds = 3

  /** Shift making every division numerator nonnegative: |residual| is
    * bounded by 1000 + |F|, and the worst-case |F| drift over three
    * ½-rate rounds stays far inside this margin (the engine checks at
    * division time and fails loudly rather than ever dividing a
    * negative — where floor and truncation would disagree). */
  val gbtShift = 8000L

  /** Most boosting rounds the SHIFT arithmetic supports (the ±S
    * nonnegative-division margin, [[shiftFor]]). NOTE this is not by
    * itself a Long-overflow guarantee for the squared-residual census:
    * at the 25-round worst-case drift (~5.0e7) each row's rr² can
    * reach ~2.5e15, so ~3.6k rows would already saturate Long.MaxValue
    * (round-14 advisory — the old comment claimed int-row-count
    * safety). The ROW-COUNT-AWARE envelope is enforced at fit time by
    * [[requireSseEnvelope]]: at the default 3 rounds the worst-case
    * |residual| is ≤ 8750, admitting ~1.2e11 rows — any realistic
    * corpus — and the admissible row count shrinks as 1.5^-2T. */
  val gbtMaxRounds = 25

  /** Fail-fast guard that the exact-integer Σrr² census cannot wrap
    * Long at this (row count, rounds) pair — a wrapped (non-ANSI) sum
    * would silently mis-select splits, unlike the loud drift require
    * (round-14 advisory). Worst-case |F| drift after T ½-rate rounds
    * is < 1000 + 2000·1.5^T (each round's adjustment is bounded by
    * half the residual bound), so |rr| = |y·1000 − F| < 2000·1.5^T +
    * 3000. */
  private[graft] def requireSseEnvelope(n: Long, rounds: Int): Unit = {
    val rrBound = 3000.0 + 2000.0 * math.pow(1.5, rounds)
    require(n.toDouble * rrBound * rrBound < Long.MaxValue.toDouble * 0.98,
      s"exact-integer SSE census could overflow Long: $n rows x " +
        s"$rounds rounds (worst-case |residual| ~ ${rrBound.toLong}) — " +
        "reduce the round count")
  }

  /** Round-count-scaled shift (round-13 advisory: the fixed 8000 was
    * sized for 3 rounds; a user-set round count past ~5 could trip the
    * drift require even though the arithmetic has headroom). The leaf
    * math is shift-INVARIANT for any even shift large enough —
    * (sr + n·S)/n − S = floor(sr/n) and, for even S,
    * (v + S)/2 − S/2 = floor(v/2) — so growing S with the worst-case
    * drift bound |F_T| ≤ 2000·1.5^T − 1000 changes no fitted value;
    * ≤ 3 rounds keep the historical 8000 (p21's oracle text). */
  def shiftFor(rounds: Int): Long = {
    require(rounds <= gbtMaxRounds,
      s"boosting rounds $rounds exceed the exact-integer envelope " +
        s"($gbtMaxRounds): the squared-residual census could overflow Long")
    if (rounds <= 3) gbtShift
    else {
      val bound = 1000.0 + 2000.0 * math.pow(1.5, rounds)
      (math.ceil(bound / 2.0).toLong + 1L) * 2L // even, with margin
    }
  }

  private def d(x: String) = s"CAST($x AS DOUBLE)"

  /** Split SSE over columns (srrl, srl, nl, srrr, srr2, nr) — the one
    * IEEE tree both engines evaluate (shared with the regression
    * trainers in [[RegTree]]). */
  private[operators] val sseSql =
    s"""((${d("srrl")} - ${d("srl")} * ${d("srl")} / ${d("nl")})
        + (${d("srrr")} - ${d("srr2")} * ${d("srr2")} / ${d("nr")}))"""

  /** One fitted boosting round: the chosen feature (index into the
    * trainer's featureCols; always 0 for the single-feature trainer),
    * threshold, child populations, leaf values (per-mille residual
    * floor-means), and the exact integer SSE after applying the
    * ½-rate update. */
  final case class GbtRound(round: Int, thresholdBin: Long, nLeft: Long,
      nRight: Long, vLeft: Long, vRight: Long, sseAfter: Long,
      feature: Int = 0)

  /** ½-rate per-round prediction adjustments derived from a fitted
    * round's leaf values — floor(v/2) via the shifted division, the
    * exact arithmetic [[fitGbt]] trains with. */
  def adjustments(r: GbtRound): (Long, Long) = {
    // any even shift ≥ |v| yields the same floor(v/2) — size it to the
    // round's own leaf values so rounds fitted with a larger
    // [[shiftFor]] (maxIter > 3) replay exactly
    val need = math.max(math.abs(r.vLeft), math.abs(r.vRight))
    val S = math.max(gbtShift, (need / 2L + 1L) * 2L)
    ((r.vLeft + S) / 2L - S / 2L, (r.vRight + S) / 2L - S / 2L)
  }

  /** Fit T boosted stumps over a (bin, cnt, p) histogram; returns the
    * base (round-0 global floor-mean) prediction and the fitted
    * rounds. Per round: residual census under the CURRENT
    * literal-expression prediction, cumulative-window split search,
    * 1-row argmin collect, exact leaf math driver-side, exact integer
    * SSE census. */
  private[graft] def fitGbt(hist: DataFrame,
      rounds: Int): (Long, Seq[GbtRound]) = {
    import hist.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val S = shiftFor(rounds)
    // F0 = global mean label on the per-mille grid (floor)
    // null bins (a null feature value) would census into the LEFT
    // cumulative (nulls sort first) while `bin <= thr` routing sends
    // those rows RIGHT — reject them up front rather than fit a model
    // whose censuses disagree with its own routing (round-14 advisory)
    // null-bin fence + totals in ONE aggregate (round-15: the
    // separate isEmpty pre-check was its own job)
    val t0 = hist.agg(sum($"cnt"), sum($"p"),
      count(when($"bin".isNull, 1))).head()
    require(t0.getLong(2) == 0L,
      "null feature bins in the GBT design: feature columns must be " +
        "non-null (filter or impute before fitting)")
    val nAll = t0.getLong(0)
    val posAll = t0.getLong(1)
    require(nAll > 0, "empty histogram")
    requireSseEnvelope(nAll, rounds)
    val f0 = posAll * 1000L / nAll
    var decisions = Vector.empty[(Long, Long, Long)] // (thr, dl, dr)
    var out = Vector.empty[GbtRound]
    // round t's census already sums rr^2 under the CURRENT model —
    // exactly round t-1's post-update SSE — so each round's collect
    // closes the previous round and only the last pays an SSE pass
    var pending: Option[GbtRound] = None
    var t = 1
    var open = true
    while (t <= rounds && open) {
      val fCol: Column = decisions.foldLeft(lit(f0)) {
        case (f, (thr, dl, dr)) =>
          f + when($"bin" <= lit(thr), lit(dl)).otherwise(lit(dr))
      }
      val res = hist.withColumn("F", fCol)
        .withColumn("sr", $"p" * 1000L - $"cnt" * $"F")
        .withColumn("srr", $"p" * (lit(1000L) - $"F") * (lit(1000L) - $"F")
          + ($"cnt" - $"p") * $"F" * $"F")
      val tot = res.agg(sum($"cnt").as("n"), sum($"sr").as("srt"),
        sum($"srr").as("srrt"))
      val w = Window.orderBy($"bin")
      val bestRows = res
        .select($"bin", sum($"cnt").over(w).as("nl"),
          sum($"sr").over(w).as("srl"), sum($"srr").over(w).as("srrl"))
        .crossJoin(broadcast(tot))
        .filter($"nl" < $"n")
        .withColumn("nr", $"n" - $"nl")
        .withColumn("srr2", $"srt" - $"srl")
        .withColumn("srrr", $"srrt" - $"srrl")
        .withColumn("sse_raw", expr(sseSql))
        .orderBy($"sse_raw", $"bin").limit(1)
        .select($"bin", $"nl", $"srl", $"nr", $"srr2", $"srrt")
        .collect()
      if (bestRows.isEmpty) {
        // single-bin histogram: no candidate leaves both sides
        // populated — stop boosting like fitTreeSplits stops splitting
        // (round-13 advisory: .head() here crashed context-free)
        open = false
      } else {
        val best = bestRows.head
        pending.foreach(pr => out :+= pr.copy(sseAfter = best.getLong(5)))
        val (thr, nl, srl, nr, srR) = (best.getLong(0), best.getLong(1),
          best.getLong(2), best.getLong(3), best.getLong(4))
        // shifted nonnegative floor-division (truncation == floor here;
        // a negative numerator means the drift bound was violated — fail
        // loudly, never divide wrong)
        require(srl + nl * S >= 0 && srR + nr * S >= 0,
          s"residual drift exceeded the ±$S shift at round $t")
        val vl = (srl + nl * S) / nl - S
        val vr = (srR + nr * S) / nr - S
        val dl = (vl + S) / 2L - S / 2L // = floor(vl / 2), both engines
        val dr = (vr + S) / 2L - S / 2L
        decisions :+= ((thr, dl, dr))
        pending = Some(GbtRound(t, thr, nl, nr, vl, vr, -1L))
        t += 1
      }
    }
    pending.foreach { pr =>
      val fAfter: Column = decisions.foldLeft(lit(f0)) {
        case (f, (th, l, r)) =>
          f + when($"bin" <= lit(th), lit(l)).otherwise(lit(r))
      }
      val sseAfter = hist.withColumn("F", fAfter)
        .agg(sum($"p" * (lit(1000L) - $"F") * (lit(1000L) - $"F")
          + ($"cnt" - $"p") * $"F" * $"F"))
        .head().getLong(0)
      out :+= pr.copy(sseAfter = sseAfter)
    }
    (f0, out)
  }

  /** D290: multi-feature gradient-boosted stumps — [[fitGbt]]'s split
    * search generalized to argmin over d per-feature residual
    * histograms per round (the full XGBoost-`hist` round,
    * arXiv:1603.02754 §3.3): the residual grid stays exact integers
    * (rr = y·1000 − F per row, Σrr and Σrr² exact longs per (feature,
    * bin) cell), each round is ONE routed pass over the data
    * (posexplode over the binned features, partial-aggregated to a
    * domain-bounded histogram), and the winner is chosen by the
    * shared-IEEE SSE criterion with tie order sse → feature → bin.
    * Unlike the single-feature form, the per-row F depends on earlier
    * rounds' features, so each round must re-census the rows — the
    * cost model every hist GBT pays. */
  private[graft] def fitGbtMulti(design: DataFrame,
      featureCols: Seq[String], rounds: Int): (Long, Seq[GbtRound]) = {
    import design.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    require(featureCols.nonEmpty, "need at least one feature column")
    val S = shiftFor(rounds)
    // null-bin fence (they'd census LEFT in the cumulative window but
    // route RIGHT at scoring — round-14 advisory) + totals in ONE
    // aggregate (round-15: the separate isEmpty pre-check was a full
    // pass)
    val t0 = design.agg(count(lit(1)), sum($"y"),
      count(when(featureCols.map(col(_).isNull).reduce(_ || _), 1))).head()
    require(t0.getLong(2) == 0L,
      "null feature bins in the GBT design: feature columns must be " +
        "non-null (filter or impute before fitting)")
    val nAll = t0.getLong(0)
    require(nAll > 0, "empty design")
    requireSseEnvelope(nAll, rounds)
    val posAll = t0.getLong(1)
    val f0 = posAll * 1000L / nAll
    var decisions = Vector.empty[(Int, Long, Long, Long)] // (ft, thr, dl, dr)
    var out = Vector.empty[GbtRound]
    // each round's collect closes the previous round (its census Σrr²
    // IS the previous round's post-update SSE); only the last round
    // pays a dedicated SSE pass (round-15)
    var pending: Option[GbtRound] = None
    var t = 1
    var open = true
    while (t <= rounds && open) {
      val fCol: Column = decisions.foldLeft(lit(f0)) {
        case (f, (ft, thr, dl, dr)) =>
          f + when(col(featureCols(ft)) <= lit(thr), lit(dl))
            .otherwise(lit(dr))
      }
      // exact per-row residual on the per-mille grid, censused per
      // (feature, bin); cached: totals + candidates both read it
      val hist = design.withColumn("F", fCol)
        .withColumn("rr", $"y" * 1000L - $"F")
        .select($"rr", posexplode(array(featureCols.map(col): _*))
          .as(Seq("feature", "bin")))
        .groupBy($"feature", $"bin")
        .agg(count(lit(1)).as("cnt"), sum($"rr").as("sr"),
          sum($"rr" * $"rr").as("srr"))
        .scopedPersist()
      val tot = hist.filter($"feature" === lit(0))
        .agg(sum($"cnt").as("n"), sum($"sr").as("srt"),
          sum($"srr").as("srrt"))
      val w = Window.partitionBy($"feature").orderBy($"bin")
      val bestRows = hist
        .select($"feature", $"bin", sum($"cnt").over(w).as("nl"),
          sum($"sr").over(w).as("srl"), sum($"srr").over(w).as("srrl"))
        .crossJoin(broadcast(tot))
        .filter($"nl" < $"n")
        .withColumn("nr", $"n" - $"nl")
        .withColumn("srr2", $"srt" - $"srl")
        .withColumn("srrr", $"srrt" - $"srrl")
        .withColumn("sse_raw", expr(sseSql))
        .orderBy($"sse_raw", $"feature", $"bin").limit(1)
        .select($"feature", $"bin", $"nl", $"srl", $"nr", $"srr2", $"srrt")
        .collect()
      if (bestRows.isEmpty) open = false
      else {
        val best = bestRows.head
        pending.foreach(pr => out :+= pr.copy(sseAfter = best.getLong(6)))
        val (ft, thr, nl, srl, nr, srR) = (best.getInt(0), best.getLong(1),
          best.getLong(2), best.getLong(3), best.getLong(4),
          best.getLong(5))
        require(srl + nl * S >= 0 && srR + nr * S >= 0,
          s"residual drift exceeded the ±$S shift at round $t")
        val vl = (srl + nl * S) / nl - S
        val vr = (srR + nr * S) / nr - S
        val dl = (vl + S) / 2L - S / 2L
        val dr = (vr + S) / 2L - S / 2L
        decisions :+= ((ft, thr, dl, dr))
        pending = Some(GbtRound(t, thr, nl, nr, vl, vr, -1L, feature = ft))
        t += 1
      }
    }
    pending.foreach { pr =>
      val fAfter: Column = decisions.foldLeft(lit(f0)) {
        case (f, (ff, th, l, r)) =>
          f + when(col(featureCols(ff)) <= lit(th), lit(l))
            .otherwise(lit(r))
      }
      // exact integer SSE: y ∈ {0,1} makes (1000y − F)² the census
      val sseAfter = design.withColumn("F", fAfter)
        .agg(sum(($"y" * 1000L - $"F") * ($"y" * 1000L - $"F")))
        .head().getLong(0)
      out :+= pr.copy(sseAfter = sseAfter)
    }
    (f0, out)
  }

  /** D290 query binding: three multi-feature boosted rounds on the p22
    * design (price/quantity/discount bins → returnflag), every output
    * column an exact integer including the chosen feature. */
  def p23GbtMulti(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val design = Stump.multiDesign(spark, dir).scopedPersist()
    fitGbtMulti(design, Stump.multiFeatures, gbtRounds)._2
      .map(r => (r.round.toLong, r.feature.toLong, r.thresholdBin,
        r.nLeft, r.nRight, r.vLeft, r.vRight, r.sseAfter))
      .toDF("round", "feature", "threshold_bin", "n_left", "n_right",
        "v_left", "v_right", "sse_after")
      .orderBy($"round")
  }

  /** p21: three boosted stump rounds on the p17 design (price bins →
    * returnflag), every output column an exact integer. */
  def p21Gbt3(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hist = Tables.lineitem(spark, dir).select(
        floor($"l_extendedprice" / 100.0).cast("long").as("bin"),
        ($"l_returnflag" === "R").cast("long").as("y"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("cnt"), sum($"y").as("p"))
      .scopedPersist()
    fitGbt(hist, gbtRounds)._2
      .map(r => (r.round.toLong, r.thresholdBin, r.nLeft, r.nRight,
        r.vLeft, r.vRight, r.sseAfter))
      .toDF("round", "threshold_bin", "n_left", "n_right",
        "v_left", "v_right", "sse_after")
      .orderBy($"round")
  }

  /** One oracle boosting-round block over prediction CTE h{t-1}:
    * residual census → cumulative → candidates → 1-row best (leaf
    * values by the same shifted floor-division) → updated h{t} →
    * exact SSE e{t}. */
  private def oracleRound(t: Int): String = {
    val S = gbtShift
    val h = s"h${t - 1}"
    s"""s$t AS (SELECT bin, cnt, p, F,
            p * 1000 - cnt * F AS sr,
            p * (1000 - F) * (1000 - F) + (cnt - p) * F * F AS srr
          FROM $h),
        c$t AS (SELECT bin,
            CAST(sum(cnt) OVER (ORDER BY bin) AS BIGINT) AS nl,
            CAST(sum(sr) OVER (ORDER BY bin) AS BIGINT) AS srl,
            CAST(sum(srr) OVER (ORDER BY bin) AS BIGINT) AS srrl
          FROM s$t),
        t$t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
            CAST(sum(sr) AS BIGINT) AS srt,
            CAST(sum(srr) AS BIGINT) AS srrt FROM s$t),
        f$t AS (SELECT c$t.bin, c$t.nl, c$t.srl, c$t.srrl,
            t$t.n - c$t.nl AS nr, t$t.srt - c$t.srl AS srr2,
            t$t.srrt - c$t.srrl AS srrr
          FROM c$t CROSS JOIN t$t WHERE c$t.nl < t$t.n),
        b$t AS (SELECT bin AS thr, nl, nr,
            ((srl + nl * $S) // nl) - $S AS vl,
            ((srr2 + nr * $S) // nr) - $S AS vr,
            row_number() OVER (ORDER BY $sseSql, bin) AS rk
          FROM f$t),
        sb$t AS (SELECT thr, nl, nr, vl, vr,
            ((vl + $S) // 2) - ${S / 2} AS dl,
            ((vr + $S) // 2) - ${S / 2} AS dr
          FROM b$t WHERE rk = 1),
        h$t AS (SELECT bin, cnt, p,
            F + CASE WHEN bin <= sb$t.thr THEN sb$t.dl ELSE sb$t.dr END
              AS F
          FROM $h CROSS JOIN sb$t),
        e$t AS (SELECT CAST(sum(p * (1000 - F) * (1000 - F)
              + (cnt - p) * F * F) AS BIGINT) AS sse FROM h$t)"""
  }

  /** One multi-feature oracle boosting-round block over row-level
    * prediction CTE hg{t-1}: per-row residual, per-(feature, bin)
    * censuses via UNION ALL, cumulative scan, shared-IEEE argmin
    * (sse → feature → bin), shifted floor-division leaf math, routed
    * prediction update, exact SSE. */
  private def oracleRoundMulti(t: Int): String = {
    val S = shiftFor(gbtRounds)
    val h = s"hg${t - 1}"
    val perFeature = graft.operators.Stump.multiFeatures.zipWithIndex
      .map { case (f, j) =>
        s"""SELECT $j AS feature, $f AS bin,
              CAST(count(*) AS BIGINT) AS cnt,
              CAST(sum(rr) AS BIGINT) AS sr,
              CAST(sum(rr * rr) AS BIGINT) AS srr
            FROM sg$t GROUP BY $f"""
      }.mkString("\n          UNION ALL ")
    s"""sg$t AS (SELECT f0, f1, f2, y, F, y * 1000 - F AS rr FROM $h),
        hr$t AS ($perFeature),
        tr$t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
            CAST(sum(sr) AS BIGINT) AS srt,
            CAST(sum(srr) AS BIGINT) AS srrt
          FROM (SELECT cnt, sr, srr FROM hr$t WHERE feature = 0)),
        cr$t AS (SELECT feature, bin,
            CAST(sum(cnt) OVER (PARTITION BY feature ORDER BY bin)
              AS BIGINT) AS nl,
            CAST(sum(sr) OVER (PARTITION BY feature ORDER BY bin)
              AS BIGINT) AS srl,
            CAST(sum(srr) OVER (PARTITION BY feature ORDER BY bin)
              AS BIGINT) AS srrl
          FROM hr$t),
        fr$t AS (SELECT c.feature, c.bin, c.nl, c.srl, c.srrl,
            t.n - c.nl AS nr, t.srt - c.srl AS srr2,
            t.srrt - c.srrl AS srrr
          FROM cr$t c CROSS JOIN tr$t t WHERE c.nl < t.n),
        br$t AS (SELECT feature, bin AS thr, nl, nr,
            ((srl + nl * $S) // nl) - $S AS vl,
            ((srr2 + nr * $S) // nr) - $S AS vr,
            row_number() OVER (ORDER BY $sseSql, feature, bin) AS rk
          FROM fr$t),
        sr$t AS (SELECT feature, thr, nl, nr, vl, vr,
            ((vl + $S) // 2) - ${S / 2} AS dl,
            ((vr + $S) // 2) - ${S / 2} AS dr
          FROM br$t WHERE rk = 1),
        hg$t AS (SELECT h.f0, h.f1, h.f2, h.y,
            h.F + CASE WHEN (CASE s.feature WHEN 0 THEN h.f0
                WHEN 1 THEN h.f1 ELSE h.f2 END) <= s.thr
              THEN s.dl ELSE s.dr END AS F
          FROM $h h CROSS JOIN sr$t s),
        er$t AS (SELECT CAST(sum((y * 1000 - F) * (y * 1000 - F))
            AS BIGINT) AS sse FROM hg$t)"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p21_gbt3" -> p21Gbt3,
    "p23_gbt_multi" -> p23GbtMulti)

  val oracle: Map[String, String] = Map(
    "p23_gbt_multi" ->
      s"""WITH r AS (SELECT
              CAST(floor(l_extendedprice / 100.0) AS BIGINT) AS f0,
              CAST(l_quantity AS BIGINT) AS f1,
              CAST(floor(l_discount * 100.0) AS BIGINT) AS f2,
              CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
            FROM lineitem),
          g AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(y) AS BIGINT) AS pos FROM r),
          hg0 AS (SELECT f0, f1, f2, y, (g.pos * 1000) // g.n AS F
            FROM r CROSS JOIN g),
          ${(1 to gbtRounds).map(oracleRoundMulti).mkString(",\n          ")}
          ${(1 to gbtRounds).map(t =>
            s"""SELECT CAST($t AS BIGINT) AS round,
                CAST(feature AS BIGINT) AS feature, thr AS threshold_bin,
                nl AS n_left, nr AS n_right, vl AS v_left, vr AS v_right,
                (SELECT sse FROM er$t) AS sse_after FROM sr$t""")
            .mkString("\n          UNION ALL\n          ")}
          ORDER BY round""",
    "p21_gbt3" ->
      s"""WITH r AS (SELECT CAST(floor(l_extendedprice / 100.0) AS BIGINT)
              AS bin,
              CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
            FROM lineitem),
          hh AS (SELECT bin, CAST(count(*) AS BIGINT) AS cnt,
              CAST(sum(y) AS BIGINT) AS p
            FROM r GROUP BY bin),
          g AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
              CAST(sum(p) AS BIGINT) AS pos FROM hh),
          h0 AS (SELECT bin, cnt, p, (g.pos * 1000) // g.n AS F
            FROM hh CROSS JOIN g),
          ${(1 to gbtRounds).map(oracleRound).mkString(",\n          ")}
          ${(1 to gbtRounds).map(t =>
            s"""SELECT CAST($t AS BIGINT) AS round, thr AS threshold_bin,
                nl AS n_left, nr AS n_right, vl AS v_left, vr AS v_right,
                (SELECT sse FROM e$t) AS sse_after FROM sb$t""")
            .mkString("\n          UNION ALL\n          ")}
          ORDER BY round""")
}
