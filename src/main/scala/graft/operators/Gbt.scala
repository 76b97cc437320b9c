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

  /** Most boosting rounds the exact-integer arithmetic supports: the
    * worst-case drift envelope at 25 rounds (~5.0e7) keeps the squared
    * residual census inside Long for any corpus that fits an int row
    * count — requested rounds past this fail loudly at fit time (and
    * [[graft.ml.feature.GraftGBT]] validates maxIter against it). */
  val gbtMaxRounds = 25

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
    * IEEE tree both engines evaluate. */
  private val sseSql =
    s"""((${d("srrl")} - ${d("srl")} * ${d("srl")} / ${d("nl")})
        + (${d("srrr")} - ${d("srr2")} * ${d("srr2")} / ${d("nr")}))"""

  /** One fitted boosting round: threshold, child populations, leaf
    * values (per-mille residual floor-means), and the exact integer
    * SSE after applying the ½-rate update. */
  final case class GbtRound(round: Int, thresholdBin: Long, nLeft: Long,
      nRight: Long, vLeft: Long, vRight: Long, sseAfter: Long)

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
    val t0 = hist.agg(sum($"cnt"), sum($"p")).head()
    val nAll = t0.getLong(0)
    val posAll = t0.getLong(1)
    require(nAll > 0, "empty histogram")
    val f0 = posAll * 1000L / nAll
    var decisions = Vector.empty[(Long, Long, Long)] // (thr, dl, dr)
    var out = Vector.empty[GbtRound]
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
        .select($"bin", $"nl", $"srl", $"nr", $"srr2")
        .collect()
      if (bestRows.isEmpty) {
        // single-bin histogram: no candidate leaves both sides
        // populated — stop boosting like fitTreeSplits stops splitting
        // (round-13 advisory: .head() here crashed context-free)
        open = false
      } else {
        val best = bestRows.head
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
        val fAfter: Column = decisions.foldLeft(lit(f0)) {
          case (f, (th, l, r)) =>
            f + when($"bin" <= lit(th), lit(l)).otherwise(lit(r))
        }
        val sseAfter = hist.withColumn("F", fAfter)
          .agg(sum($"p" * (lit(1000L) - $"F") * (lit(1000L) - $"F")
            + ($"cnt" - $"p") * $"F" * $"F"))
          .head().getLong(0)
        out :+= GbtRound(t, thr, nl, nr, vl, vr, sseAfter)
        t += 1
      }
    }
    (f0, out)
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p21_gbt3" -> p21Gbt3)

  val oracle: Map[String, String] = Map(
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
