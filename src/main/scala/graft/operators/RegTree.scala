package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.CacheScope.ScopedPersist
import graft.sources.Tables

/** D294/D295: REGRESSION trees and GBT — squared-error (variance-
  * reduction) split search over automatically QUANTILE-BINNED features
  * (round-14 verdict ask #8, completing the XGBoost-`hist` story:
  * arXiv:1603.02754 §3.1 trains on quantile-sketch candidate splits,
  * §3.3 on binned histograms; the Gini trainers in [[Stump]]/[[Gbt]]
  * classify, these regress).
  *
  * Automatic binning: each feature's bin edges are its EXACT k/B
  * quantiles from [[AdvancedSql.exactPercentiles]] (q38's two-phase
  * histogram+refinement — never buffers the value set), folded into
  * the design as a literal when-chain. Interpolation is bit-identical
  * to DuckDB's `quantile_cont` (the q44 precedent, spec-guarded), so
  * bin membership is deterministic cross-engine.
  *
  * Exactness discipline (the p21/p23 integer-grid rules): the label
  * lives on an integer grid (quantity units for the tree, quantity
  * per-cent for the GBT), so every per-(node, feature, bin) census —
  * count, Σy, Σy² — and every cumulative/complement is an exact Long;
  * the per-candidate SSE criterion is ONE shared IEEE expression
  * interpolated into both engines; GBT leaf values use the shifted
  * nonnegative floor-division with a shift sized to the DECLARED grid
  * bound (so the oracle's constant and the engine's agree by
  * construction, not by data luck).
  *
  * Scale shape: per level/round, ONE routed pass over the data
  * partial-aggregates to a histogram bounded by 2^depth × #features ×
  * #bins (the bins now GUARANTEED small — that is what quantile
  * binning buys over raw value domains), one bounded cumulative
  * window, a TakeOrdered-1 argmin, and a ≤ 2^depth-row collect.
  */
object RegTree {

  private def d(x: String) = s"CAST($x AS DOUBLE)"

  /** Split SSE over columns (syyl, syl, nl, syyr, syr2, nr). */
  private[operators] val regSseSql =
    s"""((${d("syyl")} - ${d("syl")} * ${d("syl")} / ${d("nl")})
        + (${d("syyr")} - ${d("syr2")} * ${d("syr2")} / ${d("nr")}))"""

  /** Parent (unsplit) SSE over columns (syyt, syt, n). */
  private[operators] val parentSseSql =
    s"""(${d("syyt")} - ${d("syt")} * ${d("syt")} / ${d("n")})"""

  /** Bin a value column by quantile edges: bin = #edges strictly below
    * the value (a literal when-chain — pure codegen; ties go LEFT,
    * `v <= edge`). */
  private[graft] def quantileBin(c: Column, edges: Seq[Double]): Column = {
    val first = when(c <= lit(edges.head), lit(0L))
    edges.tail.zipWithIndex.foldLeft(first) {
      case (w, (e, i)) => w.when(c <= lit(e), lit(i + 1L))
    }.otherwise(lit(edges.length.toLong))
  }

  /** Fail-fast Long-overflow envelope for the Σy² census. */
  private def requireRegEnvelope(n: Long, bound: Double): Unit =
    require(n.toDouble * bound * bound < Long.MaxValue.toDouble * 0.98,
      s"exact-integer SSE census could overflow Long: $n rows with " +
        s"|label| bound $bound")

  /** Depth-k multi-feature REGRESSION tree by histogram split search —
    * [[Stump.fitTreeSplitsMulti]] with variance-reduction instead of
    * Gini: per level, one routed pass censuses (cnt, Σy, Σy²) per
    * (node, feature, bin); each node's split is the argmin of the
    * shared-IEEE split SSE across all feature histograms (tie order
    * sse → feature → bin). Returns [[Stump.TreeSplit]] rows with SUM
    * semantics: `pos`/`pl`/`pr` carry Σy (so a leaf's fitted value is
    * the exact mean pl/nl — the same field the Gini tree's leaf rate
    * reads, which is what lets [[graft.ml.feature.GraftTree]] serve
    * both losses with one model shape). `y` must be a non-null
    * integer-grid label. */
  private[graft] def fitRegTreeSplitsMulti(design: DataFrame,
      featureCols: Seq[String], maxDepth: Int): Seq[Stump.TreeSplit] = {
    import design.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    require(maxDepth >= 1, "maxDepth must be >= 1")
    require(featureCols.nonEmpty, "need at least one feature column")
    // the null-bin fence and the envelope scan share ONE aggregate
    // (round-15: the separate isEmpty pre-check was a full pass)
    val t0 = design.agg(count(lit(1)), max(abs($"y")),
      count(when(featureCols.map(col(_).isNull).reduce(_ || _), 1))).head()
    require(t0.getLong(2) == 0L,
      "null feature bins in the tree design: feature columns must be " +
        "non-null (filter or impute before fitting)")
    if (t0.getLong(0) == 0L) return Seq.empty
    requireRegEnvelope(t0.getLong(0), math.max(t0.getLong(1).toDouble, 1.0))
    var splits = Vector.empty[Stump.TreeSplit]
    var dep = 0
    var open = true
    while (dep < maxDepth && open) {
      val dec = splits.map(s => s.node -> (s.feature, s.thresholdBin)).toMap
      def walk(path: String, lvl: Int): Column =
        if (lvl == dep) lit(path)
        else dec.get(path) match {
          case None => lit(path)
          case Some((f, t)) =>
            when(col(featureCols(f)) <= lit(t), walk(path + "L", lvl + 1))
              .otherwise(walk(path + "R", lvl + 1))
        }
      val hist = design.withColumn("node", walk("", 0))
        .select($"node", $"y", posexplode(array(featureCols.map(col): _*))
          .as(Seq("feature", "bin")))
        .groupBy($"node", $"feature", $"bin")
        .agg(count(lit(1)).as("cnt"), sum($"y").as("sy"),
          sum($"y" * $"y").as("syy"))
        .scopedPersist()
      val tot = hist.filter($"feature" === lit(0))
        .groupBy($"node").agg(sum($"cnt").as("n"), sum($"sy").as("syt"),
          sum($"syy").as("syyt"))
      val w = Window.partitionBy($"node", $"feature").orderBy($"bin")
      val aw = Window.partitionBy($"node")
        .orderBy($"sse_raw", $"feature", $"bin")
      val lvl = hist
        .select($"node", $"feature", $"bin",
          sum($"cnt").over(w).as("nl"), sum($"sy").over(w).as("syl"),
          sum($"syy").over(w).as("syyl"))
        .join(broadcast(tot), "node")
        .filter($"nl" < $"n")
        .withColumn("nr", $"n" - $"nl")
        .withColumn("syr2", $"syt" - $"syl")
        .withColumn("syyr", $"syyt" - $"syyl")
        .withColumn("sse_raw", expr(regSseSql))
        .withColumn("pg_raw", expr(parentSseSql))
        .filter(length($"node") === dep)
        .withColumn("rk", row_number().over(aw)).filter($"rk" === 1)
        .select($"node", $"feature", $"bin", $"n", $"syt", $"nl", $"syl",
          $"nr", $"syr2", $"sse_raw", $"pg_raw")
        .collect() // ≤ 2^depth rows — the bounded split-decision table
      if (lvl.isEmpty) open = false
      else {
        splits ++= lvl.map(r => Stump.TreeSplit(r.getString(0), dep,
          r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getLong(8), r.getDouble(9),
          r.getDouble(10), feature = r.getInt(1)))
        dep += 1
      }
    }
    splits
  }

  /** Round-count-scaled shift for an arbitrary integer label grid:
    * worst-case |F| drift after T ½-rate rounds is
    * < gridBound·(1 + 2·1.5^T) (the [[Gbt.shiftFor]] bound with 1000
    * generalized to the declared grid bound); even, with margin. */
  private[graft] def regShiftFor(gridBound: Long, rounds: Int): Long = {
    val bound = gridBound.toDouble * (1.0 + 2.0 * math.pow(1.5, rounds))
    (math.ceil(bound / 2.0).toLong + 1L) * 2L
  }

  /** Multi-feature REGRESSION gradient-boosted stumps —
    * [[Gbt.fitGbtMulti]] on a CONTINUOUS integer-grid label `yg`
    * (|yg| ≤ gridBound, declared so the shift — and the oracle's
    * replay of it — is a constant, not a data artifact): per round,
    * residuals rr = yg − F census exactly per (feature, bin), the
    * argmin rides the shared-IEEE SSE (tie sse → feature → bin), leaf
    * values are shifted floor-division means, the ½ learning rate the
    * same even-shift halving. Returns (f0, rounds) with f0 the global
    * floor-mean base prediction. */
  private[graft] def fitRegGbtMulti(design: DataFrame,
      featureCols: Seq[String], rounds: Int,
      gridBound: Long): (Long, Seq[Gbt.GbtRound]) = {
    import design.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    require(featureCols.nonEmpty, "need at least one feature column")
    require(gridBound >= 1L, "gridBound must be >= 1")
    val S = regShiftFor(gridBound, rounds)
    // null-bin fence + label scan in ONE aggregate (round-15)
    val t0 = design.agg(count(lit(1)), sum($"yg"), max(abs($"yg")),
      count(when(featureCols.map(col(_).isNull).reduce(_ || _), 1))).head()
    require(t0.getLong(3) == 0L,
      "null feature bins in the GBT design: feature columns must be " +
        "non-null (filter or impute before fitting)")
    val nAll = t0.getLong(0)
    require(nAll > 0, "empty design")
    require(t0.getLong(2) <= gridBound,
      s"label grid exceeds the declared bound: |yg| max ${t0.getLong(2)} " +
        s"> $gridBound")
    requireRegEnvelope(nAll,
      gridBound.toDouble * (1.0 + 2.0 * math.pow(1.5, rounds)))
    val f0 = Math.floorDiv(t0.getLong(1), nAll)
    var decisions = Vector.empty[(Int, Long, Long, Long)] // (ft, thr, dl, dr)
    var out = Vector.empty[Gbt.GbtRound]
    // round t's histogram already sums rr^2 under the CURRENT model —
    // exactly round t-1's post-update SSE — so each round's single
    // collect also closes out the previous round, and only the LAST
    // round pays a dedicated SSE pass (round-15: was one extra full
    // aggregate per round)
    var pending: Option[Gbt.GbtRound] = None
    var t = 1
    var open = true
    while (t <= rounds && open) {
      val fCol: Column = decisions.foldLeft(lit(f0)) {
        case (f, (ft, thr, dl, dr)) =>
          f + when(col(featureCols(ft)) <= lit(thr), lit(dl))
            .otherwise(lit(dr))
      }
      val hist = design.withColumn("F", fCol)
        .withColumn("rr", $"yg" - $"F")
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
        .withColumn("sse_raw", expr(Gbt.sseSql))
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
        pending = Some(Gbt.GbtRound(t, thr, nl, nr, vl, vr, -1L, feature = ft))
        t += 1
      }
    }
    pending.foreach { pr =>
      val fAfter: Column = decisions.foldLeft(lit(f0)) {
        case (f, (ff, th, l, r)) =>
          f + when(col(featureCols(ff)) <= lit(th), lit(l))
            .otherwise(lit(r))
      }
      val sseAfter = design.withColumn("F", fAfter)
        .agg(sum(($"yg" - $"F") * ($"yg" - $"F")))
        .head().getLong(0)
      out :+= pr.copy(sseAfter = sseAfter)
    }
    (f0, out)
  }

  /** The p24/p25 quantile bin layout: price into 8 quantile bins,
    * discount into 4 — two genuinely different quantile geometries
    * (a wide continuous domain vs 11 discrete percentage points, where
    * edges land ON values and the tie-goes-left rule is load-bearing). */
  private[graft] val priceBins = 8
  private[graft] val discBins = 4
  private[graft] val regFeatures = Seq("f0", "f1")

  /** The GBT label grid: quantity in per-cent units, |yg| ≤ 5000
    * (quantity is 1..50 in every TPC-H-shaped fixture — and the fit
    * fails loudly if data ever exceeds the declared bound). */
  private[graft] val regGridBound = 5000L

  private[graft] def quantileEdges(vals: DataFrame, bins: Int,
      width: Double): Seq[Double] =
    AdvancedSql.exactPercentiles(vals,
      (1 until bins).map(_.toDouble / bins), width)

  /** One quantile-edge set per (dir, column, bins) per JVM — the
    * PcaQueries statsCache discipline: exactPercentiles is a
    * deterministic two-pass function of the immutable fixture, and
    * p24/p25/p26 re-derived identical edges (two bounded collects per
    * feature) on every run. Values are a handful of driver doubles. */
  private val edgeCache = scala.collection.concurrent.TrieMap
    .empty[(String, String, Int), Seq[Double]]
  private def cachedEdges(spark: SparkSession, dir: String, colName: String,
      bins: Int, width: Double): Seq[Double] =
    edgeCache.getOrElseUpdate((dir, colName, bins), {
      import spark.implicits._
      quantileEdges(Tables.lineitem(spark, dir).select(col(colName).as("v")),
        bins, width)
    })

  /** The shared p24/p25 design: quantile-binned (price, discount)
    * features + the integer quantity label. Edge computation is two
    * bounded exactPercentiles passes (histogram widths sized so bucket
    * occupancy, not the value set, bounds the refinement). */
  private[graft] def regDesign(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val pe = cachedEdges(spark, dir, "l_extendedprice", priceBins, 64.0)
    val de = cachedEdges(spark, dir, "l_discount", discBins, 0.01)
    li.select(
      quantileBin($"l_extendedprice", pe).as("f0"),
      quantileBin($"l_discount", de).as("f1"),
      $"l_quantity".cast("long").as("y"))
  }

  /** D294 query binding: depth-3 regression tree (variance-reduction
    * splits) predicting quantity from the quantile-binned design —
    * one row per split node with the chosen feature, threshold bin,
    * exact censuses (n, Σy per node and child) and the exact
    * per-mille floor-mean LEAF VALUES each child would predict. The
    * SSE criterion stays a shared-IEEE internal (it picks the argmin
    * row — p22's discipline); the OUTPUT is all exact integers, so
    * the hash never touches large-magnitude double rounding (4-dp
    * rounding of ~1e9-scale doubles is not stable cross-engine the
    * way unit-scale Gini values are). */
  def p24RegTree(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val design = regDesign(spark, dir).scopedPersist()
    val splits = fitRegTreeSplitsMulti(design, regFeatures, 3)
    splits.map(s => (if (s.node.isEmpty) "root" else s.node,
        s.depth.toLong, s.feature.toLong, s.thresholdBin, s.n, s.pos,
        s.nl, s.nr,
        Math.floorDiv(1000L * s.pl, s.nl),
        Math.floorDiv(1000L * s.pr, s.nr)))
      .toDF("node", "depth", "feature", "threshold_bin", "n_node",
        "sy_node", "n_left", "n_right", "v_left", "v_right")
      .orderBy($"depth", $"node")
  }

  /** D295 query binding: three regression-GBT rounds on the same
    * design (label = quantity per-cent), every output column an exact
    * integer including the chosen feature. */
  def p25RegGbt(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val design = regDesign(spark, dir)
      .withColumn("yg", $"y" * 100L).scopedPersist()
    fitRegGbtMulti(design, regFeatures, Gbt.gbtRounds, regGridBound)._2
      .map(r => (r.round.toLong, r.feature.toLong, r.thresholdBin,
        r.nLeft, r.nRight, r.vLeft, r.vRight, r.sseAfter))
      .toDF("round", "feature", "threshold_bin", "n_left", "n_right",
        "v_left", "v_right", "sse_after")
      .orderBy($"round")
  }

  /** The quantile-edge + binned-design CTEs shared by both oracles:
    * `eq` computes every edge with `quantile_cont` (bit-identical to
    * exactPercentiles — the q44-guarded identity), `rq` bins by the
    * same tie-goes-left CASE chains. */
  private def designCtes: String = {
    val pEdges = (1 until priceBins)
      .map(k => s"quantile_cont(l_extendedprice, ${k.toDouble / priceBins})" +
        s" AS p$k").mkString(", ")
    val dEdges = (1 until discBins)
      .map(k => s"quantile_cont(l_discount, ${k.toDouble / discBins})" +
        s" AS d$k").mkString(", ")
    val pCase = (1 until priceBins)
      .map(k => s"WHEN l_extendedprice <= p$k THEN ${k - 1}")
      .mkString(" ") + s" ELSE ${priceBins - 1}"
    val dCase = (1 until discBins)
      .map(k => s"WHEN l_discount <= d$k THEN ${k - 1}")
      .mkString(" ") + s" ELSE ${discBins - 1}"
    s"""eq AS (SELECT $pEdges, $dEdges FROM lineitem),
        rq AS (SELECT
            CAST(CASE $pCase END AS BIGINT) AS f0,
            CAST(CASE $dCase END AS BIGINT) AS f1,
            CAST(l_quantity AS BIGINT) AS y
          FROM lineitem CROSS JOIN eq)"""
  }

  /** One regression oracle level block off row-level assignment CTE
    * ar<i>: per-(node, feature, bin) (cnt, Σy, Σy²) censuses via
    * UNION ALL, node totals, cumulative scan, shared-IEEE SSE
    * candidates, argmin (sse → feature → bin). */
  private def oracleLevelReg(i: Int, sfx: String = ""): String = {
    val perFeature = regFeatures.zipWithIndex.map { case (f, j) =>
      s"""SELECT node, $j AS feature, $f AS bin,
            CAST(count(*) AS BIGINT) AS cnt,
            CAST(sum(y) AS BIGINT) AS sy,
            CAST(sum(y * y) AS BIGINT) AS syy
          FROM ar$i$sfx GROUP BY node, $f"""
    }.mkString("\n          UNION ALL ")
    s"""hr$i$sfx AS ($perFeature),
        tr$i$sfx AS (SELECT node, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(y) AS BIGINT) AS syt,
            CAST(sum(y * y) AS BIGINT) AS syyt FROM ar$i$sfx GROUP BY node),
        cr$i$sfx AS (SELECT node, feature, bin,
            CAST(sum(cnt) OVER (PARTITION BY node, feature ORDER BY bin)
              AS BIGINT) AS nl,
            CAST(sum(sy) OVER (PARTITION BY node, feature ORDER BY bin)
              AS BIGINT) AS syl,
            CAST(sum(syy) OVER (PARTITION BY node, feature ORDER BY bin)
              AS BIGINT) AS syyl
          FROM hr$i$sfx),
        fr$i$sfx AS (SELECT c.node, c.feature, c.bin, c.nl, c.syl, c.syyl,
            t.n - c.nl AS nr, t.syt - c.syl AS syr2,
            t.syyt - c.syyl AS syyr,
            t.n AS n, t.syt AS syt, t.syyt AS syyt
          FROM cr$i$sfx c JOIN tr$i$sfx t USING (node) WHERE c.nl < t.n),
        br$i$sfx AS (SELECT node, feature, bin AS threshold_bin, n, syt,
            nl, nr, (1000 * syl) // nl AS vl, (1000 * syr2) // nr AS vr,
            row_number() OVER (PARTITION BY node
              ORDER BY $regSseSql, feature, bin) AS rk
          FROM fr$i$sfx),
        sr$i$sfx AS (SELECT node, feature, threshold_bin FROM br$i$sfx
          WHERE rk = 1)"""
  }

  private def oracleAssignReg(i: Int, sfx: String = ""): String =
    s"""ar$i$sfx AS (SELECT a.node ||
            CASE WHEN (CASE s.feature WHEN 0 THEN a.f0 ELSE a.f1 END)
                <= s.threshold_bin
              THEN 'L' ELSE 'R' END AS node,
            a.f0, a.f1, a.y
          FROM ar${i - 1}$sfx a JOIN sr${i - 1}$sfx s ON a.node = s.node)"""

  private def oracleBestReg(i: Int): String =
    s"""SELECT CASE WHEN node = '' THEN 'root' ELSE node END AS node,
          CAST($i AS BIGINT) AS depth, CAST(feature AS BIGINT) AS feature,
          threshold_bin, n AS n_node, syt AS sy_node,
          nl AS n_left, nr AS n_right, vl AS v_left, vr AS v_right
        FROM br$i WHERE rk = 1"""

  /** One regression-GBT oracle round block over row-level prediction
    * CTE hq{t-1}: per-row residual, per-(feature, bin) censuses,
    * cumulative scan, shared-IEEE argmin, shifted floor-division leaf
    * math with the DECLARED-grid shift, routed update, exact SSE. */
  private def oracleRoundReg(t: Int): String = {
    val s = regShiftFor(regGridBound, Gbt.gbtRounds)
    val h = s"hq${t - 1}"
    val perFeature = regFeatures.zipWithIndex.map { case (f, j) =>
      s"""SELECT $j AS feature, $f AS bin,
            CAST(count(*) AS BIGINT) AS cnt,
            CAST(sum(rr) AS BIGINT) AS sr,
            CAST(sum(rr * rr) AS BIGINT) AS srr
          FROM gq$t GROUP BY $f"""
    }.mkString("\n          UNION ALL ")
    s"""gq$t AS (SELECT f0, f1, yg, F, yg - F AS rr FROM $h),
        kq$t AS ($perFeature),
        tq$t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
            CAST(sum(sr) AS BIGINT) AS srt,
            CAST(sum(srr) AS BIGINT) AS srrt
          FROM (SELECT cnt, sr, srr FROM kq$t WHERE feature = 0)),
        cq$t AS (SELECT feature, bin,
            CAST(sum(cnt) OVER (PARTITION BY feature ORDER BY bin)
              AS BIGINT) AS nl,
            CAST(sum(sr) OVER (PARTITION BY feature ORDER BY bin)
              AS BIGINT) AS srl,
            CAST(sum(srr) OVER (PARTITION BY feature ORDER BY bin)
              AS BIGINT) AS srrl
          FROM kq$t),
        fq$t AS (SELECT c.feature, c.bin, c.nl, c.srl, c.srrl,
            t.n - c.nl AS nr, t.srt - c.srl AS srr2,
            t.srrt - c.srrl AS srrr
          FROM cq$t c CROSS JOIN tq$t t WHERE c.nl < t.n),
        bq$t AS (SELECT feature, bin AS thr, nl, nr,
            ((srl + nl * $s) // nl) - $s AS vl,
            ((srr2 + nr * $s) // nr) - $s AS vr,
            row_number() OVER (ORDER BY ${Gbt.sseSql}, feature, bin) AS rk
          FROM fq$t),
        wq$t AS (SELECT feature, thr, nl, nr, vl, vr,
            ((vl + $s) // 2) - ${s / 2} AS dl,
            ((vr + $s) // 2) - ${s / 2} AS dr
          FROM bq$t WHERE rk = 1),
        hq$t AS (SELECT h.f0, h.f1, h.yg,
            h.F + CASE WHEN (CASE w.feature WHEN 0 THEN h.f0
                ELSE h.f1 END) <= w.thr
              THEN w.dl ELSE w.dr END AS F
          FROM $h h CROSS JOIN wq$t w),
        eq$t AS (SELECT CAST(sum((yg - F) * (yg - F)) AS BIGINT) AS sse
          FROM hq$t)"""
  }

  /** The p26 bagged-forest layout: three depth-2 variance trees, each
    * trained on a DETERMINISTIC 2/3 hash-complement row bag (tree t
    * drops the rows whose md5 bucket ≡ t mod 3 — the replayable
    * analogue of bootstrap resampling: bags overlap pairwise in 1/3 of
    * the corpus, exactly like bootstrap bags do in expectation) and a
    * 2-of-3 feature SUBSPACE (the random-subspace half of Breiman
    * 2001's randomness, enumerated instead of sampled so the oracle
    * replays feature choices bit-for-bit). */
  private[graft] val forestSubsets = Seq((0, 1), (1, 2), (0, 2))
  private[graft] val taxBins = 4
  private[graft] val forestTreeDepth = 2

  /** D302 query binding: bagged random-forest regression — three
    * depth-2 variance-reduction trees over quantile-binned
    * (price, discount, tax), each on its own hash-complement row bag
    * and 2-of-3 feature subspace; one row per (tree, split node) with
    * the GLOBAL feature index, exact censuses and exact per-mille
    * floor-mean leaf values (serving averages the per-tree leaf
    * means — OlsSpec replays the ensemble prediction). Bin edges are
    * computed ONCE on the full corpus (XGBoost's global proposal —
    * arXiv:1603.02754 §3.1 — which is also what makes per-tree
    * replays share one binned design).
    *
    * Scale shape: three bounded exactPercentiles passes for edges,
    * then per (tree, level) ONE routed partial-aggregated pass over
    * ~2/3 of the rows — 6 passes total, histogram state bounded by
    * 2^depth × 2 features × bins; no per-row state, no value-set
    * buffering, bags are WHERE clauses (never materialized copies). */
  def p26Forest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val pe = cachedEdges(spark, dir, "l_extendedprice", priceBins, 64.0)
    val de = cachedEdges(spark, dir, "l_discount", discBins, 0.01)
    val te = cachedEdges(spark, dir, "l_tax", taxBins, 0.01)
    val design = li.select(
        quantileBin($"l_extendedprice", pe).as("f0"),
        quantileBin($"l_discount", de).as("f1"),
        quantileBin($"l_tax", te).as("f2"),
        $"l_quantity".cast("long").as("y"),
        pmod(conv(substring(md5(concat($"l_orderkey".cast("string"),
            lit("#"), $"l_linenumber".cast("string"))), 1, 8), 16, 10)
          .cast("long"), lit(3L)).as("h"))
      .scopedPersist()
    val rows = fitForestSplits(design).map { case (t, s) =>
      val (a, b) = forestSubsets(t)
      (t.toLong,
        if (s.node.isEmpty) "root" else s.node, s.depth.toLong,
        (if (s.feature == 0) a else b).toLong, s.thresholdBin,
        s.n, s.pos, s.nl, s.nr,
        Math.floorDiv(1000L * s.pl, s.nl),
        Math.floorDiv(1000L * s.pr, s.nr))
    }
    rows.toDF("tree", "node", "depth", "feature", "threshold_bin",
      "n_node", "sy_node", "n_left", "n_right", "v_left", "v_right")
      .orderBy($"tree", $"depth", $"node")
  }

  /** All-bags-at-once forest fit (round-15, guide §2.4): the per-tree
    * loop re-scanned the shared design once per (tree, level) — six
    * routed passes plus three envelope pre-checks. Keying every
    * census/argmin row by the tree id runs each LEVEL as ONE routed
    * pass over the design (each row fans out to its 2 features × the
    * 2 trees whose bag holds it) and ONE bounded collect for all
    * trees. Bit-identical to fitting each tree separately: the bag
    * predicates (h ≠ t), the per-tree decision walks, and the argmin
    * tie order (sse → LOCAL feature index → bin) are unchanged —
    * every grouping and window key simply carries `tree`. */
  private def fitForestSplits(design: DataFrame)
      : Seq[(Int, Stump.TreeSplit)] = {
    import design.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val trees = forestSubsets.zipWithIndex
    // per-bag envelope pre-checks, folded into one aggregate
    val preAggs = trees.flatMap { case (_, t) =>
      Seq(sum(when($"h" =!= t.toLong, 1L).otherwise(0L)),
        max(when($"h" =!= t.toLong, abs($"y"))))
    }
    val pre = design.agg(preAggs.head, preAggs.tail: _*).head()
    def bagN(t: Int): Long = pre.getLong(2 * t)
    trees.foreach { case (_, t) =>
      if (bagN(t) > 0L)
        requireRegEnvelope(bagN(t),
          math.max(pre.getLong(2 * t + 1).toDouble, 1.0))
    }
    var splits = Map.empty[Int, Vector[Stump.TreeSplit]]
    var openTrees = trees.collect { case (_, t) if bagN(t) > 0L => t }.toSet
    var dep = 0
    while (dep < forestTreeDepth && openTrees.nonEmpty) {
      val entries = trees.filter(tt => openTrees(tt._2)).flatMap {
        case ((a, b), t) =>
          val feats = Seq(a, b)
          val dec = splits.getOrElse(t, Vector.empty)
            .map(s => s.node -> (s.feature, s.thresholdBin)).toMap
          def walk(path: String, lvl: Int): Column =
            if (lvl == dep) lit(path)
            else dec.get(path) match {
              case None => lit(path)
              case Some((f, thr)) =>
                when(col(s"f${feats(f)}") <= lit(thr),
                  walk(path + "L", lvl + 1))
                  .otherwise(walk(path + "R", lvl + 1))
            }
          feats.zipWithIndex.map { case (fc, fi) =>
            struct(lit(t).as("tree"), walk("", 0).as("node"),
              lit(fi).as("feature"), col(s"f$fc").as("bin"))
          }
      }
      val hist = design
        .select($"y", $"h", explode(array(entries: _*)).as("e"))
        .filter($"h" =!= $"e.tree")
        .select($"e.tree".as("tree"), $"e.node".as("node"),
          $"e.feature".as("feature"), $"e.bin".as("bin"), $"y")
        .groupBy($"tree", $"node", $"feature", $"bin")
        .agg(count(lit(1)).as("cnt"), sum($"y").as("sy"),
          sum($"y" * $"y").as("syy"))
        .scopedPersist()
      val tot = hist.filter($"feature" === lit(0))
        .groupBy($"tree", $"node").agg(sum($"cnt").as("n"),
          sum($"sy").as("syt"), sum($"syy").as("syyt"))
      val w = Window.partitionBy($"tree", $"node", $"feature")
        .orderBy($"bin")
      val aw = Window.partitionBy($"tree", $"node")
        .orderBy($"sse_raw", $"feature", $"bin")
      val lvl = hist
        .select($"tree", $"node", $"feature", $"bin",
          sum($"cnt").over(w).as("nl"), sum($"sy").over(w).as("syl"),
          sum($"syy").over(w).as("syyl"))
        .join(broadcast(tot), Seq("tree", "node"))
        .filter($"nl" < $"n")
        .withColumn("nr", $"n" - $"nl")
        .withColumn("syr2", $"syt" - $"syl")
        .withColumn("syyr", $"syyt" - $"syyl")
        .withColumn("sse_raw", expr(regSseSql))
        .withColumn("pg_raw", expr(parentSseSql))
        .filter(length($"node") === dep)
        .withColumn("rk", row_number().over(aw)).filter($"rk" === 1)
        .select($"tree", $"node", $"feature", $"bin", $"n", $"syt",
          $"nl", $"syl", $"nr", $"syr2", $"sse_raw", $"pg_raw")
        .collect() // ≤ 3 · 2^depth rows — the bounded decision table
      val byTree = lvl.groupBy(_.getInt(0))
      openTrees = openTrees.filter(byTree.contains)
      byTree.foreach { case (t, rows) =>
        splits += t -> (splits.getOrElse(t, Vector.empty) ++ rows.map(r =>
          Stump.TreeSplit(r.getString(1), dep, r.getLong(3), r.getLong(4),
            r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
            r.getLong(9), r.getDouble(10), r.getDouble(11),
            feature = r.getInt(2))))
      }
      dep += 1
    }
    trees.flatMap { case (_, t) =>
      splits.getOrElse(t, Vector.empty).map(t -> _)
    }
  }

  /** The forest's shared design CTEs: global quantile edges for all
    * THREE features plus the md5 bag-bucket, so each tree's replay is
    * a WHERE clause over one frame (g0/g1/g2 = global feature bins). */
  private def forestCtes: String = {
    def edges(c: String, bins: Int, p: String) = (1 until bins)
      .map(k => s"quantile_cont($c, ${k.toDouble / bins}) AS $p$k")
      .mkString(", ")
    def caseOf(c: String, bins: Int, p: String) = (1 until bins)
      .map(k => s"WHEN $c <= $p$k THEN ${k - 1}")
      .mkString(" ") + s" ELSE ${bins - 1}"
    s"""feq AS (SELECT ${edges("l_extendedprice", priceBins, "p")},
            ${edges("l_discount", discBins, "d")},
            ${edges("l_tax", taxBins, "t")} FROM lineitem),
        frq AS (SELECT
            CAST(CASE ${caseOf("l_extendedprice", priceBins, "p")} END
              AS BIGINT) AS g0,
            CAST(CASE ${caseOf("l_discount", discBins, "d")} END
              AS BIGINT) AS g1,
            CAST(CASE ${caseOf("l_tax", taxBins, "t")} END
              AS BIGINT) AS g2,
            CAST(l_quantity AS BIGINT) AS y,
            CAST('0x' || substring(md5(CAST(l_orderkey AS VARCHAR) || '#'
              || CAST(l_linenumber AS VARCHAR)), 1, 8) AS BIGINT) % 3 AS h
          FROM lineitem CROSS JOIN feq)"""
  }

  private def oracleBestForest(i: Int, t: Int, a: Int, b: Int): String =
    s"""SELECT CAST($t AS BIGINT) AS tree,
          CASE WHEN node = '' THEN 'root' ELSE node END AS node,
          CAST($i AS BIGINT) AS depth,
          CAST(CASE feature WHEN 0 THEN $a ELSE $b END AS BIGINT)
            AS feature,
          threshold_bin, n AS n_node, syt AS sy_node,
          nl AS n_left, nr AS n_right, vl AS v_left, vr AS v_right
        FROM br${i}_t$t WHERE rk = 1"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p24_regtree" -> p24RegTree,
    "p25_reggbt" -> p25RegGbt,
    "p26_forest" -> p26Forest)

  val oracle: Map[String, String] = Map(
    "p24_regtree" ->
      s"""WITH $designCtes,
          ar0 AS (SELECT '' AS node, f0, f1, y FROM rq),
          ${oracleLevelReg(0)},
          ${oracleAssignReg(1)},
          ${oracleLevelReg(1)},
          ${oracleAssignReg(2)},
          ${oracleLevelReg(2)}
          SELECT node, depth, feature, threshold_bin, n_node, sy_node,
            n_left, n_right, v_left, v_right
          FROM (${oracleBestReg(0)} UNION ALL ${oracleBestReg(1)}
            UNION ALL ${oracleBestReg(2)})
          ORDER BY depth, node""",
    "p26_forest" ->
      s"""WITH $forestCtes,
          ${forestSubsets.zipWithIndex.map { case ((a, b), t) =>
            val sfx = s"_t$t"
            s"""ar0$sfx AS (SELECT '' AS node, g$a AS f0, g$b AS f1, y
                FROM frq WHERE h <> $t),
              ${oracleLevelReg(0, sfx)},
              ${oracleAssignReg(1, sfx)},
              ${oracleLevelReg(1, sfx)}"""
          }.mkString(",\n          ")}
          SELECT tree, node, depth, feature, threshold_bin, n_node,
            sy_node, n_left, n_right, v_left, v_right
          FROM (${forestSubsets.zipWithIndex.flatMap { case ((a, b), t) =>
            Seq(oracleBestForest(0, t, a, b), oracleBestForest(1, t, a, b))
          }.mkString("\n            UNION ALL ")})
          ORDER BY tree, depth, node""",
    "p25_reggbt" ->
      s"""WITH $designCtes,
          q AS (SELECT f0, f1, y * 100 AS yg FROM rq),
          gg AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(yg) AS BIGINT) AS s FROM q),
          hq0 AS (SELECT f0, f1, yg, (gg.s // gg.n) AS F
            FROM q CROSS JOIN gg),
          ${(1 to Gbt.gbtRounds).map(oracleRoundReg)
            .mkString(",\n          ")}
          ${(1 to Gbt.gbtRounds).map(t =>
            s"""SELECT CAST($t AS BIGINT) AS round,
                CAST(feature AS BIGINT) AS feature, thr AS threshold_bin,
                nl AS n_left, nr AS n_right, vl AS v_left, vr AS v_right,
                (SELECT sse FROM eq$t) AS sse_after FROM wq$t""")
            .mkString("\n          UNION ALL\n          ")}
          ORDER BY round""")
}
