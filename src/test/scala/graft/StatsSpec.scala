package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Stats
import graft.sources.Tables

/** Semantics guards for the D119–D122 statistical-inference surface. */
class StatsSpec extends AnyFunSuite {
  import TestSpark._

  /** Driver replay of the (nation, day, cents) daily census both q69
    * and q70 aggregate — exact integer cents. */
  private def dailyCensus(): Map[(Int, Int), Long] = {
    import spark.implicits._
    Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
      .select($"c_nationkey",
        datediff(to_date($"o_orderdate"), lit("1970-01-01")).as("day"),
        floor($"o_totalprice" * 100).cast("long").as("cents"))
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
  }

  test("q67 Welch moments and t statistic match an exact driver replay") {
    import spark.implicits._
    val vals = Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .select($"user_id", floor($"value" * 100).cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def arm(u: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      if (((d(0) >> 4) & 0xf) < 8) "A" else "B"
    }
    val a = vals.filter(v => arm(v._1) == "A").map(_._2)
    val b = vals.filter(v => arm(v._1) == "B").map(_._2)
    def moments(xs: Array[Long]) =
      (xs.length.toLong, xs.sum, xs.map(x => x * x).sum)
    val (na, s1a, s2a) = moments(a)
    val (nb, s1b, s2b) = moments(b)
    val (ma, mb) = (s1a.toDouble / na, s1b.toDouble / nb)
    val sea = ((s2a.toDouble - s1a.toDouble * s1a.toDouble / na) / (na - 1)) / na
    val seb = ((s2b.toDouble - s1b.toDouble * s1b.toDouble / nb) / (nb - 1)) / nb
    val expT = BigDecimal((ma - mb) / math.sqrt(sea + seb))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = Stats.q67WelchTtest(spark, sf).collect()(0)
    assert(r.getLong(0) == na && r.getLong(1) == nb)
    assert(r.getDouble(4) == expT)
    // both arms populated — the md5 gate actually splits
    assert(na > 0 && nb > 0)
  }

  test("q68 cell census is a full cross of observed margins and chi2 is nonnegative") {
    val rows = Stats.q68Chi2(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    // observed n and expected n both sum to the grand total (margins preserved)
    val tot = rows.map(_._3).sum
    assert(math.abs(rows.map(_._4).sum - tot.toDouble) < 0.01 * rows.length)
    assert(rows.forall(_._5 >= 0.0))
    // every cell's contribution consistent with its own (n, expected)
    rows.foreach { case (_, _, n, e, c) =>
      val raw = (n - e) * (n - e) / e
      assert(math.abs(c - raw) < 5e-4, s"contrib drift: $c vs $raw")
    }
  }

  test("q69 Theil-Sen slope matches a brute pairwise-median replay") {
    val daily = dailyCensus()
    val expected = daily.keys.map(_._1).toSeq.distinct.sorted.map { nat =>
      val pts = daily.collect { case ((n, d), c) if n == nat => (d, c) }
        .toSeq.sortBy(_._1)
      val slopes = (for {
        i <- pts.indices; j <- i + 1 until pts.length
        if pts(j)._1 - pts(i)._1 <= Stats.tsMaxLagDays
      } yield (pts(j)._2 - pts(i)._2).toDouble / (pts(j)._1 - pts(i)._1))
        .sorted
      val n = slopes.length
      // interpolated 0.5-quantile: index (n-1)/2, frac 0 or 0.5
      val med =
        if (n % 2 == 1) slopes(n / 2)
        else slopes(n / 2 - 1) + (slopes(n / 2) - slopes(n / 2 - 1)) * 0.5
      (nat, n.toLong,
        BigDecimal(med).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = Stats.q69TheilSen(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expected)
  }

  test("q71 Spearman matches a brute tie-averaged-rank replay") {
    import spark.implicits._
    val rows = Tables.lineitem(spark, sf)
      .select($"l_returnflag",
        floor($"l_quantity" * 100).cast("long"),
        floor($"l_extendedprice" * 100).cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // doubled tie-averaged ranks: R = 2*minRank + ties - 1 (exact ints)
    def dranks(xs: Array[Long]): Array[Long] = {
      val counts = xs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val minRank = scala.collection.mutable.Map.empty[Long, Long]
      var acc = 1L
      counts.keys.toArray.sorted.foreach { v =>
        minRank(v) = acc; acc += counts(v)
      }
      xs.map(v => 2L * minRank(v) + counts(v) - 1L)
    }
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (f, rs) =>
      val rx = dranks(rs.map(_._2)).map(BigInt(_))
      val ry = dranks(rs.map(_._3)).map(BigInt(_))
      val n = BigInt(rs.length)
      val (sx, sy) = (rx.sum, ry.sum)
      val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum
      val sxx = rx.map(a => a * a).sum
      val syy = ry.map(a => a * a).sum
      val rho = (n * sxy - sx * sy).toDouble /
        math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)
      (f, rs.length.toLong,
        BigDecimal(rho).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = Stats.q71Spearman(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expected)
    // fixture quantity and price are INDEPENDENT draws: rho ~ 0 with
    // |rho| well inside the null band — the estimator reports the
    // absence of association, not an artifact
    assert(got.forall(x => math.abs(x._3) < 0.05))
    // constructed corpora through the exact prod path: a monotone
    // transform scores exactly 1, an anti-monotone one exactly -1,
    // ties handled by average ranks on both axes
    import spark.implicits._
    val syn = (1 to 50).map(i => ("M", i.toLong, (i * i).toLong)) ++
      (1 to 50).map(i => ("A", i.toLong, (100 - i).toLong)) ++
      Seq(("T", 1L, 5L), ("T", 1L, 5L), ("T", 2L, 9L), ("T", 3L, 9L))
    val sgot = Stats.spearman(syn.toDF("flag", "qc", "pc")).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(sgot("M") == 1.0 && sgot("A") == -1.0)
    assert(sgot("T") > 0.0 && sgot("T") < 1.0)
  }

  test("q70 reproduces observed days exactly and interpolates strictly between brackets") {
    val daily = dailyCensus()
    val rows = Stats.q70Interpolate(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    val byNation = rows.groupBy(_._1)
    byNation.foreach { case (nat, rs) =>
      val sorted = rs.sortBy(_._2)
      // calendar is contiguous from first to last observed day
      assert(sorted.map(_._2).toSeq ==
        (sorted.head._2 to sorted.last._2).toSeq, s"nation $nat: gaps")
      assert(sorted.head._4 && sorted.last._4, s"nation $nat: edge not observed")
      sorted.foreach { case (_, day, filled, obs) =>
        if (obs) assert(filled == daily((nat, day)).toDouble)
        else {
          // linear interpolation between the bracketing observed days
          val prev = sorted.takeWhile(_._2 < day).filter(_._4).last
          val next = sorted.dropWhile(_._2 <= day).find(_._4).get
          val exp = prev._3 + (next._3 - prev._3) *
            ((day - prev._2).toDouble / (next._2 - prev._2))
          assert(math.abs(filled - exp) < 1e-4,
            s"nation $nat day $day: $filled vs $exp")
        }
      }
    }
    // imputation actually exercised: some rows are interpolated
    assert(rows.exists(!_._4))
  }

  test("q74 Mann-Kendall S, variance, and Z match a brute pairwise replay") {
    import spark.implicits._
    val monthly = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
      .select($"c_nationkey",
        (year($"o_orderdate") * 12 + month($"o_orderdate")).as("m"),
        floor($"o_totalprice" * 100).cast("long").as("cents"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).sum).toMap
    val got = Stats.q74MannKendall(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(4))).toMap
    assert(got.nonEmpty)
    monthly.keys.map(_._1).toSeq.distinct.foreach { nat =>
      val series = monthly.collect { case ((n, m), c) if n == nat => (m, c) }
        .toSeq.sortBy(_._1)
      val s = (for {
        i <- series.indices; j <- i + 1 until series.length
      } yield java.lang.Long.signum(series(j)._2 - series(i)._2).toLong).sum
      val n = series.length.toLong
      val tieTerm = series.groupBy(_._2).values
        .map(g => { val t = g.size.toLong; t * (t - 1) * (2 * t + 5) }).sum
      val varS = (n * (n - 1) * (2 * n + 5) - tieTerm).toDouble / 18.0
      val z =
        if (s == 0 || varS == 0.0) 0.0
        else if (s > 0) (s - 1).toDouble / math.sqrt(varS)
        else (s + 1).toDouble / math.sqrt(varS)
      val expZ = BigDecimal(z).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (gn, gs, gz) = got(nat)
      assert(gn == n && gs == s, s"nation $nat: ($gn,$gs) vs ($n,$s)")
      assert(gz == expZ, s"nation $nat: z $gz vs $expZ")
    }
  }

  test("q75 tie-grouped AP and best F1 match an exact driver fold") {
    import spark.implicits._
    val pts = Tables.documents(spark, sf)
      .join(Tables.embeddings(spark, sf), $"vec_id" === $"doc_id")
      .select($"n_chars", ($"label" >= graft.operators.Analytics.aucPosCut).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val groups = pts.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._2).sum)).toSeq
      .sortBy(-_._1) // score DESC
    val np = groups.map(_._2._2).sum
    val nn = groups.map(_._2._1).sum - np
    var cumTot = 0L; var cumPos = 0L; var apSum = 0.0
    var bestF1 = Double.MinValue; var bestScore = 0L
    groups.foreach { case (score, (nTot, nPos)) =>
      cumTot += nTot; cumPos += nPos
      apSum += nPos.toDouble * (cumPos.toDouble / cumTot.toDouble)
      val f1 = 2.0 * cumPos.toDouble / (cumTot + np).toDouble
      if (f1 > bestF1 || (f1 == bestF1 && score > bestScore)) {
        bestF1 = f1; bestScore = score
      }
    }
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = Stats.q75PrAuc(spark, sf).collect()(0)
    assert(r.getLong(0) == np && r.getLong(1) == nn)
    assert(r.getDouble(2) == r4(apSum / np.toDouble))
    assert(r.getDouble(3) == r4(bestF1))
    assert(r.getLong(4) == bestScore)
    // AP is a valid probability and positives exist in the fixture
    assert(np > 0 && r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0)
  }

  test("q76 KS statistic matches a brute ECDF sweep and reports the first argmax") {
    import spark.implicits._
    val vals = Tables.orders(spark, sf)
      .select($"o_orderpriority".isin("1-URGENT", "2-HIGH").cast("int"),
        floor($"o_totalprice" * 100).cast("long"))
      .collect().map(r => (r.getInt(0) == 1, r.getLong(1)))
    val a = vals.filter(_._1).map(_._2).sorted
    val b = vals.filterNot(_._1).map(_._2).sorted
    val (na, nb) = (a.length.toLong, b.length.toLong)
    val steps = (a ++ b).distinct.sorted
    var best = BigInt(-1); var bestAt = 0L
    steps.foreach { v =>
      val gap = (BigInt(a.count(_ <= v)) * nb - BigInt(b.count(_ <= v)) * na).abs
      if (gap > best) { best = gap; bestAt = v } // first (smallest) argmax
    }
    val d = best.toDouble / (na.toDouble * nb.toDouble)
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = Stats.q76KsTest(spark, sf).collect()(0)
    assert(r.getLong(0) == na && r.getLong(1) == nb)
    assert(r.getLong(2) == bestAt, s"argmax ${r.getLong(2)} vs $bestAt")
    assert(r.getDouble(3) == r4(d))
    assert(r.getDouble(4) ==
      r4(d * math.sqrt(na.toDouble * nb.toDouble / (na + nb).toDouble)))
    // both arms populated, D strictly inside (0, 1)
    assert(na > 0 && nb > 0 && r.getDouble(3) > 0.0 && r.getDouble(3) < 1.0)
  }

  test("q77 ACF matches a brute zero-filled driver replay and is 1-bounded") {
    val daily = dailyCensus()
    val got = Stats.q77Acf(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got.nonEmpty)
    daily.keys.map(_._1).toSeq.distinct.foreach { nat =>
      val obs = daily.collect { case ((n, d), c) if n == nat => (d, c) }.toMap
      val days = obs.keys.min to obs.keys.max
      val y = days.map(d => obs.getOrElse(d, 0L)).toArray
      val n = y.length
      val s = y.sum
      val z = y.map(v => BigInt(n) * v - s)
      val den = z.map(v => v * v).sum
      (1 to Stats.acfMaxLag).foreach { k =>
        if (n > k) {
          val num = (k until n).map(t => z(t) * z(t - k)).sum
          val exp = BigDecimal(
            (BigDecimal(num) / BigDecimal(den)).toDouble)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          val g = got((nat, k))
          assert(math.abs(g - exp) < 2e-4, s"nation $nat lag $k: $g vs $exp")
          assert(g >= -1.0001 && g <= 1.0001)
        }
      }
    }
  }

  test("q78 Kaplan-Meier matches an exact driver product fold with censoring") {
    import spark.implicits._
    val spans = Tables.orders(spark, sf)
      .groupBy($"o_custkey")
      .agg(min(to_date($"o_orderdate")).as("fd"), max(to_date($"o_orderdate")).as("ld"))
      .collect().map(r => (r.getDate(0 + 1), r.getDate(2)))
    val h = spans.map(_._2.toLocalDate).max
    def dd(a: java.time.LocalDate, b: java.time.LocalDate): Long =
      java.time.temporal.ChronoUnit.DAYS.between(a, b)
    val obs = spans.map { case (fd, ld) =>
      val churned = dd(ld.toLocalDate, h) > Stats.kmChurnDays
      val t = if (churned) dd(fd.toLocalDate, ld.toLocalDate)
              else dd(fd.toLocalDate, h)
      (t, churned)
    }
    val grid = obs.groupBy(_._1).view.mapValues { g =>
      (g.count(_._2).toLong, g.count(!_._2).toLong)
    }.toSeq.sortBy(_._1)
    val total = obs.length.toLong
    var before = 0L; var s = 1.0
    val expected = grid.flatMap { case (t, (d, c)) =>
      val nRisk = total - before
      before += d + c
      if (d > 0) {
        s = s * (1.0 - d.toDouble / nRisk.toDouble)
        Some((t, nRisk, d, c,
          BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      } else None
    }
    val gotRows = Stats.q78KaplanMeier(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(gotRows.toSeq == expected.toSeq)
    // survival is monotone nonincreasing and strictly inside [0, 1]
    assert(gotRows.map(_._5).toSeq == gotRows.map(_._5).sorted.reverse.toSeq)
    assert(gotRows.forall(r => r._5 >= 0.0 && r._5 <= 1.0))
    // censoring actually exercised on the fixture
    assert(obs.exists(_._2) && obs.exists(!_._2))
  }

  test("q83 one-way ANOVA matches an exact driver-moments replay") {
    import spark.implicits._
    val ys = Tables.orders(spark, sf)
      .select(dayofweek($"o_orderdate") - 1, floor($"o_totalprice" * 100).cast("long"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val groups = ys.groupBy(_._1).toSeq.sortBy(_._1)
    val k = groups.size
    val n = ys.length.toLong
    val ss = ys.map(t => BigInt(t._2)).sum
    val qq = ys.map(t => BigInt(t._2) * t._2).sum
    var ssbRun = 0.0
    groups.foreach { case (_, g) =>
      val gs = g.map(t => BigInt(t._2)).sum
      ssbRun += gs.toDouble * gs.toDouble / g.length.toDouble
    }
    val ssb = ssbRun - ss.toDouble * ss.toDouble / n.toDouble
    val ssw = qq.toDouble - ssbRun
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = Stats.q83Anova(spark, sf).collect()(0)
    assert(r.getLong(0) == k.toLong && r.getLong(1) == n)
    assert(r.getDouble(2) == r4((ssb / (k - 1)) / (ssw / (n - k))))
    assert(r.getDouble(3) ==
      r4(ssb / (qq.toDouble - ss.toDouble * ss.toDouble / n.toDouble)))
    // sanity: eta^2 in [0,1], F nonnegative
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    assert(r.getDouble(2) >= 0.0)
  }

  test("q88 runs test matches a brute sign-sequence replay") {
    val daily = dailyCensus()
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = daily.keys.map(_._1).toSeq.distinct.sorted.map { nat =>
      val pts = daily.collect { case ((n, d), c) if n == nat => (d, c) }
        .toSeq.sortBy(_._1)
      val cs = pts.map(_._2).sorted
      val n = cs.length
      val med = cs((n + 1) / 2 - 1) +
        (cs(n / 2) - cs((n + 1) / 2 - 1)) * 0.5
      val signs = pts.collect {
        case (_, c) if c.toDouble != med => c.toDouble > med
      }
      val np = signs.count(identity).toLong
      val nn = signs.size.toLong - np
      val runs = signs.zipWithIndex.count { case (sg, i) =>
        i == 0 || signs(i - 1) != sg
      }.toLong
      val nt = (np + nn).toDouble
      val eR = 1.0 + 2.0 * np * nn / nt
      val vR = 2.0 * np * nn * (2.0 * np * nn - nt) / (nt * nt * (nt - 1.0))
      (nat, np, nn, runs, r4((runs - eR) / math.sqrt(vR)))
    }
    val got = Stats.q88RunsTest(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("q90 changepoint equals a brute all-splits SSE scan per nation") {
    import spark.implicits._
    val monthly = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
      .select($"c_nationkey",
        (year($"o_orderdate") * 12 + month($"o_orderdate")),
        floor($"o_totalprice" * 100).cast("long"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r0(x: Double) =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = monthly.keys.map(_._1).toSeq.distinct.sorted.flatMap { nat =>
      val cs = monthly.collect { case ((n, m), c) if n == nat => (m, c) }
        .toSeq.sortBy(_._1)
      val tn = cs.length
      if (tn < 2) None
      else {
        // EXACT prefix sums, then the engine's own double expression
        // shape (tssD − cssD, not an independently-summed right
        // segment — at ~1e17 the two round differently)
        val pre = cs.map(_._2).scanLeft(BigInt(0))(_ + _).tail
        val preSq = cs.map(x => BigInt(x._2) * x._2)
          .scanLeft(BigInt(0))(_ + _).tail
        val (ts, tss) = (pre.last.toDouble, preSq.last.toDouble)
        def cost(k: Int): Double = {
          val (csD, cssD) = (pre(k - 1).toDouble, preSq(k - 1).toDouble)
          val sseL = cssD - csD * csD / k.toDouble
          val sseR = (tss - cssD) -
            (ts - csD) * (ts - csD) / (tn - k).toDouble
          sseL + sseR
        }
        val best = (1 until tn).map(k => (cost(k), k)).minBy(x => (x._1, x._2))
        val k = best._2
        Some((nat, tn.toLong, k, cs(k - 1)._1,
          r4(pre(k - 1).toDouble / k.toDouble),
          r4((ts - pre(k - 1).toDouble) / (tn - k).toDouble),
          r0(best._1)))
      }
    }
    val got = graft.operators.Stats.q90Changepoint(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(got == expected && got.nonEmpty)
    // the split is non-trivial somewhere: not every nation breaks at k=1
    assert(got.exists(_._3 > 1))
  }

  test("q89 paired t matches an exact driver replay over contiguous month pairs") {
    import spark.implicits._
    val monthly = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
      .select($"c_nationkey",
        (year($"o_orderdate") * 12 + month($"o_orderdate")),
        floor($"o_totalprice" * 100).cast("long"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = monthly.keys.map(_._1).toSeq.distinct.sorted.map { nat =>
      val ms = monthly.collect { case ((n, m), c) if n == nat => (m, c) }
        .toSeq.sortBy(_._1)
      val ds = ms.sliding(2).collect {
        case Seq((m1, c1), (m2, c2)) if m2 == m1 + 1 => BigInt(c2 - c1)
      }.toSeq
      val n = ds.length.toLong
      val sd = ds.sum
      val sdd = ds.map(d => d * d).sum
      val mean = sd.toDouble / n.toDouble
      val t = mean / math.sqrt(
        ((sdd.toDouble - sd.toDouble * sd.toDouble / n.toDouble) / (n - 1)) / n)
      (nat, n, r4(mean), r4(t))
    }
    val got = Stats.q89PairedTtest(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("q92 Mann-Whitney equals a brute pooled-rank replay") {
    import spark.implicits._
    val vals = Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .select($"user_id", floor($"value" * 100).cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def arm(u: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      if (((d(0) >> 4) & 0xf) < 8) "A" else "B"
    }
    val byVal = vals.map(v => (arm(v._1), v._2)).groupBy(_._2)
    var cb = 0L; var r2a = BigInt(0); var ties = BigInt(0)
    var nA = 0L; var nB = 0L
    for (v <- byVal.keys.toSeq.sorted) {
      val g = byVal(v); val nv = g.length.toLong
      val na = g.count(_._1 == "A").toLong
      nA += na; nB += nv - na
      r2a += BigInt(na) * (2 * cb + nv + 1)
      ties += BigInt(nv) * nv * nv - BigInt(nv)
      cb += nv
    }
    val uA = (r2a - BigInt(nA) * (nA + 1)).toDouble / 2.0
    val n = nA + nB
    val varU = nA.toDouble * nB.toDouble / 12.0 *
      ((n + 1).toDouble - ties.toDouble / (n.toDouble * (n - 1).toDouble))
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val z = r4((uA - nA.toDouble * nB.toDouble / 2.0) / math.sqrt(varU))
    val rb = r4(2.0 * uA / (nA.toDouble * nB.toDouble) - 1.0)
    val row = Stats.q92MannWhitney(spark, sf).head()
    assert(row.getLong(0) == nA && row.getLong(1) == nB)
    assert(row.getDouble(2) == uA)
    assert(math.abs(row.getDouble(3) - z) <= 1.01e-4)
    assert(math.abs(row.getDouble(4) - rb) <= 1.01e-4)
    // sanity: U within [0, nA*nB], effect size within [-1, 1]
    assert(uA >= 0.0 && uA <= nA.toDouble * nB.toDouble)
    assert(rb >= -1.0 && rb <= 1.0)
  }

  test("q93 Cramer's V equals a brute contingency replay") {
    import spark.implicits._
    val cells = Tables.orders(spark, sf)
      .select($"o_orderstatus", $"o_orderpriority").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rows = cells.keys.map(_._1).toSeq.distinct
    val cols = cells.keys.map(_._2).toSeq.distinct
    val rowN = rows.map(s => s -> cells.collect {
      case ((r, _), c) if r == s => c }.sum).toMap
    val colN = cols.map(p => p -> cells.collect {
      case ((_, q), c) if q == p => c }.toSeq.sum).toMap
    val tot = cells.values.sum
    // identical IEEE tree to the engine, snapped to the 1e-6 grid
    val chi6 = cells.toSeq.map { case ((s, p), nc) =>
      val e = rowN(s).toDouble * colN(p).toDouble / tot.toDouble
      math.floor((nc.toDouble - e) * (nc.toDouble - e) / e * 1e6 + 0.5).toLong
    }.sum
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val chi2 = r4(chi6.toDouble / 1e6)
    val v = r4(math.sqrt(chi6.toDouble / 1e6 /
      (tot.toDouble * (math.min(rows.size, cols.size) - 1).toDouble)))
    val row = Stats.q93CramersV(spark, sf).head()
    assert(row.getLong(0) == tot)
    assert(row.getLong(1) == rows.size.toLong && row.getLong(2) == cols.size.toLong)
    assert(row.getLong(3) == (rows.size - 1).toLong * (cols.size - 1).toLong)
    assert(row.getDouble(4) == chi2)
    assert(row.getDouble(5) == v)
    assert(v >= 0.0 && v <= 1.0)
  }

  test("q94 McNemar equals a brute paired-activity replay") {
    import spark.implicits._
    val active = Tables.orders(spark, sf)
      .select($"o_custkey", year($"o_orderdate")).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val a1 = active.filter(_._2 == Stats.mcnemarY1).map(_._1).toSet
    val a2 = active.filter(_._2 == Stats.mcnemarY2).map(_._1).toSet
    val custs = Tables.customer(spark, sf).select($"c_custkey").collect()
      .map(_.getLong(0))
    val both = custs.count(c => a1(c) && a2(c)).toLong
    val b = custs.count(c => a1(c) && !a2(c)).toLong
    val c = custs.count(cu => !a1(cu) && a2(cu)).toLong
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = Stats.q94Mcnemar(spark, sf).head()
    assert(row.getLong(0) == custs.length.toLong)
    assert(row.getLong(1) == both && row.getLong(2) == b && row.getLong(3) == c)
    if (b + c > 0) {
      val chi = r4((math.abs(b - c) - 1).toDouble *
        (math.abs(b - c) - 1).toDouble / (b + c).toDouble)
      assert(row.getDouble(4) == chi)
      assert(chi >= 0.0)
    } else assert(row.isNullAt(4))
  }

  test("q95 Brown-Forsythe equals a brute median-deviation ANOVA replay") {
    import spark.implicits._
    val vals = Tables.lineitem(spark, sf)
      .select($"l_returnflag", floor($"l_extendedprice" * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups = vals.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    // exact doubled-cents medians + integer deviations
    val moments = groups.toSeq.sortBy(_._1).map { case (flag, vs) =>
      val n = vs.length
      val med2 = vs((n - 1) / 2) + vs(n / 2)
      val zs = vs.map(v => math.abs(2 * v - med2))
      (flag, BigInt(n), zs.map(BigInt(_)).sum,
        zs.map(z => BigInt(z) * z).sum)
    }
    val k = moments.length
    val nn = moments.map(_._2).sum
    val ss = moments.map(_._3).sum
    val qq = moments.map(_._4).sum
    // sequential flag-ordered fold, identical to the engine's wCum
    val ssbRun = moments.foldLeft(0.0) { case (acc, (_, n, s, _)) =>
      acc + s.toDouble * s.toDouble / n.toDouble
    }
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ssb = ssbRun - ss.toDouble * ss.toDouble / nn.toDouble
    val f = (ssb / (k - 1).toDouble) / ((qq.toDouble - ssbRun) /
      (nn - k).toDouble)
    val eta = ssb / (qq.toDouble - ss.toDouble * ss.toDouble / nn.toDouble)
    val row = Stats.q95Levene(spark, sf).head()
    assert(row.getLong(0) == k.toLong && row.getLong(1) == nn.toLong)
    assert(math.abs(row.getDouble(2) - r4(f)) <= 1.01e-4)
    assert(math.abs(row.getDouble(3) - r4(eta)) <= 1.01e-4)
    assert(row.getDouble(2) >= 0.0 && row.getDouble(3) >= 0.0 &&
      row.getDouble(3) <= 1.0)
  }

  test("q99 Kruskal-Wallis equals a brute pooled-rank replay") {
    import spark.implicits._
    val vals = Tables.lineitem(spark, sf)
      .select($"l_returnflag", floor($"l_extendedprice" * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byVal = vals.groupBy(_._2)
    var cb = 0L
    val r2 = scala.collection.mutable.Map.empty[String, BigInt]
      .withDefaultValue(BigInt(0))
    var tsum = BigInt(0)
    for (v <- byVal.keys.toSeq.sorted) {
      val g = byVal(v); val nv = g.length.toLong
      g.groupBy(_._1).foreach { case (flag, fs) =>
        r2(flag) += BigInt(fs.length) * (2 * cb + nv + 1)
      }
      tsum += BigInt(nv) * nv * nv - BigInt(nv)
      cb += nv
    }
    val n = vals.length.toLong
    val flags = vals.map(_._1).distinct.sorted
    val ng = vals.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    // sequential flag-ordered fold, identical to the engine's wCum
    val rrRun = flags.foldLeft(0.0) { (acc, f) =>
      acc + r2(f).toDouble / 2.0 * (r2(f).toDouble / 2.0) / ng(f).toDouble
    }
    val h = (12.0 / (n.toDouble * (n + 1).toDouble) * rrRun -
      3.0 * (n + 1).toDouble) /
      (1.0 - tsum.toDouble /
        (n.toDouble * n.toDouble * n.toDouble - n.toDouble))
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = Stats.q99KruskalWallis(spark, sf).head()
    assert(row.getLong(0) == flags.length.toLong && row.getLong(1) == n)
    assert(math.abs(row.getDouble(2) - r4(h)) <= 1.01e-4)
    assert(row.getDouble(2) >= 0.0)
  }

  test("q100 two-proportion z equals a brute conversion replay") {
    import spark.implicits._
    val users = Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(es =>
        if (es.exists(e => e._2 == "purchase" && e._3 >= Stats.convThreshold))
          1L else 0L).toMap
    def arm(u: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      if (((d(0) >> 4) & 0xf) < 8) "A" else "B"
    }
    val (as, bs) = users.toSeq.partition(u => arm(u._1) == "A")
    val (na, xa) = (as.length.toLong, as.map(_._2).sum)
    val (nb, xb) = (bs.length.toLong, bs.map(_._2).sum)
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pa = xa.toDouble / na.toDouble
    val pb = xb.toDouble / nb.toDouble
    val pp = (xa + xb).toDouble / (na + nb).toDouble
    val z = (pa - pb) / math.sqrt(pp * (1.0 - pp) *
      (1.0 / na.toDouble + 1.0 / nb.toDouble))
    val row = Stats.q100TwoProportion(spark, sf).head()
    assert(row.getLong(0) == na && row.getLong(1) == xa &&
      row.getLong(2) == nb && row.getLong(3) == xb)
    assert(row.getDouble(4) == r4(pa) && row.getDouble(5) == r4(pb))
    assert(math.abs(row.getDouble(6) - r4(z)) <= 1.01e-4)
    // the outcome is genuinely mixed (the threshold's whole point)
    assert(xa + xb > 0 && xa + xb < na + nb)
  }

  test("q96 Durbin-Watson equals a brute residual replay") {
    import spark.implicits._
    val monthly = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
      .select($"c_nationkey",
        (year($"o_orderdate") * 12 + month($"o_orderdate")),
        floor($"o_totalprice" * 100).cast("long"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = monthly.keys.map(_._1).toSeq.distinct.sorted.map { nat =>
      val ys = monthly.collect { case ((n, m), c) if n == nat => (m, c) }
        .toSeq.sortBy(_._1).zipWithIndex
        .map { case ((_, y), i) => ((i + 1).toLong, y) }
      val n = ys.length.toLong
      val st = ys.map(t => BigInt(t._1)).sum
      val stt = ys.map(t => BigInt(t._1) * t._1).sum
      val sy = ys.map(t => BigInt(t._2)).sum
      val sty = ys.map(t => BigInt(t._1) * t._2).sum
      val b = (n.toDouble * sty.toDouble - st.toDouble * sy.toDouble) /
        (n.toDouble * stt.toDouble - st.toDouble * st.toDouble)
      val a = (sy.toDouble - b * st.toDouble) / n.toDouble
      val eqs = ys.map { case (t, y) =>
        math.floor((y.toDouble - a - b * t.toDouble) * 100.0 + 0.5).toLong }
      val num = eqs.zip(eqs.tail)
        .map { case (p, e) => BigInt(e - p) * (e - p) }.sum
      val den = eqs.map(e => BigInt(e) * e).sum
      (nat, n, r4(num.toDouble / den.toDouble),
        r4(1.0 - num.toDouble / den.toDouble / 2.0))
    }
    val got = Stats.q96DurbinWatson(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    assert(got == expected && got.nonEmpty)
    // DW lives in [0, 4]
    assert(got.forall(g => g._3 >= 0.0 && g._3 <= 4.0))
  }

  test("q103 Jarque-Bera matches a brute moments replay per event type") {
    import spark.implicits._
    val vals = Tables.events(spark, sf)
      .select($"event_type", floor($"value").cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = Stats.q103JarqueBera(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq == vals.keys.toSeq.sorted)
    rows.foreach { r =>
      val xs = vals(r.getString(0))
      val n = xs.length.toDouble
      val s1 = xs.map(BigInt(_)).sum.toDouble
      val s2 = xs.map(x => BigInt(x) * x).sum.toDouble
      val s3 = xs.map(x => BigInt(x) * x * x).sum.toDouble
      val s4 = xs.map(x => BigInt(x) * x * x * x).sum.toDouble
      val mu = s1 / n
      val m2 = s2 / n - mu * mu
      val m3 = s3 / n - 3.0 * mu * (s2 / n) + 2.0 * mu * mu * mu
      val m4 = s4 / n - 4.0 * mu * (s3 / n) + 6.0 * mu * mu * (s2 / n) -
        3.0 * mu * mu * mu * mu
      val skew = m3 / (m2 * math.sqrt(m2))
      val kurt = m4 / (m2 * m2)
      val jb = (n / 6.0) * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0)
      assert(r.getLong(1) == xs.length.toLong)
      assert(math.abs(r.getDouble(2) - r4(mu)) <= 1.01e-4)
      assert(math.abs(r.getDouble(3) - r4(skew)) <= 1.01e-4)
      assert(math.abs(r.getDouble(4) - r4(kurt - 3.0)) <= 1.01e-4)
      // JB can be O(n); allow the 4-dp grid plus relative slack
      assert(math.abs(r.getDouble(5) - jb) <=
        1e-4 + 1e-9 * math.abs(jb))
      // the synthetic metric is right-skewed, decisively non-normal
      assert(r.getDouble(3) > 0.0 && r.getDouble(5) > 1.0)
    }
  }

  test("q105 Friedman matches a brute within-month rank replay") {
    import spark.implicits._
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val monthly = Tables.orders(spark, sf)
      .select((year($"o_orderdate") * 12 + month($"o_orderdate")),
        $"o_orderpriority", floor($"o_totalprice" * 100).cast("long"))
      .collect().map(r => ((r.getInt(0), r.getString(1)), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val byMonth = monthly.toSeq.map { case ((mo, p), rev) => (mo, p, rev) }
      .groupBy(_._1).filter(_._2.length == 5)
    val rankSums = scala.collection.mutable.Map.empty[String, Double]
      .withDefaultValue(0.0)
    byMonth.foreach { case (_, rows) =>
      rows.foreach { case (_, p, rev) =>
        val below = rows.count(_._3 < rev)
        val ties = rows.count(_._3 == rev)
        rankSums(p) += (2 * below + ties + 1) / 2.0
      }
    }
    val n = byMonth.size.toDouble
    val ssum = rankSums.values.map(r => r * r).sum
    val q = 12.0 / (n * 5.0 * 6.0) * ssum - 3.0 * n * 6.0
    val got = Stats.q105Friedman(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.map(_._1).toSeq == rankSums.keys.toSeq.sorted)
    got.foreach { case (p, nb, rs, mr, qs) =>
      assert(nb == byMonth.size.toLong)
      assert(rs == rankSums(p))
      assert(math.abs(mr - r4(rankSums(p) / n)) <= 1.01e-4)
      assert(math.abs(qs - r4(q)) <= 2e-4)
    }
    // rank sums across priorities partition the total block ranks
    assert(math.abs(rankSums.values.sum - n * 15.0) < 1e-9)
  }

  test("q112 BH-FDR equals a brute step-up replay") {
    import spark.implicits._
    val rows = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
      .join(Tables.nation(spark, sf), $"c_nationkey" === $"n_nationkey")
      .select($"n_name", ($"o_orderpriority" === "1-URGENT").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val census = rows.groupBy(_._1).view
      .mapValues(v => (v.length.toLong, v.map(_._2).sum)).toMap
    val nt = census.values.map(_._1).sum
    val xt = census.values.map(_._2).sum
    val m = census.size.toLong
    // the engines' shared IEEE tree, same operand order
    def zp(n: Long, x: Long): (Double, Double) = {
      val nr = nt - n; val xr = xt - x
      val z = (x.toDouble / n.toDouble - xr.toDouble / nr.toDouble) /
        math.sqrt((xt.toDouble / nt.toDouble) *
          (1.0 - xt.toDouble / nt.toDouble) *
          (1.0 / n.toDouble + 1.0 / nr.toDouble))
      val x0 = math.abs(z) / math.sqrt(2.0)
      val t = 1.0 / (1.0 + 0.3275911 * x0)
      val p = (((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
        - 0.284496736) * t + 0.254829592) * t) * math.exp(-x0 * x0)
      (z, p)
    }
    val tests = census.toSeq.map { case (nat, (n, x)) =>
      val (z, p) = zp(n, x); (nat, n, x, z, p)
    }
    val ranked = tests.sortBy(t => (t._5, t._1)).zipWithIndex
      .map { case (t, i) => (t, i + 1) }
    val kstar = ranked.filter { case (t, rk) =>
      t._5 <= Stats.bhAlpha * rk.toDouble / m.toDouble
    }.map(_._2).maxOption.getOrElse(0)
    def r4(v: Double) =
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = ranked.map { case ((nat, n, x, z, p), rk) =>
      (nat, n, x, r4(z), r4(p), rk, if (rk <= kstar) 1 else 0)
    }.sortBy(_._1)
    val got = Stats.q112BhFdr(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getInt(5), r.getInt(6))).toSeq
    assert(got == expected && got.nonEmpty)
    // every BH rejection is below the raw level too (step-up property)
    assert(got.filter(_._7 == 1).forall(_._5 <= Stats.bhAlpha))
  }
}
