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
}
