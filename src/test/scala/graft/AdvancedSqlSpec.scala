package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AdvancedSql
import graft.sources.Tables

/** Semantics + plan-shape guards for the D25 advanced-SQL surface. */
class AdvancedSqlSpec extends AnyFunSuite {
  import TestSpark._

  test("q43 exceeds-share set matches an integer-cents driver replay") {
    import graft.operators.AdvancedSql.q43ShareBp
    val cents = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_extendedprice", "l_discount").collect()
      .map(r => r.getLong(0) ->
        math.floor(r.getDouble(1) * (1.0 - r.getDouble(2)) * 100.0).toLong)
    val perPart = cents.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val total = perPart.values.sum
    val expect = perPart.filter { case (_, v) => v * 10000L > q43ShareBp * total }
    val got = AdvancedSql.q43ImportantParts(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect && got.nonEmpty)
  }

  test("q45 cohorts: week-0 complete, offsets nonnegative, retention <= cohort size") {
    val rows = AdvancedSql.q45CohortRetention(spark, sf).collect()
      .map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_._1)
    // every user is active in their own cohort week, so offset 0 exists
    // for every cohort and is that cohort's max (a user can't be
    // retained who was never acquired)
    byCohort.foreach { case (wk, rs) =>
      val week0 = rs.find(_._2 == 0)
      assert(week0.isDefined, s"cohort $wk has no week-0 row")
      assert(rs.forall(_._2 >= 0), s"cohort $wk has a negative offset")
      assert(rs.forall(_._3 <= week0.get._3),
        s"cohort $wk retains more users than it acquired")
    }
    // cohort sizes cover the whole user base exactly once
    val totalUsers = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(byCohort.values.map(_.find(_._2 == 0).get._3).sum == totalUsers)
  }

  test("exactPercentiles is bit-equal to the buffering percentile aggregate") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
    val ps = Seq(0.25, 0.5, 0.75)
    val expected = li.agg(percentile($"l_extendedprice",
        array(ps.map(lit): _*))).head().getSeq[Double](0)
    val got = AdvancedSql.exactPercentiles(
      li.select($"l_extendedprice".as("v")), ps)
    assert(got == expected, s"two-phase percentiles drifted: $got vs $expected")
  }

  test("q44 quartile bins partition the table with consistent edges") {
    val prices = Tables.lineitem(spark, sf)
      .select("l_extendedprice").collect().map(_.getDouble(0)).sorted
    def q(p: Double): Double = {
      val k = p * (prices.length - 1)
      val (lo, hi) = (prices(math.floor(k).toInt), prices(math.ceil(k).toInt))
      lo + (k - math.floor(k)) * (hi - lo)
    }
    val rows = AdvancedSql.q44QuantileBins(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("p00_25", "p25_50", "p50_75", "p75_100"))
    assert(rows.map(_.getLong(1)).sum == prices.length.toLong)
    val byBin = rows.map(r => r.getString(0) -> r).toMap
    assert(byBin("p00_25").getAs[Double]("max_price") <= q(0.25))
    assert(byBin("p25_50").getAs[Double]("min_price") > q(0.25))
    assert(byBin("p75_100").getAs[Double]("min_price") > q(0.75))
    assert(byBin("p75_100").getAs[Double]("max_price") == prices.last)
  }

  test("q40 active intervals match a driver-side week expansion") {
    import spark.implicits._
    // driver replay with java.time; Spark date_trunc('week') = Monday 00:00
    val span = Tables.orders(spark, sf).as("o")
      .join(Tables.lineitem(spark, sf).as("l"), $"o.o_orderkey" === $"l.l_orderkey")
      .groupBy($"o.o_orderkey", $"o.o_orderdate")
      .agg(max($"l.l_shipdate").as("end_ts"))
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime](1), r.getAs[java.time.LocalDateTime](2)))
    def monday(i: java.time.LocalDateTime): java.time.LocalDate = {
      val d = i.toLocalDate
      d.minusDays((d.getDayOfWeek.getValue - 1).toLong)
    }
    val expect = span.flatMap { case (s, e) =>
      val (ws, we) = (monday(s), monday(e))
      Iterator.iterate(ws)(_.plusDays(7))
        .takeWhile(w => !w.isAfter(if (we.isBefore(ws)) ws else we)).toSeq
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    // date_trunc yields a session-TZ TIMESTAMP (java.sql.Timestamp in
    // UTC), unlike the NTZ fixture columns — convert via Instant@UTC
    val got = AdvancedSql.q40ActiveIntervals(spark, sf).collect()
      .map(r => java.time.LocalDateTime.ofInstant(
        r.getAs[java.sql.Timestamp](0).toInstant, java.time.ZoneOffset.UTC)
        .toLocalDate -> r.getLong(1)).toMap
    assert(got == expect && got.nonEmpty)
  }

  test("q41 quality audit matches driver-side constraint recounts") {
    import spark.implicits._
    val ord = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate").collect()
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_shipdate").collect()
    val custKeys = Tables.customer(spark, sf).select("c_custkey")
      .collect().map(_.getLong(0)).toSet
    val ordKeys = ord.map(_.getLong(0)).toSet
    val ordDate = ord.map(r => r.getLong(0) -> r.getAs[java.time.LocalDateTime](3)).toMap
    val expect = Map(
      "dup_orderkey" -> (ord.groupBy(_.getLong(0)).count(_._2.length > 1)).toLong,
      "fk_lineitem_orders" -> li.count(r => !ordKeys(r.getLong(0))).toLong,
      "fk_orders_customer" -> ord.count(r => !custKeys(r.getLong(1))).toLong,
      "future_shipdate" -> li.count(r => ordDate.get(r.getLong(0))
        .exists(od => r.getAs[java.time.LocalDateTime](2).isBefore(od))).toLong,
      "neg_totalprice" -> ord.count(_.getDouble(2) <= 0).toLong,
      "null_props" -> Tables.events(spark, sf).filter($"props".isNull).count(),
      "qty_range" -> li.count(r => r.getDouble(1) < 1 || r.getDouble(1) > 50).toLong)
    val got = AdvancedSql.q41QualityAudit(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("q42 histogram buckets match a driver-side recount and edges tile") {
    import graft.operators.AdvancedSql.{histLo, histWidth, histBuckets}
    val prices = Tables.lineitem(spark, sf)
      .select("l_extendedprice").collect().map(_.getDouble(0))
    val expect = prices.map(v => math.min(math.max(
        math.floor((v - histLo) / histWidth), 0), (histBuckets - 1).toDouble).toInt)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rows = AdvancedSql.q42Histogram(spark, sf).collect()
    assert(rows.map(r => r.getInt(0) -> r.getLong(3)).toMap == expect)
    rows.foreach { r =>
      assert(r.getDouble(1) == histLo + r.getInt(0) * histWidth)
      assert(r.getDouble(2) == r.getDouble(1) + histWidth)
    }
    assert(rows.map(_.getLong(3)).sum == prices.length.toLong)
  }

  test("q39 profile matches per-column recounts and runs as ONE job") {
    import spark.implicits._
    val orders = Tables.orders(spark, sf)
    val rows = AdvancedSql.q39Profile(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("o_custkey", "o_orderdate", "o_orderkey",
      "o_orderpriority", "o_orderstatus", "o_totalprice"))
    val n = orders.count()
    rows.values.foreach(r => assert(r.getAs[Long]("n_rows") == n))
    val ck = rows("o_custkey")
    assert(ck.getAs[Long]("n_distinct") ==
      orders.select($"o_custkey").distinct().count())
    assert(ck.getAs[String]("min_s") ==
      orders.agg(min($"o_custkey")).head().getLong(0).toString)
    val st = rows("o_orderstatus")
    assert(st.getAs[Long]("n_nonnull") == n)
    assert(st.getAs[String]("max_s") ==
      orders.agg(max($"o_orderstatus")).head().getString(0))
    // decimal(18,2) form: always two fraction digits
    assert(rows("o_totalprice").getAs[String]("min_s").matches("""\d+\.\d{2}"""))
  }

  test("q30 upsert never shuffles the base: broadcast joins only") {
    val p = AdvancedSql.q30Upsert(spark, sf)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "upsert shuffled a join side — the base must stream map-side")
    assert(p.contains("BroadcastHashJoin"), "expected broadcast joins")
  }

  test("q30 upsert applies updates, keeps untouched rows, appends inserts") {
    val base = Tables.customer(spark, sf)
    val out = AdvancedSql.q30Upsert(spark, sf).collect()
      .map(r => r.getAs[Long]("c_custkey") -> r.getAs[String]("c_mktsegment"))
      .toMap
    val nBase = base.count()
    val updated = out.count(_._2 == "UPDATED")
    val inserted = out.count(_._2 == "INSERTED")
    assert(out.size.toLong == nBase + inserted, "row count != base + inserts")
    assert(updated > 0 && inserted > 0)
    // every inserted key is in the shifted range, every updated key % 10 == 0
    assert(out.filter(_._2 == "INSERTED").keys.forall(_ > 1000000L))
    assert(out.filter(_._2 == "UPDATED").keys.forall(_ % 10 == 0))
  }

  test("q31 approx percentiles are within 1% of exact") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.95)").as("p95"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getDouble(2)))).toMap
    val approx = AdvancedSql.q31ApproxPercentile(spark, sf).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val (e50, e95) = exact(r.getAs[String]("l_returnflag"))
      assert(math.abs(r.getAs[Double]("p50_approx") - e50) <= 0.01 * e50)
      assert(math.abs(r.getAs[Double]("p95_approx") - e95) <= 0.01 * e95)
    }
  }

  test("AQE splits a skewed join partition at runtime (automatic q27 alternative)") {
    // q27 shows MANUAL salting; this pins the engine's automatic path:
    // with AQE skew-join on, a hot key whose shuffle partition dwarfs
    // the median is split into sub-partitions at runtime. Thresholds
    // are lowered so the fixture-scale hot key (45k of 50k rows on one
    // key) counts as skewed.
    val s = spark
    import s.implicits._
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> s.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      val left = s.range(50000)
        .select(when($"id" < 45000, 0L).otherwise($"id" % 1000).as("k"),
          $"id".as("v"))
      val right = s.range(1000).select($"id".as("k"), ($"id" * 2).as("w"))
      // collect j itself: count() would build (and adaptively plan) a
      // separate query, leaving j's own plan unexecuted
      val j = left.join(right, "k")
      val n = j.collect().length
      assert(n == 50000, s"join row count $n")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.toLowerCase.contains("skewed"),
        s"AQE did not mark the hot partition as skewed:\n${plan.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  test("q27 salted join returns exactly the plain join's aggregate") {
    import spark.implicits._
    val salted = AdvancedSql.q27SaltedJoin(spark, sf).collect()
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 0).as("revenue"))
      .orderBy($"o_orderpriority")
      .collect()
    assert(salted.toSeq == plain.toSeq, "salting changed the join result")
  }

  test("q27 plan keeps the shuffle join (salting would be a no-op under broadcast)") {
    val p = AdvancedSql.q27SaltedJoin(spark, sf)
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("SortMergeJoin"), "expected a sort-merge (shuffle) join")
    assert(!p.contains("BroadcastHashJoin"),
      "replicated build side was broadcast — the salt no longer spreads the hot key")
  }

  test("q27 spreads a hot key's rows across salts (per-row, not per-key)") {
    import spark.implicits._
    // the most frequent order key must hit >1 salt bucket, else salting
    // degenerates to renaming the key
    val salts = Tables.lineitem(spark, sf)
      .withColumn("salt",
        pmod(crc32(concat_ws("-", $"l_orderkey", $"l_linenumber")), lit(AdvancedSql.nsalts)))
      .groupBy($"l_orderkey")
      .agg(countDistinct($"salt").as("n_salts"), count(lit(1)).as("n"))
      .filter($"n" >= 4)
    assert(salts.filter($"n_salts" > 1).count() > 0,
      "no multi-line order spread over more than one salt bucket")
  }

  test("q26 trailing-90d frame matches a per-row recount for one customer") {
    import spark.implicits._
    val rows = AdvancedSql.q26RangeFrame(spark, sf)
      .filter($"o_custkey" === 1L).collect()
    assume(rows.nonEmpty)
    val days = rows.map(_.getAs[Int]("day_num"))
    rows.foreach { r =>
      val d = r.getAs[Int]("day_num")
      val expected = days.count(x => x >= d - 90 && x <= d)
      assert(r.getAs[Long]("n_90d") == expected,
        s"day $d: frame count ${r.getAs[Long]("n_90d")} != naive $expected")
    }
  }

  test("q24 grouping sets: per-gid partitions each cover all orders") {
    import spark.implicits._
    val total = Tables.orders(spark, sf).count()
    val df = AdvancedSql.q24GroupingSets(spark, sf)
    // gid 0 = (priority,status) detail, 1 = by priority, 2 = by status;
    // each grouping set partitions the full table
    Seq(0L, 1L, 2L).foreach { g =>
      val n = df.filter($"gid" === g).agg(sum($"n_orders")).as[Long].head()
      assert(n == total, s"gid $g covers $n of $total orders")
    }
  }

  test("q28 EXISTS/NOT EXISTS decorrelate to one semi and one anti join") {
    val p = AdvancedSql.q28Exists(spark, sf)
      .queryExecution.explainString(FormattedMode).toLowerCase
    assert(p.contains("leftsemi"), "EXISTS did not become a left-semi join")
    assert(p.contains("leftanti"), "NOT EXISTS did not become a left-anti join")
  }

  test("selective dim filter injects a bloom runtime filter into the fact scan") {
    import spark.implicits._
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      // force the shuffle-join shape a 100 TB fact⋈fact plan has (tiny
      // test tables would otherwise broadcast, where a bloom is moot)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val li = Tables.lineitem(spark, sf)
        .select($"l_orderkey", $"l_extendedprice")
      val ord = Tables.orders(spark, sf)
        .filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey", $"o_orderpriority")
      val q = li.join(ord, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(round(sum($"l_extendedprice"), 0).as("rev"))
      // explainString forces optimization while the confs are in effect
      val p = q.queryExecution.explainString(FormattedMode).toLowerCase
      assert(p.contains("might_contain"),
        "no bloom runtime filter injected on the probe side")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("q25 subquery is decorrelated: no per-row subquery, aggregate+join instead") {
    val p = AdvancedSql.q25CorrSubquery(spark, sf)
      .queryExecution.explainString(FormattedMode)
    assert(!p.toLowerCase.contains("scalarsubquery"),
      "correlated scalar subquery survived to the physical plan (not decorrelated)")
    assert(p.contains("HashAggregate"), "expected the decorrelated aggregate")
  }

  test("zorder8 interleaves bits exactly (x even bits, y odd bits)") {
    import org.apache.spark.sql.functions.lit
    // x=3 (011), y=5 (101): bit0=x0, bit1=y0, bit2=x1, bit3=y1, bit4=x2,
    // bit5=y2 -> 1 + 2 + 4 + 0 + 0 + 32 = 39
    val z = spark.range(1)
      .select(AdvancedSql.zorder8(lit(3L), lit(5L)).as("z"))
      .head().getLong(0)
    assert(z == 39L, s"expected 39, got $z")
    // round-trip a full corner: (255, 255) -> all 16 bits set
    val zMax = spark.range(1)
      .select(AdvancedSql.zorder8(lit(255L), lit(255L)).as("z"))
      .head().getLong(0)
    assert(zMax == 65535L)
  }

  test("q37 z-ranges are 64x64 tiles: both dimensions bounded per range") {
    // top-4-bits grouping keeps the high 2 bits of BOTH x and y fixed,
    // so every z-range must span < 64 in each dimension -- the property
    // that makes a zkey-sorted layout prune on either column.
    val rows = AdvancedSql.q37Zorder(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") < 64L)
      assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") < 64L)
    }
  }

  test("q36 ewma matches a driver-side recursive replay") {
    val s = spark
    import s.implicits._
    val byUser = Tables.events(spark, sf)
      .filter($"user_id" < 50)
      .select($"user_id", $"event_id", $"ts", $"value")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[java.sql.Timestamp]("ts"), r.getAs[Double]("value")))
      .groupBy(_._1)
    val expected = byUser.flatMap { case (u, evs) =>
      val ordered = evs.sortBy(e => (e._3.getTime, e._3.getNanos, e._2))
      ordered.indices.map { i =>
        val sum = (0 until AdvancedSql.ewmaDepth).map { j =>
          val v = if (i - j >= 0) ordered(i - j)._4 else 0.0
          v * math.pow(AdvancedSql.ewmaAlpha, j)
        }.sum
        (u, ordered(i)._2) -> BigDecimal(sum)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    val got = AdvancedSql.q36Ewma(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")) ->
        r.getAs[Double]("ewma")).toMap
    assert(got.nonEmpty && got.size == expected.size)
    expected.foreach { case (k, e) =>
      assert(math.abs(got(k) - e) <= 1e-9, s"ewma mismatch at $k: ${got(k)} vs $e")
    }
  }

  test("q35 median/MAD/outlier counts match a driver-side replay") {
    val s = spark
    import s.implicits._
    def medianOf(xs: Seq[Double]): Double = {
      val v = xs.sorted
      val n = v.length
      if (n % 2 == 1) v(n / 2) else (v(n / 2 - 1) + v(n / 2)) / 2.0
    }
    val byUser = Tables.events(spark, sf)
      .select($"user_id", $"value").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).toSeq }
    val got = AdvancedSql.q35MadOutliers(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_outliers"))).toMap
    assert(got.nonEmpty)
    got.foreach { case (u, (n, outliers)) =>
      val vs = byUser(u)
      val med = medianOf(vs)
      val mad = medianOf(vs.map(v => math.abs(v - med)))
      val expOut = vs.count(v => math.abs(v - med) > 3.0 * mad)
      assert(n == vs.length && outliers == expOut.toLong,
        s"user $u: got ($n,$outliers) expected (${vs.length},$expOut)")
    }
  }

  test("q113 drill-down equals a brute rollup replay; shares tile parents") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = graft.sources.Tables.orders(spark, sf)
      .select(year(to_date($"o_orderdate")).as("y"),
        quarter(to_date($"o_orderdate")).as("q"),
        floor($"o_totalprice" * 100).cast("long").as("c"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val total = rows.map(_._3).sum
    val byYear = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val byYQ = rows.groupBy(r => (r._1, r._2)).view
      .mapValues(_.map(_._3).sum).toMap
    val expected = (Seq(("total", -1, -1, total, 1.0)) ++
      byYear.toSeq.map { case (y, c) =>
        ("year", y, -1, c, r4(c.toDouble / total.toDouble))
      } ++
      byYQ.toSeq.map { case ((y, q), c) =>
        ("quarter", y, q, c, r4(c.toDouble / byYear(y).toDouble))
      }).sortBy(t => (t._1, t._2, t._3))
    val got = graft.operators.AdvancedSql.q113Drilldown(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == expected && got.nonEmpty)
    // exact integer tiling: each level's revenue sums to its parent
    assert(got.filter(_._1 == "year").map(_._4).sum == total)
    got.filter(_._1 == "quarter").groupBy(_._2).foreach { case (y, qs) =>
      assert(qs.map(_._4).sum == byYear(y))
    }
  }
}
