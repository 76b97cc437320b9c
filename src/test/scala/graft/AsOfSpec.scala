package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf

/** As-of join vs a brute-force per-row scan oracle. */
class AsOfSpec extends AnyFunSuite {
  import TestSpark._

  private def t(m: Int): Timestamp =
    Timestamp.valueOf(java.time.LocalDateTime.of(2026, 1, 1, 0, 0).plusMinutes(m.toLong))

  test("asofJoin matches brute-force latest-at-or-before semantics") {
    import spark.implicits._
    val left = Seq(
      (1L, t(10), "e1"), (1L, t(30), "e2"), (1L, t(5), "e0"),
      (2L, t(50), "e3"), (3L, t(1), "e4"))
      .toDF("key", "ts", "name")
    val right = Seq(
      (1L, t(10), 100.0), (1L, t(20), 200.0),   // t(10) matches e1 inclusively
      (2L, t(49), 300.0), (9L, t(0), 999.0))
      .toDF("rkey", "rts", "price")
    val got = AsOf.asofJoin(left, "key", "ts", right, "rkey", "rts", Seq("price"))
      .select($"name", $"price").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got == Map(
      "e0" -> None,            // before any order of key 1
      "e1" -> Some(100.0),     // inclusive match at equal time
      "e2" -> Some(200.0),     // latest of the two
      "e3" -> Some(300.0),
      "e4" -> None))           // key 3 has no right rows
  }

  test("rangeJoin matches brute-force banded semantics incl. bucket boundaries") {
    import spark.implicits._
    val w = 600L // 10 minutes
    val left = Seq((1L, t(20), "a"), (1L, t(10), "b"), (2L, t(40), "c"))
      .toDF("key", "ts", "name")
    val right = Seq(
      (1L, t(10), 1.0),  // exactly lower bound for a (20-10), equal time for b
      (1L, t(20), 2.0),  // equal time for a, outside for b
      (1L, t(9), 3.0),   // outside for a (> 10 min before), within for b
      (2L, t(31), 4.0), (2L, t(29), 5.0)) // boundary: 29 outside [30,40]
      .toDF("rkey", "rts", "v")
    val got = graft.operators.RangeJoin
      .rangeJoin(left, "key", "ts", right, "rkey", "rts", Seq("v"), w)
      .select($"name", $"v").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(got == Set(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 3.0), ("c", 4.0)))
  }

  test("asofJoin and rangeJoin match brute force on random data (seed sweep)") {
    import spark.implicits._
    (0 until 5).foreach { seed =>
      val rng = new scala.util.Random(seed)
      val left = Seq.tabulate(60)(i =>
        (rng.nextInt(4).toLong, t(rng.nextInt(300)), i.toLong))
      val right = Seq.tabulate(40)(i =>
        (rng.nextInt(4).toLong, t(rng.nextInt(300)), i.toDouble))
        // unique (key, time) as the contract requires
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val ldf = left.toDF("key", "ts", "lid")
      val rdf = right.toDF("rkey", "rts", "v")

      val gotAsof = graft.operators.AsOf
        .asofJoin(ldf, "key", "ts", rdf, "rkey", "rts", Seq("v"))
        .select($"lid", $"v").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
      left.foreach { case (k, ts, lid) =>
        val exp = right.filter(r => r._1 == k && !r._2.after(ts))
          .sortBy(_._2.getTime).lastOption.map(_._3)
        assert(gotAsof(lid) == exp, s"seed $seed asof lid $lid")
      }

      val w = 3600L
      val gotRange = graft.operators.RangeJoin
        .rangeJoin(ldf, "key", "ts", rdf, "rkey", "rts", Seq("v"), w)
        .select($"lid", $"v").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      val expRange = (for {
        (k, ts, lid) <- left
        (rk, rts, v) <- right
        if rk == k && !rts.after(ts) &&
          rts.getTime >= ts.getTime - w * 1000
      } yield (lid, v)).toSet
      assert(gotRange == expRange, s"seed $seed range")
    }
  }

  test("q19_asof row-level spot check vs driver-side brute force") {
    import spark.implicits._
    val events = graft.sources.Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id").collect()
    val orders = graft.sources.Tables.orders(spark, sf)
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(max($"o_orderkey").as("k"), max($"o_totalprice").as("p"))
      // o_orderdate is TIMESTAMP_NTZ; cast to session-TZ timestamp so the
      // driver-side compare sees the same instants the union coercion does
      .select($"o_custkey", $"o_orderdate".cast("timestamp").as("o_orderdate"))
      .collect()
      .groupBy(_.getLong(0))
    val expectedMatches = events.count { e =>
      orders.get(e.getLong(2)).exists(_.exists(o =>
        !o.getTimestamp(1).after(e.getTimestamp(1))))
    }
    val gotMatches = AsOf.q19Asof(spark, sf).collect().map(_.getLong(2)).sum
    assert(gotMatches == expectedMatches,
      s"matched-event count $gotMatches != brute force $expectedMatches")
  }
}
