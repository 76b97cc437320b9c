package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Bucketing

/** Bucketed fact⋈fact joins must be shuffle-free — the plan for the
  * bucketed join contains no Exchange, and results equal the plain
  * join. This is the co-location contract a 100 TB deployment relies
  * on for every lineitem⋈orders query. */
class BucketingSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed lineitem join orders plans without a shuffle and matches plain join") {
    import spark.implicits._
    // disable AQE for a deterministic plan-shape assertion, and force
    // the sort-merge path so the bucket co-location is what's tested
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (liT, ordT) = Bucketing.bucketFacts(spark, sf, buckets = 8)
      val li = spark.table(liT)
      val ord = spark.table(ordT)
      // bare join: with both sides bucketed on the key, the plan must
      // contain NO Exchange at all (a later aggregation would add its
      // own legitimate exchange, so it is asserted separately below)
      val bareJoin = li.join(ord, $"l_orderkey" === $"o_orderkey")
        .select($"l_orderkey", $"l_quantity", $"o_orderstatus")
      val plan = bareJoin.queryExecution.explainString(FormattedMode)
      assert(plan.contains("SortMergeJoin"), "expected a sort-merge join")
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      val joined = bareJoin
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 0).as("qty"))

      val plain = graft.sources.Tables.lineitem(spark, sf)
        .join(graft.sources.Tables.orders(spark, sf),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 0).as("qty"))
      assert(joined.orderBy($"o_orderstatus").collect().toSeq ==
        plain.orderBy($"o_orderstatus").collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    }
  }
}
