package graft

import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape guards: the properties that make these queries
  * scale (scan-level pushdown, column pruning, broadcast dim joins,
  * partial aggregation) must survive refactors. */
class PlanSpec extends AnyFunSuite {
  import TestSpark._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(FormattedMode)

  test("q2_filter pushes comparison/IN/LIKE into the parquet scan") {
    val p = plan("q2_filter")
    assert(p.contains("PushedFilters"))
    assert(p.contains("GreaterThanOrEqual(p_size,10)"), "comparison not pushed")
    assert(p.contains("In(p_type,"), "IN not pushed")
    assert(p.contains("StringContains(p_name,red)"), "LIKE not pushed")
  }

  test("q1_agg prunes the scan to the six referenced columns") {
    val p = plan("q1_agg")
    val schema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!schema.contains("l_orderkey") && !schema.contains("l_partkey"),
      s"unreferenced columns not pruned: $schema")
    assert(p.contains("HashAggregate"), "no hash aggregation")
  }

  test("q3_join_agg broadcasts the dimension side and partial-aggregates") {
    val p = plan("q3_join_agg")
    assert(p.contains("BroadcastHashJoin"), "dim join not broadcast")
    // partial + final pair: HashAggregate appears at least twice
    assert("HashAggregate".r.findAllIn(p).size >= 2, "no partial aggregation")
  }

  test("q4_join5 keeps every dimension join broadcast (no fact shuffle for dims)") {
    val p = plan("q4_join5")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      "expected region/nation/customer-style dims broadcast")
  }

  test("q19_asof and q20_range never fall back to nested-loop or cartesian joins") {
    Seq("q19_asof", "q20_range").foreach { q =>
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$q plan degenerated to a pairwise join")
    }
  }

  test("d3_minhash shuffles signatures, not text") {
    val p = plan("d3_minhash")
    // the exchange below the final aggregate must carry doc_id + partial
    // mins, never the text/shingle strings
    val exchanges = p.linesIterator.filter(_.contains("Arguments: hashpartitioning")).toSeq
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("text")), "text reached a shuffle")
  }
}
