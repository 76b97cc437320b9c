package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SparseSim

/** The distributed sparse-cosine join must replay a driver-side
  * brute-force implementation of the identical fixed-point formula
  * exactly — dots and norms are integer sums, so no tolerance. */
class SparseSimSpec extends AnyFunSuite {
  import TestSpark._

  /** Brute-force pairs from the raw fixture text. */
  private def brute(): Map[(Long, Long), Double] = {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ").toSeq)
    val n = docs.length
    val tf = docs.map { case (id, toks) =>
      id -> toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    }.toMap
    val df = tf.values.flatMap(_.keys).groupBy(identity).view.mapValues(_.size)
      .filter { case (_, d) => d >= 2 && d <= SparseSim.dfCap }.toMap
    val w = tf.view.mapValues(_.collect {
      case (t, f) if df.contains(t) =>
        t -> math.floor(SparseSim.wScale * f * math.log(n.toDouble / df(t))).toLong
    }).toMap
    val n2 = w.view.mapValues(_.values.map(x => x * x).sum).toMap
    val ids = docs.map(_._1).sorted
    (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      (a, b) = (ids(i), ids(j))
      dot = w(a).keysIterator.collect {
        case t if w(b).contains(t) => w(a)(t) * w(b)(t)
      }.sum
      if dot > 0
      cos = BigDecimal(dot.toDouble / math.sqrt(n2(a).toDouble * n2(b).toDouble))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if cos >= SparseSim.minCosine
    } yield (a, b) -> cos).toMap
  }

  test("distributed sparse cosine equals the brute-force fixed-point replay") {
    val got = SparseSim.s8SparseCosine(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exp = brute()
    assert(got == exp)
    assert(got.nonEmpty, "fixture must produce at least one qualifying pair")
    got.foreach { case ((a, b), c) =>
      assert(a < b && c >= SparseSim.minCosine && c <= 1.0)
    }
  }
}
