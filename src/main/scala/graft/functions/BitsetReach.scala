package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable per-vertex reach registers for k-hop analytics
  * (Graph.g12KHop) — the HyperBall fold (Boldi & Vigna, "In-Core
  * Computation of Geometric Centralities with HyperBall", 2013)
  * instantiated with EXACT fixed-width bitsets over the bounded
  * part-key domain instead of HyperLogLog counters.
  *
  * Why this shape scales where a pair frame does not: k-hop reach as
  * `(u, v) pairs + distinct()` materializes every reachable pair —
  * near-quadratic on a power-law graph by hop 3. Folding a MERGEABLE
  * per-vertex register instead keeps the frame at one row per vertex;
  * the OR-fold is partial-aggregated (map-side combine), so shuffle
  * width per superstep is #vertices × register width, independent of
  * path multiplicity. The register type is the pluggable piece: exact
  * bitsets here (key domain = part keys, bounded by the part table,
  * so counts stay EXACT and the DuckDB oracle still hash-matches);
  * swap in HLL registers (constant width) when the vertex-id domain
  * itself is unbounded.
  *
  * Both aggregators run as `ScalaAggregator`s (via `functions.udaf`),
  * which is a `TypedImperativeAggregate`: Spark plans them through
  * ObjectHashAggregate, so the buffer lives as a mutable JVM array and
  * the encoder serializes only at partial/final merge boundaries —
  * the same plan discipline MisraGries gets from its kryo buffer.
  */
object BitsetReach {
  private def longArrayEnc: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  /** OR the one-hot of each input key into a fixed-width bitset:
    * groupBy(u).agg(neighborBits(v)) builds hop-1 reach sets. */
  final class NeighborBitset(nWords: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(nWords > 0, s"register width must be positive, got $nWords")
    override def zero: Array[Long] = new Array[Long](nWords)
    override def reduce(b: Array[Long], key: Long): Array[Long] = {
      require(key >= 0 && key < 64L * nWords,
        s"key $key outside register domain [0, ${64L * nWords})")
      b((key >> 6).toInt) |= 1L << (key & 63L)
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < nWords) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] = longArrayEnc
    override def outputEncoder: Encoder[Array[Long]] = longArrayEnc
  }

  /** Element-wise OR of whole bitsets: one superstep's register fold.
    * Inputs may be null (outer-ish unions) — treated as empty. */
  final class BitsetUnion(nWords: Int)
      extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    require(nWords > 0, s"register width must be positive, got $nWords")
    override def zero: Array[Long] = new Array[Long](nWords)
    override def reduce(b: Array[Long], in: Array[Long]): Array[Long] =
      merge(b, in)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      if (b != null) {
        require(b.length == nWords,
          s"register width mismatch: got ${b.length} words, expected $nWords")
        var i = 0
        while (i < nWords) { a(i) |= b(i); i += 1 }
      }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] = longArrayEnc
    override def outputEncoder: Encoder[Array[Long]] = longArrayEnc
  }
}
