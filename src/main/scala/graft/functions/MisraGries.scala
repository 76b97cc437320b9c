package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mutable Misra–Gries buffer: at most `capacity` counters plus the
  * exact stream length. Kryo-serialized only at partial/final aggregate
  * boundaries; within a partition Spark's object-hash aggregation
  * mutates it in place.
  */
final class MGSketch extends Serializable {
  val counts = new java.util.HashMap[String, Long]()
  var total: Long = 0L
}

/** Mergeable Misra–Gries heavy-hitter sketch (Misra & Gries 1982;
  * mergeability per Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * Guarantees, with capacity C over a stream of length N:
  *  - every counter undercounts its item's true frequency by at most
  *    N/(C+1), so every item with true count > N/(C+1) is present in
  *    the final candidate set (no false negatives above the bound);
  *  - the buffer never holds more than C counters, so a partial
  *    aggregate ships O(C) state per partition regardless of input
  *    size or cardinality — the scale contrast with a full
  *    groupBy(term) shuffle, whose width is the vocabulary.
  *
  * Candidates may include false positives, so callers needing exact
  * answers recount the (≤ C) candidates with a second filtered pass —
  * see `TextAnalysis.t13Boilerplate`.
  */
class MisraGries(capacity: Int)
    extends Aggregator[String, MGSketch, (Map[String, Long], Long)] {
  require(capacity > 0, "capacity must be positive")

  override def zero: MGSketch = new MGSketch

  override def reduce(b: MGSketch, item: String): MGSketch = {
    b.total += 1L
    b.counts.put(item, b.counts.getOrDefault(item, 0L) + 1L)
    if (b.counts.size > capacity) subtractAndEvict(b, minValue(b))
    b
  }

  override def merge(b1: MGSketch, b2: MGSketch): MGSketch = {
    b1.total += b2.total
    b2.counts.forEach { (k, v) =>
      b1.counts.put(k, b1.counts.getOrDefault(k, 0L) + v)
    }
    if (b1.counts.size > capacity) {
      // subtract the (capacity+1)-th largest counter from all: at most
      // `capacity` values are strictly greater, so the buffer shrinks
      // back under the cap while keeping the N/(C+1) undercount bound
      val values = new Array[Long](b1.counts.size)
      var i = 0
      val it = b1.counts.values().iterator()
      while (it.hasNext) { values(i) = it.next(); i += 1 }
      java.util.Arrays.sort(values)
      subtractAndEvict(b1, values(values.length - capacity - 1))
    }
    b1
  }

  private def minValue(b: MGSketch): Long = {
    var m = Long.MaxValue
    val it = b.counts.values().iterator()
    while (it.hasNext) m = math.min(m, it.next())
    m
  }

  private def subtractAndEvict(b: MGSketch, delta: Long): Unit = {
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - delta
      if (nv <= 0L) it.remove() else e.setValue(nv)
    }
  }

  override def finish(b: MGSketch): (Map[String, Long], Long) = {
    val m = Map.newBuilder[String, Long]
    b.counts.forEach((k, v) => m += k -> v)
    (m.result(), b.total)
  }

  override def bufferEncoder: Encoder[MGSketch] = Encoders.kryo[MGSketch]
  override def outputEncoder: Encoder[(Map[String, Long], Long)] =
    Encoders.product[(Map[String, Long], Long)]
}
