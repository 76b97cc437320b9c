package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pipeline

/** Invariants of the sequence packer (c3) that the row-level oracle
  * hash can't state directly: budget respected, packing greedy, no doc
  * lost. */
class PipelineSpec extends AnyFunSuite {
  import TestSpark._

  test("c3 packing: budget respected, greedy, lossless") {
    val rows = Pipeline.c3PackSequences(spark, sf).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("seq_id"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("toks")))
    assert(rows.nonEmpty)
    // lossless: every document appears exactly once
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_._3).distinct.length.toLong == nDocs)
    val bySeq = rows.groupBy(t => (t._1, t._2))
    bySeq.foreach { case ((b, s), ds) =>
      val total = ds.map(_._4).sum
      // a sequence may exceed the budget only as a single oversized doc
      assert(total <= Pipeline.packBudget || ds.length == 1,
        s"bucket $b seq $s overfilled: $total tokens over ${ds.length} docs")
    }
    // greedy: the first doc of sequence n+1 would have overflowed
    // sequence n (docs are packed in ascending doc_id within a bucket)
    rows.groupBy(_._1).foreach { case (b, ds) =>
      val inOrder = ds.sortBy(_._3)
      inOrder.sliding(2).foreach {
        case Array((_, s1, _, _), (_, s2, id2, t2)) if s2 == s1 + 1 =>
          val fillPrev = inOrder.filter(_._2 == s1).map(_._4).sum
          assert(fillPrev + t2 > Pipeline.packBudget,
            s"bucket $b: doc $id2 started seq $s2 but would have fit seq $s1")
        case _ =>
      }
    }
  }
}
