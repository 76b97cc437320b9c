package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** Repetition/boilerplate metrics (t8) against hand-computed values. */
class TextSpec extends AnyFunSuite {
  import TestSpark._

  test("repetitionMetrics matches hand-computed token/bigram fractions") {
    import spark.implicits._
    val docs = Seq(
      // tokens: a×3, b×1 → distinct 2/4, top 3/4;
      // bigrams: "a a"×2, "a b"×1 → top 2/3
      (1L, "a a a b"),
      // all-distinct: distinct 4/4, top 1/4; bigrams all unique → 1/3
      (2L, "w x y z"),
      // pathological boilerplate: one token repeated
      (3L, "spam spam spam spam spam")).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionMetrics(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toMap
    assert(got(1L) == ((4L, 0.5, 0.75, 0.6667)))
    assert(got(2L) == ((4L, 1.0, 0.25, 0.3333)))
    assert(got(3L) == ((5L, 0.2, 1.0, 1.0)))
  }

  test("bigrams expression matches sliding-window semantics") {
    import spark.implicits._
    val got = Seq((1L, "a b c"), (2L, "x"), (3L, "p q"))
      .toDF("doc_id", "text")
      .select($"doc_id", TextAnalysis.bigrams($"text").as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("a b", "b c"))
    assert(got(2L) == Seq.empty)
    assert(got(3L) == Seq("p q"))
  }
}
