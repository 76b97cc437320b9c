package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  import TestSpark._

  test("LSH ANN achieves >=40% recall@5 vs brute force and exact ranks among candidates") {
    val exact = Similarity.s1KnnBrute(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val approx = Similarity.s2KnnLsh(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    assert(approx.nonEmpty)
    val recalls = exact.map { case (q, truth) =>
      approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.4, s"mean recall@5 $meanRecall too low")
  }

  test("IVF ANN achieves >=40% recall@5 vs brute force") {
    val exact = Similarity.s1KnnBrute(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val approx = Similarity.s6KnnIvf(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    assert(approx.nonEmpty)
    val recalls = exact.map { case (q, truth) =>
      approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.4, s"IVF mean recall@5 $meanRecall too low")
  }

  test("cosine of a vector with itself is 1") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("id", "embedding")
    val c = df.select(Similarity.cosine(col("embedding"), col("embedding"))).head.getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }
}
