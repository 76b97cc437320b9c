package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{CosineSimilarity, DotProduct, DotProductD, LshBuckets, NearestCentroid, PqAdc, PqEncode, SumOfSquares}
import graft.plans.RewriteHofDot

/** Session extensions for the graft engine — the public plug-in point
  * for custom Catalyst expressions (the brief's preference order:
  * native `Expression` with codegen over Scala UDFs, registered via
  * `SparkSessionExtensions`).
  *
  * Enable with:
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  * after which `graft_cosine(a, b)` is callable from SQL and via
  * `functions.call_function`. Operators fall back to the equivalent
  * compiled UDF on sessions built without the extension
  * ([[graft.operators.Similarity.cosineCol]]), so the library works —
  * just slower — on a vanilla session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // optimizer rule: the interpreted HOF dot-product pattern becomes
    // the codegen'd native expression (see RewriteHofDot's Scaladoc)
    ext.injectOptimizerRule(_ => RewriteHofDot)
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          s"graft_dot expects 2 arguments, got ${children.length}")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot_d"),
      new ExpressionInfo(classOf[DotProductD].getName, "graft_dot_d"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          s"graft_dot_d expects 2 arguments, got ${children.length}")
        DotProductD(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          s"graft_cosine expects 2 arguments, got ${children.length}")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_sumsq"),
      new ExpressionInfo(classOf[SumOfSquares].getName, "graft_sumsq"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1,
          s"graft_sumsq expects 1 argument, got ${children.length}")
        SumOfSquares(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "graft_pq_encode"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          s"graft_pq_encode expects 2 arguments, got ${children.length}")
        PqEncode(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_pq_adc"),
      new ExpressionInfo(classOf[PqAdc].getName, "graft_pq_adc"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 3,
          s"graft_pq_adc expects 3 arguments, got ${children.length}")
        PqAdc(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_lsh_buckets"),
      new ExpressionInfo(classOf[LshBuckets].getName, "graft_lsh_buckets"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          s"graft_lsh_buckets expects 2 arguments, got ${children.length}")
        LshBuckets(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_nearest_centroid"),
      new ExpressionInfo(classOf[NearestCentroid].getName, "graft_nearest_centroid"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          s"graft_nearest_centroid expects 2 arguments, got ${children.length}")
        NearestCentroid(children.head, children(1))
      }))
  }
}
