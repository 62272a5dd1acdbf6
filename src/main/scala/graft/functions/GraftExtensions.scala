package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the native vector
  * functions into the SQL function registry so `spark.sql` users can
  * call them directly:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * ...
  * spark.sql("SELECT graft_cosine(a.embedding, b.embedding) ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions.VectorExpressions", null, name, usage, "", "", "", "", "4.1.2", "", "scala_udf")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - double-precision dot product of two float/double arrays"),
      (args: Seq[Expression]) => VectorExpressions.DotProductExpr(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity, 0.0 on zero vectors"),
      (args: Seq[Expression]) => VectorExpressions.CosineSimilarityExpr(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("graft_sorted_intersect_size"),
      info("graft_sorted_intersect_size",
        "graft_sorted_intersect_size(a, b) - |A∩B| of two sorted BIGINT arrays"),
      (args: Seq[Expression]) => VectorExpressions.SortedIntersectSizeExpr(args(0), args(1))))
    // Aggregates register through the same hook — the analyzer wraps a
    // returned AggregateFunction in its AggregateExpression. k must be
    // a literal (it sizes the buffer at plan time).
    e.injectFunction((
      FunctionIdentifier("graft_kmv_mins"),
      info("graft_kmv_mins",
        "graft_kmv_mins(h, k) - k smallest distinct BIGINTs, O(k)-state sketch aggregate"),
      (args: Seq[Expression]) => {
        val k = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) if v >= 1 => v
          case other => throw new IllegalArgumentException(
            s"graft_kmv_mins k must be a positive INT literal, got $other")
        }
        KmvMinsAgg(args.head, k)
      }))
    e.injectFunction((
      FunctionIdentifier("graft_mg_candidates"),
      info("graft_mg_candidates",
        "graft_mg_candidates(term, k) - Misra-Gries frequent-item candidates, O(k)-state sketch aggregate"),
      (args: Seq[Expression]) => {
        val k = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) if v >= 1 => v
          case other => throw new IllegalArgumentException(
            s"graft_mg_candidates k must be a positive INT literal, got $other")
        }
        MisraGriesAgg(args.head, k)
      }))
    e.injectFunction((
      FunctionIdentifier("graft_cms"),
      info("graft_cms",
        "graft_cms(key, depth, width) - Count-Min sketch build, O(depth*width)-state aggregate"),
      (args: Seq[Expression]) => {
        def intLit(e: Expression, name: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) if v >= 1 => v
          case other => throw new IllegalArgumentException(
            s"graft_cms $name must be a positive INT literal, got $other")
        }
        CmsAgg(args.head, intLit(args(1), "depth"), intLit(args(2), "width"))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_cms_estimate"),
      info("graft_cms_estimate",
        "graft_cms_estimate(sketch, key) - point-frequency estimate, never under the true count"),
      (args: Seq[Expression]) => CmsEstimateExpr(args(0), args(1))))
  }
}
