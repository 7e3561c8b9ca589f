package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point exposing graft's native
  * expressions to SQL:
  *
  *   - `vec_dot(a, b)` — [[FloatVecDot]], codegen'd float-vector dot
  *   - `topk_by_score(score, id, k)` — [[TopKByScore]], bounded-heap
  *     per-group top-k (k must be a literal)
  *
  * Register with
  * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * This is the supported way to ship Catalyst extensions in a
  * library: no fork of Spark, functions resolve through the normal
  * registry, and plans containing them survive every optimizer rule.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(BandJoinBucketingRule)
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "vec_dot(a, b) takes 2 arguments")
        FloatVecDot(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[FloatVecCosine].getName, "vec_cosine"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "vec_cosine(a, b) takes 2 arguments")
        FloatVecCosine(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("topk_by_score"),
      new ExpressionInfo(classOf[TopKByScore].getName, "topk_by_score"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, "topk_by_score(score, id, k) takes 3 arguments")
        val k = exprs(2) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"topk_by_score: k must be an integer literal, got $other")
        }
        TopKByScore(exprs.head, exprs(1), k)
      }))
  }
}
