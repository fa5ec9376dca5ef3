package org.apache.spark.sql.graftnative

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so `spark.sql` users get the same
  * codegen'd kernels as the Column API:
  *
  *   spark.sql("SELECT graft_dot(a.v, b.v) FROM ...")
  *   spark.sql("SELECT qid, graft_topk(id, score, 10) FROM s GROUP BY qid")
  *
  * Wire up with `.config("spark.sql.extensions",
  * "org.apache.spark.sql.graftnative.GraftExtensions")` — no session
  * code changes needed, per the SparkSessionExtensions contract.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => DotProductRewrite)
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKByScore].getName, "graft_topk"),
      (exprs: Seq[Expression]) => {
        val k = exprs(2) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_topk k must be an integer literal, got $other")
        }
        TopKByScore(exprs(0), exprs(1), k)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_l2norm"),
      new ExpressionInfo(classOf[L2Normalize].getName, "graft_l2norm"),
      (exprs: Seq[Expression]) => L2Normalize(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_pq_reconstruct"),
      new ExpressionInfo(classOf[PQReconstruct].getName, "graft_pq_reconstruct"),
      (exprs: Seq[Expression]) => {
        val m = exprs(2) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_pq_reconstruct m must be an integer literal, got $other")
        }
        PQReconstruct(exprs(0), exprs(1), m)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_cms"),
      new ExpressionInfo(classOf[CountMinSketchAgg].getName, "graft_cms"),
      (exprs: Seq[Expression]) => {
        def intLit(e: Expression, what: String): Int = e match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_cms $what must be an integer literal, got $other")
        }
        CountMinSketchAgg(exprs(0), exprs(1),
          intLit(exprs(2), "width"), intLit(exprs(3), "depth"))
      }))
  }
}
