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

  /** Arity check with a clean analysis-time error (a raw `exprs(i)`
    * on a short argument list dies with IndexOutOfBoundsException). */
  private def requireArity(fn: String, exprs: Seq[Expression], n: Int): Unit =
    if (exprs.length != n) throw new IllegalArgumentException(
      s"$fn takes exactly $n arguments, got ${exprs.length}")

  /** Constant scalar knobs (k, m, width, depth) must be integral
    * literals — accept any integral width (2, 2L, …) since SQL
    * frontends differ in how they type small literals, but reject an
    * out-of-Int-range Long instead of silently wrapping it to a
    * wrong knob value. */
  private def intLit(fn: String, what: String, e: Expression): Int = e match {
    case Literal(v: Int, _)   => v
    case Literal(v: Long, _) =>
      if (v < Int.MinValue || v > Int.MaxValue)
        throw new IllegalArgumentException(
          s"$fn $what is out of Int range: $v")
      v.toInt
    case Literal(v: Short, _) => v.toInt
    case Literal(v: Byte, _)  => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn $what must be an integral literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => DotProductRewrite)
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => {
        requireArity("graft_dot", exprs, 2)
        DotProduct(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKByScore].getName, "graft_topk"),
      (exprs: Seq[Expression]) => {
        requireArity("graft_topk", exprs, 3)
        TopKByScore(exprs(0), exprs(1), intLit("graft_topk", "k", exprs(2)))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_l2norm"),
      new ExpressionInfo(classOf[L2Normalize].getName, "graft_l2norm"),
      (exprs: Seq[Expression]) => {
        requireArity("graft_l2norm", exprs, 1)
        L2Normalize(exprs(0))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_pq_reconstruct"),
      new ExpressionInfo(classOf[PQReconstruct].getName, "graft_pq_reconstruct"),
      (exprs: Seq[Expression]) => {
        requireArity("graft_pq_reconstruct", exprs, 3)
        PQReconstruct(exprs(0), exprs(1),
          intLit("graft_pq_reconstruct", "m", exprs(2)))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_cms"),
      new ExpressionInfo(classOf[CountMinSketchAgg].getName, "graft_cms"),
      (exprs: Seq[Expression]) => {
        requireArity("graft_cms", exprs, 4)
        CountMinSketchAgg(exprs(0), exprs(1),
          intLit("graft_cms", "width", exprs(2)),
          intLit("graft_cms", "depth", exprs(3)))
      }))
  }
}
