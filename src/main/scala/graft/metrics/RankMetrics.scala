package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranking-fidelity metrics (SURVEY §2.6, M1–M8).
  *
  * The reference computes these as Python loops over paired id lists
  * (`src/pipeline/evaluation.py:46-63`, `evaluation.py:70-82`). Here
  * each ranking is a DataFrame of (qid, id, rank) rows and every
  * metric is a grouped aggregate over a join of the two rankings —
  * shuffle on qid only, so metrics over millions of queries partition
  * cleanly.
  *
  * Inputs: `base` and `other` with columns (qid, id, rank), rank
  * 1-based, exactly k rows per qid.
  */
object RankMetrics {

  /** All metrics in one pass: recall@k (M1), precision@k (M2),
    * positional agreement (M3), MRR (M4), and the reference's
    * NON-STANDARD unnormalized "NDCG" (M5, `evaluation.py:70-74`:
    * sum(g_i * baseRank(other_i)) / sum(g_i) with g_i = 1/log2(i+1);
    * not divided by IDCG, so values may exceed 1 — kept bug-compatible
    * as `ndcg_ref`, see SURVEY §7.5). */
  def all(base: DataFrame, other: DataFrame, k: Int): DataFrame =
    allGrouped(base, other, k, Nil)

  /** [[all]] with extra grouping keys carried on the `other` side —
    * the σ-sweep (q56) scores ONE base ranking against a whole family
    * of perturbed rankings in a single grouped aggregate instead of a
    * metrics pass per knob. */
  def allGrouped(base: DataFrame, other: DataFrame, k: Int,
                 extraKeys: Seq[String]): DataFrame = {
    val b = base.select(col("qid"), col("id").as("bid"), col("rank").as("brank"))
    val o = other.select(extraKeys.map(col) ++
      Seq(col("qid"), col("id").as("oid"), col("rank").as("orank")): _*)
    val joined = o.join(b, o("qid") === b("qid") && o("oid") === b("bid"), "left")
      .select(extraKeys.map(o(_)) ++
        Seq(o("qid"), col("oid"), col("orank"), col("brank")): _*)
    val g = lit(1.0) / log2(col("orank").cast("double") + 1.0)
    joined
      .groupBy((extraKeys :+ "qid").map(col): _*)
      .agg(
        (count(col("brank")).cast("double") / k).as("recall"),
        (count(col("brank")).cast("double") / count(lit(1))).as("precision"),
        avg(when(col("brank") === col("orank"), 1.0).otherwise(0.0)).as("agreement"),
        coalesce(
          max(when(col("brank").isNotNull, lit(1.0) / col("orank"))),
          lit(0.0)).as("mrr"),
        (sum(g * coalesce(col("brank").cast("double"), lit(0.0))) / sum(g)).as("ndcg_ref"))
  }

  /** M7: per-query semantic drift = cosine(qv, qv'); callers build it
    * with VectorF.cosine — kept here for discoverability. */
  def drift(qv: Column, qv2: Column): Column = graft.functions.VectorF.cosine(qv, qv2)
}
