package graft

import graft.metrics.RankMetrics

/** M1–M5 ranking metrics against hand-computed values. */
class RankMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def ranking(qid: Long, ids: Seq[Long]) =
    ids.zipWithIndex.map { case (id, i) => (qid, id, (i + 1).toLong) }

  test("identical rankings score perfect on all set metrics") {
    val base = ranking(1L, Seq(10, 20, 30)).toDF("qid", "id", "rank")
    val m = RankMetrics.all(base, base, 3)
      .select("recall", "precision", "agreement", "mrr")
      .as[(Double, Double, Double, Double)].head()
    assert(m == ((1.0, 1.0, 1.0, 1.0)))
  }

  test("disjoint rankings score zero") {
    val base = ranking(1L, Seq(1, 2, 3)).toDF("qid", "id", "rank")
    val other = ranking(1L, Seq(7, 8, 9)).toDF("qid", "id", "rank")
    val m = RankMetrics.all(base, other, 3)
      .select("recall", "precision", "agreement", "mrr", "ndcg_ref")
      .as[(Double, Double, Double, Double, Double)].head()
    assert(m == ((0.0, 0.0, 0.0, 0.0, 0.0)))
  }

  test("partial overlap: hand-computed recall/mrr/agreement") {
    // base (1,2,3), other (3,2,9): hits {3@1,2@2}; agreement pos2 only
    val base = ranking(1L, Seq(1, 2, 3)).toDF("qid", "id", "rank")
    val other = ranking(1L, Seq(3, 2, 9)).toDF("qid", "id", "rank")
    val m = RankMetrics.all(base, other, 3)
      .select("recall", "precision", "agreement", "mrr")
      .as[(Double, Double, Double, Double)].head()
    assert(math.abs(m._1 - 2.0 / 3) < 1e-9)
    assert(math.abs(m._2 - 2.0 / 3) < 1e-9)
    assert(math.abs(m._3 - 1.0 / 3) < 1e-9)
    assert(m._4 == 1.0) // first hit at orank 1
  }

  test("ndcg_ref replicates the reference's unnormalized formula (can exceed 1)") {
    // other hits base ranks (3, 2) at positions (1, 2); g=1/log2(i+1)
    val base = ranking(1L, Seq(5, 6, 7)).toDF("qid", "id", "rank")
    val other = ranking(1L, Seq(7, 6, 99)).toDF("qid", "id", "rank")
    val nd = RankMetrics.all(base, other, 3).select("ndcg_ref").as[Double].head()
    val g = Seq(1, 2, 3).map(i => 1.0 / (math.log(i + 1) / math.log(2)))
    val want = (g(0) * 3 + g(1) * 2 + g(2) * 0) / g.sum
    assert(math.abs(nd - want) < 1e-9)
    assert(nd > 1.0)
  }

  test("multi-query: one metrics row per qid") {
    val base = (ranking(1L, Seq(1, 2)) ++ ranking(2L, Seq(3, 4)))
      .toDF("qid", "id", "rank")
    val other = (ranking(1L, Seq(1, 2)) ++ ranking(2L, Seq(9, 8)))
      .toDF("qid", "id", "rank")
    val m = RankMetrics.all(base, other, 2)
      .select("qid", "recall").as[(Long, Double)].collect().toMap
    assert(m == Map(1L -> 1.0, 2L -> 0.0))
  }
}
