package graft

import graft.functions.VectorF
import graft.hybrid.Hybrid
import org.apache.spark.sql.functions._

/** The composed RAG entry point (SURVEY §3.2): q55 candidate stage +
  * q57 MMR tail. The candidate stage is oracle-checked by the driver;
  * these specs pin the parts the oracle can't see. */
class RagSpec extends SparkSpec {
  import spark.implicits._

  test("q55 candidates: legs contribute, ids distinct, sims bounded") {
    val c = RetrievalQueries.q55RagCandidates(spark, sf0001)
      .select("id", "in_vec", "in_lex", "sim")
      .as[(Long, Int, Int, Double)].collect()
    assert(c.nonEmpty)
    assert(c.forall(r => r._2 == 1 || r._3 == 1)) // every candidate has a provenance
    assert(c.exists(_._2 == 1) && c.exists(_._3 == 1)) // both legs fire
    assert(c.map(_._1).distinct.length == c.length) // union is distinct
    assert(c.forall(r => math.abs(r._4) <= 1.0 + 1e-6)) // normalized cosines
    // the query document itself is its own nearest neighbor
    assert(c.exists(r => r._1 == 0L && r._2 == 1))
  }

  test("lambda=1 MMR over the q55 frame degenerates to pure vector order") {
    implicit val s = spark
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id").as("id"),
        VectorF.l2normalize(col("embedding").cast("array<double>")).as("nv"))
    val cands = RetrievalQueries.q55RagCandidates(spark, sf0001).join(e, "id")
    val pure = Hybrid.mmrRerank(cands, "id", "nv", "sim", 10, 1.0)
      .orderBy("rank").select("id").as[Long].collect().toSeq
    val want = cands.orderBy(col("sim").desc, col("id").asc).limit(10)
      .select("id").as[Long].collect().toSeq
    assert(pure == want)
  }

  test("q57 RAG e2e returns 10 ranked rows with resolved snippets") {
    val rows = RetrievalQueries.q57RagE2e(spark, sf0001)
      .select("rank", "id", "snippet").as[(Long, Long, String)].collect().toSeq
    assert(rows.map(_._1) == (1L to 10L))
    assert(rows.map(_._2).distinct.length == 10)
    assert(rows.forall(_._3.nonEmpty))
    // MMR's first pick is always the argmax-sim candidate = the query doc
    assert(rows.head._2 == 0L)
  }
}
