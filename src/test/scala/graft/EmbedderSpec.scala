package graft

import graft.embed.{Embed, HashEmbedder}
import org.apache.spark.sql.functions._

/** E1–E3 embedding contract: fixed dim, unit norm, deterministic. */
class EmbedderSpec extends SparkSpec {
  import spark.implicits._

  private val emb = new HashEmbedder(dim = 64)

  test("embed returns fixed dim, unit norm, deterministic") {
    val v1 = emb.embed("the quick brown fox")
    val v2 = emb.embed("the quick brown fox")
    assert(v1.length == 64)
    assert(v1.toSeq == v2.toSeq)
    val n = math.sqrt(v1.map(x => x.toDouble * x).sum)
    assert(math.abs(n - 1.0) < 1e-5)
  }

  test("different texts give different vectors") {
    assert(emb.embed("alpha beta").toSeq != emb.embed("gamma delta").toSeq)
  }

  test("embedDocs runs distributed and preserves ids") {
    val docs = Seq((1L, "hello world"), (2L, "spark engine"), (3L, "hello world"))
      .toDF("doc_id", "text")
    val out = Embed.embedDocs(docs, "doc_id", "text", emb)
      .select(col("doc_id"), col("vec")).as[(Long, Seq[Float])].collect().toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == out(3L)) // same text -> same vector
    assert(out(1L) != out(2L))
    assert(out(1L).size == 64)
  }

  test("attrText concatenates with space, null-safe") {
    val df = Seq(("ann", null.asInstanceOf[String], "42"))
      .toDF("name", "gender", "age")
    val s = df.select(Embed.attrText(Seq("name", "gender", "age"))).as[String].head()
    assert(s == "ann  42")
  }
}
