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

  test("portable embedder: same contract, md5-prefix buckets, cross-engine hash") {
    val p = new graft.embed.PortableHashEmbedder(64)
    val v1 = p.embed("the quick brown fox")
    assert(v1.length == 64)
    assert(v1.toSeq == p.embed("the quick brown fox").toSeq)
    val n = math.sqrt(v1.map(x => x.toDouble * x).sum)
    assert(math.abs(n - 1.0) < 1e-5)
    assert(p.embed("alpha beta").toSeq != p.embed("gamma delta").toSeq)
    // the token hash is the engine-wide portable convention: first 8
    // md5 hex chars — 'spark' must land in bucket h % 64 with the
    // sign of bit 16, exactly what the SQL oracles compute
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = java.lang.Long.parseLong(
      md.digest("spark".getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString, 16)
    val single = p.embed("spark")
    val idx = (h % 64).toInt
    val sgn = if (((h >>> 16) & 1L) == 1L) 1.0f else -1.0f
    assert(math.abs(single(idx) - sgn) < 1e-6)
    assert(single.zipWithIndex.filter(_._2 != idx).forall(_._1 == 0.0f))
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

  test("embedDocsAttr fused pass matches driver-side embed for both columns") {
    val aEmb = new HashEmbedder(dim = 16)
    val docs = Seq((1L, "hello world", "en web 11"), (2L, "spark engine", "fr pdf 12"))
      .toDF("doc_id", "text", "atext")
    val out = Embed.embedDocsAttr(docs, "doc_id", "text", "atext", emb, aEmb)
      .select(col("doc_id"), col("vec"), col("avec"))
      .as[(Long, Seq[Float], Seq[Float])].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L)._1 == emb.embed("hello world").toSeq)
    assert(out(1L)._2 == aEmb.embed("en web 11").toSeq)
    assert(out(2L)._2 == aEmb.embed("fr pdf 12").toSeq)
  }

  test("q49 DP attr search end-to-end: valid top-10, bounded drift vs text-only") {
    import graft.search.Search
    val dp = RetrievalQueries.q49DpAttrSearch(spark, sf0001)
      .select(col("doc_id"), col("rank"), col("score"))
      .as[(Long, Long, Double)].collect()
    assert(dp.length == 10)
    assert(dp.map(_._2).toSeq == (1L to 10L))
    assert(dp.map(_._3).toSeq == dp.map(_._3).sortBy(-_).toSeq) // scores desc
    assert(dp.forall(r => r._3 <= 1.0 + 1e-6)) // unit vectors → cosine ≤ 1

    // drift pin: the 0.3-weighted noisy attribute must perturb, not
    // replace, the text ranking — exact text-only top-10 with the
    // same embedder/query should keep majority overlap (the
    // reference's DP-vs-base eval expectation, evaluation.py)
    // baseline must use q49's embedder (the portable one)
    val pemb = new graft.embed.PortableHashEmbedder(64)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val textVecs = Embed.embedDocs(docs, "doc_id", "text", pemb)
      .select(col("doc_id"), col("vec").cast("array<double>").as("v"))
    val qv = pemb.embed(Queries.bm25Terms.mkString(" ")).map(_.toDouble).toSeq
    val exact = Search.topK(textVecs, "doc_id", "v",
        spark.range(1).select(typedLit(qv).as("qv")), "qv", 10)
      .select(col("doc_id")).as[Long].collect().toSet
    val overlap = dp.map(_._1).count(exact.contains)
    assert(overlap >= 5, s"DP top-10 overlaps text-only top-10 on only $overlap ids")
  }
}
