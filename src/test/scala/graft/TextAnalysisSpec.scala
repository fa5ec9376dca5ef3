package graft

import graft.text.TextAnalysis._
import org.apache.spark.sql.functions._

/** Text-analysis column functions: token stats, quality, lang-ID,
  * fingerprints. */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount and subwordCount") {
    val df = Seq(("hello world foo", "don't stop, it's 42!")).toDF("a", "b")
    val (tc, sc) = df.select(tokenCount(col("a")), subwordCount(col("b")))
      .as[(Long, Long)].head()
    assert(tc == 3L)
    // don ' t stop , it ' s 42 ! -> 10 subword pieces
    assert(sc == 10L)
  }

  test("distinctRatio and stopword ratios") {
    val df = Seq("the the the cat").toDF("t")
    val (dr, sr) = df.select(distinctRatio(col("t")),
      stopwordOccurrenceRatio(col("t"))).as[(Double, Double)].head()
    assert(dr == 0.5)   // {the, cat} / 4
    assert(sr == 0.75)  // three "the" of four tokens
  }

  test("meanTokenLen") {
    val m = Seq("ab abcd").toDF("t")
      .select(meanTokenLen(col("t"))).as[Double].head()
    assert(m == 3.0)
  }

  test("qualityScore in [0,1], higher for diverse prose than repeated token") {
    val df = Seq(
      ("good", "the cat sat on a mat and then it ran to the door of the house"),
      ("bad", "spam spam spam spam spam spam spam spam spam spam")
    ).toDF("k", "t")
    val q = df.select(col("k"), qualityScore(col("t"))).as[(String, Double)]
      .collect().toMap
    q.values.foreach(v => assert(v >= 0.0 && v <= 1.0))
    assert(q("good") > q("bad"))
  }

  test("langId picks english for english text, deterministic") {
    val l = Seq("the weather in northern england is rather fine this evening")
      .toDF("t").select(langId(col("t"))).as[String].head()
    assert(l == "en")
  }

  test("fingerprint invariant to case/whitespace; minShingle stable under local edit") {
    val df = Seq(
      (1L, "The Quick  Brown Fox jumps over the lazy dog today ok"),
      (2L, "the quick brown fox jumps over the lazy dog today ok"),
      (3L, "the quick brown fox jumps over the lazy dog today no")
    ).toDF("id", "t")
    val fp = df.select(col("id"), fingerprint(col("t"))).as[(Long, String)]
      .collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
    val msf = df.select(col("id"), minShingleFingerprint(col("t"), 5))
      .as[(Long, String)].collect().toMap
    assert(msf(1L) == msf(2L))
    // min-shingle fingerprint survives a one-word suffix edit with high
    // probability; for this fixture it does
    assert(msf(1L) == msf(3L))
  }

  test("rollingFingerprint is order-sensitive, deterministic, bounded") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "beta alpha gamma"),
      (3L, "alpha beta gamma")).toDF("id", "t")
    val fp = df.select(col("id"), rollingFingerprint(col("t")))
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) != fp(2L)) // token swap changes the hash
    assert(fp(1L) == fp(3L))
    fp.values.foreach(v => assert(v >= 0 && v < 2147483647L))
  }

  test("redactPii replaces each kind with its placeholder, counts audit") {
    val df = Seq(
      (1L, "write to a.b+c@mail-host.co.uk or visit https://x.io/p?q=1 now"),
      (2L, "call 555-123-4567 or 555-999-0000"),
      (3L, "no pii here at all")).toDF("id", "t")
    val red = df.select(col("id"), redactPii(col("t")))
      .as[(Long, String)].collect().toMap
    assert(red(1L) == "write to <EMAIL> or visit <URL> now")
    assert(red(2L) == "call <PHONE> or <PHONE>")
    assert(red(3L) == "no pii here at all")
    val counts = df.select(Seq(col("id")) ++ piiCounts(col("t")): _*)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(counts(1L) == ((1L, 1L, 0L)))
    assert(counts(2L) == ((0L, 0L, 2L)))
    assert(counts(3L) == ((0L, 0L, 0L)))
  }
}
