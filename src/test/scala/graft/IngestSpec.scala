package graft

import graft.ingest.Ingest
import org.apache.spark.sql.functions._

/** P1–P9 ingest / row-level operators. */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  test("resolveColumns matches case-insensitively and errors on missing") {
    val df = Seq(("a", "b")).toDF("NaMe", "GENDER")
    val out = Ingest.resolveColumns(df, Seq("name", "gender"))
    assert(out.columns.toSeq == Seq("name", "gender"))
    intercept[IllegalArgumentException] {
      Ingest.resolveColumns(df, Seq("name", "city"))
    }
  }

  test("cleanText strips CRLF and collapses whitespace") {
    val s = Seq("  a\r\nb\n\n  c   d ").toDF("t")
      .select(Ingest.cleanText(col("t"))).as[String].head()
    assert(s == "a b c d")
  }

  test("prefixWhenPresent: separator disappears with null/blank prefix") {
    val df = Seq(("Cardio", "text1"), (null, "text2"), ("  ", "text3"))
      .toDF("sp", "t")
    val out = df.select(Ingest.prefixWhenPresent(col("sp"), col("t")))
      .as[String].collect().toSeq
    assert(out == Seq("Cardio, text1", "text2", "text3"))
  }

  test("dedupFirst keeps the lowest-ord row per key") {
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "k")
    val kept = Ingest.dedupFirst(df, col("k"), col("id"))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  test("sampleN is deterministic and size-exact") {
    val df = spark.range(0, 1000).toDF("id")
    val s1 = Ingest.sampleN(df, col("id"), 50).select("id").as[Long].collect().toSeq
    val s2 = Ingest.sampleN(df, col("id"), 50).select("id").as[Long].collect().toSeq
    assert(s1.size == 50 && s1 == s2)
    assert(s1 != (0L until 50L).toSeq) // actually shuffled, not a prefix
  }

  test("snippet truncates and flattens newlines") {
    val s = Seq("ab\ncd" + "x" * 300).toDF("t")
      .select(Ingest.snippet(col("t"), 10)).as[String].head()
    assert(s == "ab cdxxxxx")
  }

  test("pseudoShuffleKey Column form matches the reduced formula past 2^31") {
    // the old unreduced formula wrapped negative at ~8.36e9; the
    // reduced form must agree with exact driver-side arithmetic at
    // any id in both engines' range
    val ids = Seq(0L, 42L, 2147483647L, 2147483648L, 8400000000L, Long.MaxValue - 12345L)
    ids.foreach { id =>
      val got = spark.range(1)
        .select(Ingest.pseudoShuffleKey(lit(id))).head().getLong(0)
      val want = ((id % 2147483648L) * 1103515245L + 12345L) % 2147483648L
      assert(got == want, s"id=$id")
    }
  }
}
