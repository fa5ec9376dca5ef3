package graft

import graft.text.Bpe
import org.apache.spark.sql.functions._

/** BPE tokenizer induction (q103). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learns the classic merge sequence on a hand corpus") {
    // word counts: ab x3, cd x1 -> round 1 merges a|b, round 2 c|d
    val df = Seq("ab ab cd", "ab").toDF("text")
    val got = Bpe.train(df, "text", 2)
      .select("round", "pair", "cnt").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "a|b", 3L), (2L, "c|d", 1L)))
  }

  test("back-to-back occurrences both merge in one round (boundary safety)") {
    // "abab": after merging a|b once, sym must be ||ab||ab|| (both
    // occurrences consumed), so round 2's top pair is ab|ab
    val df = Seq("abab abab abab", "xy").toDF("text")
    val got = Bpe.train(df, "text", 2)
      .select("round", "pair").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a|b"), (2L, "ab|ab")))
  }

  test("merged symbols pair with neighbours in later rounds") {
    // "low" x4: l|o (4) then lo|w (4) — the merged symbol must form
    // a new adjacent pair with its right neighbour
    val df = Seq("low low", "low low").toDF("text")
    val got = Bpe.train(df, "text", 2)
      .select("pair", "cnt").as[(String, Long)].collect().toSeq
    assert(got == Seq(("l|o", 4L), ("lo|w", 4L)))
  }

  test("ties break on pair ascending; non-word tokens are filtered") {
    // "ba ba" vs "ab ab": both pairs count 2 -> a|b wins (asc);
    // tokens with punctuation ("x!") never enter the vocab
    val df = Seq("ba ba ab ab x! x! x! x!").toDF("text")
    val got = Bpe.train(df, "text", 1)
      .select("pair", "cnt").as[(String, Long)].collect().toSeq
    assert(got == Seq(("a|b", 2L)))
  }

  test("single-char words contribute no pairs and do not crash (ANSI guard)") {
    val df = Seq("a a a a b", "ab").toDF("text")
    val got = Bpe.train(df, "text", 1)
      .select("pair", "cnt").as[(String, Long)].collect().toSeq
    assert(got == Seq(("a|b", 1L)))
  }

  test("trainedVocab reflects all merges; symCount counts subwords") {
    // ab x3, cd x1, 2 rounds -> both words fully merged to one symbol
    val df = Seq("ab ab cd", "ab").toDF("text")
    val got = Bpe.trainedVocab(df, "text", 2)
      .select(col("word"), col("sym"), Bpe.symCount(col("sym")).as("k"))
      .as[(String, String, Int)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(("ab", "||ab||", 1), ("cd", "||cd||", 1)))
  }

  test("empty merge round is a no-op, not a vocab wipe") {
    // single word "ab" merges in round 1; rounds 2-3 find no pairs —
    // the vocab (and train's output) must survive
    val df = Seq("ab ab").toDF("text")
    val merges = Bpe.train(df, "text", 3)
      .select("round", "pair").as[(Long, String)].collect().toSeq
    assert(merges == Seq((1L, "a|b")))
    val v = Bpe.trainedVocab(df, "text", 3)
      .select("word", "sym").as[(String, String)].collect().toSeq
    assert(v == Seq(("ab", "||ab||")))
  }

  test("encode conserves characters: symbols concatenate back to the word") {
    val df = (1 to 40).map(i => s"alpha$i beta gamma delta beta").toDF("text")
    val bad = Bpe.trainedVocab(df, "text", 6)
      .select(col("word"),
        concat_ws("", filter(split(col("sym"), "\\|\\|"), x => x =!= "")).as("cat"))
      .filter(col("word") =!= col("cat")).count()
    assert(bad == 0)
  }

  test("deterministic under repartition") {
    val df = (1 to 50).map(i => s"tok$i data spark data spark").toDF("text")
    val a = Bpe.train(df, "text", 4).collect().toSeq
    val b = Bpe.train(df.repartition(13), "text", 4).collect().toSeq
    assert(a == b)
  }
}
