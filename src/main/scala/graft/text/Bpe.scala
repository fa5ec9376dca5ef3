package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational BPE-style tokenizer induction — the vocabulary-training
  * step a pipeline runs over a curated corpus before tokenizing it
  * (the trainer behind the "BPE-ish" subword counter the reference's
  * re-expression already ships in [[TextAnalysis]]). Classic
  * byte-pair encoding (Sennrich et al., 2016): count adjacent symbol
  * pairs across the word vocabulary, merge the most frequent pair
  * into one symbol, repeat. Rounds are UNROLLED (the q58 Lloyd /
  * q89 power-iteration discipline) so the whole trainer is a
  * deterministic relational plan the DuckDB oracle replays verbatim.
  *
  * Symbol encoding: a word's split is a string with `||` between
  * symbols and `||` at both ends (`low` -> `||l||o||w||`). Merging
  * pair (A, B) is then the LITERAL string replace
  * `|A||B|` -> `|AB|`: the doubled delimiter leaves one `|` on each
  * side untouched, so left-to-right replace with consumption is
  * boundary-safe for back-to-back occurrences (`||a||b||a||b||`
  * merges BOTH `ab`s in one pass) and cannot match across a symbol
  * boundary (a symbol is always flanked by `||`, and symbols never
  * contain `|` — the trainer filters words to `^[a-z0-9]+$`, the
  * standard pre-filter). Spark's `replace` and DuckDB's `replace`
  * share these literal left-to-right semantics, which is what makes
  * the trainer oracle-checkable.
  *
  * Scale shape: ONE corpus-sized shuffle (the word-count aggregate —
  * the explode feeding it is map-side-combined); every round after
  * operates on the VOCABULARY (distinct words x counts), exactly like
  * production BPE trainers. Per round: a vocab-sized pair explode +
  * hash aggregate, a 1-row argmax broadcast, and a per-word literal
  * replace projection. Tie-breaks are total-ordered (count desc, pair
  * asc), so the learned merge table is deterministic at any
  * parallelism.
  */
object Bpe {

  /** Word vocabulary with counts and the initial symbol string:
    * `(word, n, sym)`. */
  def vocab(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(graft.dedup.Dedup.tokenize(col(textCol))).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .withColumn("sym",
        concat(lit("|"), regexp_replace(col("word"), "(.)", "|$1|"), lit("|")))

  /** Adjacent symbol pairs of one round's vocab, weighted by word
    * count: `(pair, cnt)` with pair encoded `A|B`. Fully-merged /
    * single-char words have one symbol and contribute no pairs —
    * guarded like [[graft.dedup.Dedup.shinglesFromToks]], because
    * `sequence(1, 0)` is a DESCENDING range and would drive
    * `element_at` out of bounds under ANSI. */
  def pairCounts(v: DataFrame): DataFrame = {
    val els = filter(split(col("sym"), "\\|\\|"), x => x =!= "")
    val pairs = transform(sequence(lit(1), size(col("els")) - 1),
      i => concat(element_at(col("els"), i), lit("|"),
        element_at(col("els"), i + 1)))
    v.select(col("n"), els.as("els"))
      .select(col("n"), explode(when(size(col("els")) >= 2, pairs)
        .otherwise(array().cast("array<string>"))).as("pair"))
      .groupBy("pair").agg(sum(col("n")).as("cnt"))
  }

  /** The round's winning merge (count desc, pair asc — total order). */
  def topPair(pairs: DataFrame): DataFrame =
    pairs.orderBy(col("cnt").desc, col("pair").asc).limit(1)

  /** Apply a (broadcast, one-row) merge to every word's symbol
    * string: literal `|A||B|` -> `|AB|`. A left join on TRUE rather
    * than a cross join, so an EMPTY merge frame (vocab fully merged
    * before the round budget ran out) is a no-op instead of wiping
    * the vocabulary. */
  def applyMerge(v: DataFrame, merge: DataFrame): DataFrame = {
    val pa = split(col("pair"), "\\|").getItem(0)
    val pb = split(col("pair"), "\\|").getItem(1)
    v.join(broadcast(merge.select(pa.as("__a"), pb.as("__b"))), lit(true), "left")
      .withColumn("sym", when(col("__a").isNull, col("sym")).otherwise(expr(
        "replace(sym, concat('|', __a, '||', __b, '|'), concat('|', __a, __b, '|'))")))
      .drop("__a", "__b")
  }

  /** Train `rounds` merges; returns `(round, pair, cnt)`, one row per
    * learned merge in order. The corpus is touched ONCE (the word
    * vocab is checkpointed); each round's merged vocab is
    * checkpointed too, so round r re-reads a vocab-sized table
    * instead of replaying r replace projections — plan depth and
    * per-round cost stay constant no matter how many merges are
    * trained. */
  def train(df: DataFrame, textCol: String, rounds: Int): DataFrame =
    trainLoop(df, textCol, rounds)._1

  /** The final vocabulary `(word, n, sym)` after `rounds` merges —
    * the ENCODE table: a word's subword split is its sym string. */
  def trainedVocab(df: DataFrame, textCol: String, rounds: Int): DataFrame =
    trainLoop(df, textCol, rounds)._2

  /** One pass of the trainer, returning BOTH artifacts: the merge
    * table and the final vocabulary (callers wanting both should call
    * this once — each frame is checkpoint-backed). */
  private[graft] def trainLoop(df: DataFrame, textCol: String,
      rounds: Int): (DataFrame, DataFrame) = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var v = vocab(df, textCol).localCheckpoint()
    var out: DataFrame = null
    for (r <- 1 to rounds) {
      val m = topPair(pairCounts(v)).localCheckpoint()
      val row = m.select(lit(r.toLong).as("round"), col("pair"), col("cnt"))
      out = if (out == null) row else out.unionAll(row)
      v = applyMerge(v, m).localCheckpoint()
    }
    (out.orderBy("round"), v)
  }

  /** Number of subword symbols in a sym string. */
  def symCount(sym: Column): Column =
    size(filter(split(sym, "\\|\\|"), x => x =!= ""))
}
