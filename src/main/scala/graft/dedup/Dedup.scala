package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale corpus curation.
  *
  * Generalizes the reference's exact text dedup
  * (`src/pipeline/pipeline.py:67` pandas `drop_duplicates`) to the
  * family a 100 TB training-data pipeline needs: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, and embedding-cosine near-dup. All
  * hashing is MD5 (identical across engines, so the DuckDB oracle
  * replays signatures bit-for-bit); all pair generation goes through
  * a bucket key so the shuffle is (band, signature)-partitioned and
  * the quadratic candidate join never touches the cross product.
  */
object Dedup {

  /** Normalized text key for exact dedup. */
  def normKey(text: Column): Column = regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Exact dedup: keep first occurrence by id; single hash shuffle. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(normKey(col(textCol))).orderBy(col(idCol).asc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Word n-gram shingles of `text` as an array column (distinct). */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    // guard: sequence(1, x) with x<1 would generate a DESCENDING range
    when(size(toks) >= n,
      array_distinct(
        transform(sequence(lit(1), size(toks) - (n - 1)),
          k => concat_ws(" ", (0 until n).map(o => element_at(toks, k + o)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature value for permutation `perm`: the minimum MD5
    * over the document's shingles, salted by the permutation id.
    * MD5('<perm>:<shingle>') is a uniform permutation of shingle
    * space; the min is the classic MinHash statistic. Returns a
    * (doc-local) array indexed by permutation — no shuffle. */
  def minhashSig(sh: Column, nPerm: Int): Column =
    transform(sequence(lit(0), lit(nPerm - 1)),
      p => array_min(transform(sh, s => md5(concat(p.cast("string"), lit(":"), s)))))

  /** MinHash-LSH candidate pairs: band the signature (`rowsPerBand`
    * consecutive values concatenated), self-join on (band, bandSig).
    * Output: (id1, id2) candidates with id1 < id2, distinct. The join
    * key is the bucket — at scale this is THE trick: shuffle is keyed
    * by (band, sig), identical docs co-locate, nothing else meets. */
  def lshCandidates(df: DataFrame, idCol: String, textCol: String,
                    shingleN: Int, nPerm: Int, rowsPerBand: Int): DataFrame = {
    val nBands = nPerm / rowsPerBand
    // Docs with fewer than shingleN tokens have NO shingles: their
    // minhash would be all-NULL and every such doc would share the
    // same empty bandsig — a quadratic all-pairs blowup of contentless
    // candidates. They carry no n-gram signal, so drop them here.
    val sig = df.select(col(idCol).as("id"),
        shingles(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), minhashSig(col("sh"), nPerm).as("sig"))
    val banded = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(nBands - 1)),
        b => concat_ws("|", (0 until rowsPerBand).map(r =>
          element_at(col("sig"), (b * rowsPerBand) + r + 1)): _*))))
      .toDF("id", "band", "bandsig")
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bandsig") === col("b.bandsig") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
  }

  /** Exact n-gram Jaccard for a pair DataFrame (id1, id2): verify
    * step after LSH candidate generation. Relational: explode both
    * shingle sets, count intersection, |A|+|B|-∩ union. */
  def jaccardVerify(df: DataFrame, idCol: String, textCol: String,
                    pairs: DataFrame, shingleN: Int): DataFrame = {
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol), shingleN).as("sh"))
      .withColumn("nsh", size(col("sh")))
    val a = sh.select(col("id").as("id1"), col("sh").as("sh1"), col("nsh").as("n1"))
    val b = sh.select(col("id").as("id2"), col("sh").as("sh2"), col("nsh").as("n2"))
    pairs.join(a, "id1").join(b, "id2")
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))).cast("double"))
      // two empty shingle sets would divide 0/0 = NaN; define J = 0
      .withColumn("union", col("n1") + col("n2") - col("inter"))
      .withColumn("jaccard",
        when(col("union") > 0, round(col("inter") / col("union"), 4))
          .otherwise(lit(0.0)))
      .select("id1", "id2", "jaccard")
  }

  /** SimHash (16-bit, from the first 4 hex digits of MD5(token)):
    * per bit b, sum +1/-1 over token occurrences by whether bit b of
    * the token hash is set; simhash = Σ 2^b over positive bits.
    * Near-dup docs differ in few bits. Doc-local except one explode +
    * re-aggregate keyed by doc — linear shuffle. */
  def simhash16(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
      .withColumn("h", conv(substring(md5(col("tok")), 1, 4), 16, 10).cast("long"))
    // dynamic bit extraction via exact double pow (h < 2^16)
    val bits = toks.select(col("id"), col("h"),
      explode(sequence(lit(0), lit(15))).as("b"))
      .withColumn("sgn",
        when(floor(col("h") / pow(lit(2.0), col("b"))).cast("long") % 2 === 1, 1)
          .otherwise(-1))
    bits.groupBy("id", "b")
      .agg(sum(col("sgn")).as("v"))
      .groupBy("id")
      .agg(sum(when(col("v") > 0, pow(lit(2.0), col("b")).cast("long")).otherwise(0L))
        .as("simhash"))
  }
}
