package graft.embed

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Document embedding (SURVEY §2.4, E1–E3).
  *
  * The reference embeds with SentenceTransformer batches ON THE
  * DRIVER (`src/pipeline/pipeline.py:80-104`) and ships a dead-code
  * distributed variant (`src/pipeline/embedding.py:31-41`). The
  * distributed variant is the right shape, so that is what this is:
  * `mapPartitions` over the corpus, one model instantiation per
  * partition, executor-side batching — swap `HashEmbedder` for a real
  * ONNX/JNI encoder without touching the dataflow.
  *
  * Contract (all the downstream math relies on): fixed dimension,
  * L2-normalized float vectors, deterministic for a given text.
  */
trait Embedder extends Serializable {
  def dim: Int
  def embed(text: String): Array[Float]
}

/** Deterministic hashed token-projection embedder: each token is
  * hashed (MurmurHash3, seeded) to `dim` buckets with a sign bit —
  * the classic feature-hashing trick — then the doc vector is
  * L2-normalized. No network, no weights, reproducible in-JVM.
  */
final class HashEmbedder(val dim: Int = 64, seed: Int = 42) extends Embedder {
  def embed(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    val toks = text.toLowerCase.trim.split("\\s+")
    var i = 0
    while (i < toks.length) {
      val h = scala.util.hashing.MurmurHash3.stringHash(toks(i), seed)
      val idx = math.floorMod(h, dim)
      val sgn = if (((h >>> 16) & 1) == 1) 1.0f else -1.0f
      v(idx) += sgn
      i += 1
    }
    var norm = 0.0
    var j = 0
    while (j < dim) { norm += v(j).toDouble * v(j); j += 1 }
    val inv = (1.0 / (math.sqrt(norm) + 1e-9)).toFloat
    j = 0
    while (j < dim) { v(j) *= inv; j += 1 }
    v
  }
}

/** Same feature-hashing embedder with the engine's CROSS-ENGINE
  * portable token hash (first 8 md5 hex chars, the TextAnalysis /
  * CountMinSketch convention) instead of JVM MurmurHash — which makes
  * the whole embed→search dataflow SQL-replayable, putting the
  * embedding queries under the DuckDB oracle gate like everything
  * else. Numeric discipline for bit-exact replay: bucket counts are
  * exact integers (order-free sums), the normalize runs in double,
  * and each element is rounded to float ONCE (a single
  * correctly-rounded conversion — no float accumulation anywhere, so
  * no double-rounding divergence between engines). */
final class PortableHashEmbedder(val dim: Int = 64) extends Embedder {
  /** Tokenizer chosen for EXACT cross-engine agreement: non-empty
    * maximal runs of non-whitespace, with the whitespace class spelled
    * out (Java's \s includes \x0B, RE2's does not) — no trim (Java
    * trim strips \n\t\r, SQL TRIM strips spaces only) and no
    * split-empty-token edge cases on either side. Locale.ROOT
    * lowercase so a Turkish default locale cannot change 'I'.
    * SQL replay: regexp_extract_all(lower(text), '[^ \t\n\r\f]+'). */
  private val tokenRe = java.util.regex.Pattern.compile("[^ \t\n\r\f]+")

  def embed(text: String): Array[Float] = {
    val c = new Array[Long](dim)
    // one digest instance per call, value read directly off the first
    // 4 digest bytes (big-endian) — identical to parsing the first 8
    // md5 hex chars, without the hex round-trip per token
    val md = java.security.MessageDigest.getInstance("MD5")
    val m = tokenRe.matcher(text.toLowerCase(java.util.Locale.ROOT))
    while (m.find()) {
      val d = md.digest(m.group().getBytes("UTF-8"))
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val idx = (h % dim).toInt
      c(idx) += (if (((h >>> 16) & 1L) == 1L) 1L else -1L)
    }
    var norm = 0.0
    var j = 0
    while (j < dim) { norm += c(j).toDouble * c(j); j += 1 }
    // divide (NOT multiply by a reciprocal): the SQL replay writes
    // c / nrm, and IEEE division and reciprocal-multiply round
    // differently
    val nrm = math.sqrt(norm) + 1e-9
    val v = new Array[Float](dim)
    j = 0
    while (j < dim) { v(j) = (c(j).toDouble / nrm).toFloat; j += 1 }
    v
  }
}

object Embed {
  /** E1/E3: distributed embedding — one Embedder per partition,
    * vectors never pass through the driver. */
  def embedDocs(docs: DataFrame, idCol: String, textCol: String,
                embedder: Embedder): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pairs: Dataset[(Long, String)] =
      docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
    pairs.mapPartitions { it =>
      it.map { case (id, text) => (id, embedder.embed(text)) }
    }.toDF(idCol, "vec")
  }

  /** E2: attribute text build `"{name} {gender} {age} {city}"`
    * (reference `src/pipeline/pipeline_mode.py:68-75`). */
  def attrText(cols: Seq[String]): org.apache.spark.sql.Column =
    concat_ws(" ", cols.map(c => coalesce(col(c).cast("string"), lit(""))): _*)

  /** E2/E3 fused: embed BOTH the document text and its attribute text
    * in ONE mapPartitions pass — one corpus scan, two embedders per
    * partition, no join between two embedding passes. (The reference
    * makes two separate driver-side `model.encode` passes,
    * `src/pipeline/pipeline_mode.py:62,74-76`; at corpus scale one
    * scan strictly dominates two scans + an id join.) */
  def embedDocsAttr(docs: DataFrame, idCol: String, textCol: String,
                    attrCol: String, textEmb: Embedder,
                    attrEmb: Embedder): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol), col(attrCol))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        it.map { case (id, t, a) => (id, textEmb.embed(t), attrEmb.embed(a)) }
      }.toDF(idCol, "vec", "avec")
  }
}
