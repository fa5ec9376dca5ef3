package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: images/audio/video as opaque `binary`
  * columns with typed metadata, plus the decode → featurize plumbing
  * a training-data pipeline runs over them.
  *
  * Decode is REAL for every format the testdata carries: PNG through
  * the pure-JVM [[Png]] codec (inflate + all five filters; q85 pins
  * exact channel sums against a formula-replaying oracle), WAV
  * through [[WavDecoder]] (RIFF/PCM16, q91), Y4M video through
  * [[Y4mDecoder]] (O(1) frame seek, q92), and BMP/JPEG through the
  * JDK's ImageIO ([[ImageIoCodec]], q90). [[DecodeStub.features]]
  * remains only for genuinely codec-less formats, deriving
  * deterministic fake features from the content bytes so the
  * pipeline shape stays testable. Everything around the decoder
  * boundary —
  * the schema, the binary-safe fingerprints, magic-byte format
  * sniffing, the per-partition batched extraction, and the
  * frame-sampling plan — is the same Spark plumbing either way,
  * exercised by MultimodalSpec/PngSpec; swapping a stub for a real
  * decoder changes one [[MediaDecoder]] binding.
  */
object Multimodal {

  /** Canonical media-table schema: content plus typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true))), nullable = true)))

  /** Content size in bytes (not characters). */
  def byteSize(bin: Column): Column = length(bin).cast("long")

  /** Binary-safe content fingerprint. */
  def fingerprint(bin: Column): Column = md5(bin)

  /** Magic-byte format sniff from the first bytes of the content —
    * a codegen'd CASE over the hex prefix, no decode needed. Four
    * bytes are hexed although JPEG's magic is only three (FFD8FF):
    * `startsWith` on the hex string matches any prefix length ≤ 4
    * bytes, so shorter magics work and 4 bytes covers the longest. */
  def sniffFormat(bin: Column): Column = {
    val prefix = hex(substring(bin, 1, 4))
    when(prefix.startsWith("89504E47"), "png")
      .when(prefix.startsWith("FFD8FF"), "jpeg")
      .when(prefix.startsWith("47494638"), "gif")
      .when(prefix.startsWith("424D"), "bmp")
      .when(prefix.startsWith("52494646"), "riff") // wav/avi container
      .when(prefix.startsWith("1A45DFA3"), "matroska")
      .otherwise("unknown")
  }

  /** Expression-level stub featurizer: `dim` deterministic doubles in
    * [-0.5, 0.5) derived from the content MD5 — replayable in ANSI
    * SQL, so binary feature queries stay oracle-checkable. */
  def featureStub(bin: Column, dim: Int): Column =
    transform(sequence(lit(0L), lit(dim - 1L)), j =>
      ((conv(substring(md5(bin), 1, 8), 16, 10).cast("long") * (j + 21L)
        + j * 7919L) % lit(1000003L)).cast("double") / 1000003.0 - 0.5)

  /** Frame-sampling plan for video content: one row per sampled frame
    * index (every `stride`-th of `n_frames`), ready to feed a decoder.
    * Pure relational explode — the row explosion is the plan; the
    * pixel fetch happens inside the (stubbed) decode step. */
  def sampleFrames(df: DataFrame, idCol: String, stride: Int): DataFrame =
    df.select(col(idCol), col("meta.n_frames").as("n_frames"))
      .filter(col("n_frames").isNotNull && col("n_frames") > 0)
      .select(col(idCol),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
}

/** The swappable decode boundary: one Embedder-like trait, one stub. */
trait MediaDecoder extends Serializable {
  def dim: Int
  /** Decode + featurize one media blob. A real implementation decodes
    * pixels/samples; the stub hashes bytes. */
  def features(bytes: Array[Byte]): Array[Float]
}

/** Deterministic fake decoder (no codecs in this container). Features
  * are derived from content bytes with an LCG — fixed dim, unit
  * determinism, so the distributed plumbing is fully testable. */
final class DecodeStub(val dim: Int = 16) extends MediaDecoder {
  def features(bytes: Array[Byte]): Array[Float] = {
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    val out = new Array[Float](dim)
    var j = 0
    var s = h
    while (j < dim) {
      s = s * 6364136223846793005L + 1442695040888963407L
      out(j) = ((s >>> 40).toInt / 8388608.0f) - 1.0f
      j += 1
    }
    out
  }
}

object MediaFeatures {
  /** Distributed decode → featurize with per-partition batching: the
    * binary column never passes through the driver; one decoder
    * instance per partition (mirrors Embed.embedDocs — the
    * `mapInPandas` batch shape of a Python deployment). */
  def extract(df: DataFrame, idCol: String, binCol: String,
              decoder: MediaDecoder): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          (id, if (bytes == null) null else decoder.features(bytes))
        }
      }
      .toDF(idCol, "features")
  }
}
