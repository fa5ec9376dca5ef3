package graft

import graft.multimodal.Multimodal
import graft.streaming.Streaming
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal + streaming query catalog. q50 exercises the binary
  * column path (documents' text bytes standing in for media blobs —
  * same typed plumbing); q60 runs the streaming sessionizer in batch
  * mode over the events table, with a gaps-and-islands SQL oracle.
  */
object PipelineQueries {

  /** Binary content analysis: byte size, binary-safe fingerprint,
    * sniffed format, and the first two stub features. Per-row
    * expressions only — scales with the scan. */
  def q50BinaryFeatures(s: SparkSession, dir: String): DataFrame = {
    val bin = col("text").cast("binary")
    val feats = Multimodal.featureStub(bin, 4)
    graft.sources.Tables.load(s, dir, "documents")
      .filter(col("doc_id") < 200)
      .select(col("doc_id"),
        Multimodal.byteSize(bin).as("n_bytes"),
        Multimodal.fingerprint(bin).as("fp"),
        Multimodal.sniffFormat(bin).as("fmt"),
        round(element_at(feats, 1), 6).as("feat0"),
        round(element_at(feats, 2), 6).as("feat1"))
      .orderBy("doc_id")
  }

  val q50Sql: String = {
    val h = "('0x' || substr(md5(text), 1, 8))::BIGINT"
    def feat(j: Int) = s"ROUND((($h * ${j + 21} + $j * 7919) % 1000003) / 1000003.0 - 0.5, 6)"
    // the magic-byte CASE replays Multimodal.sniffFormat exactly:
    // hex() of the UTF-8 bytes, prefix-matched per format — a document
    // whose text happens to begin with 'RIFF' etc. must sniff the same
    // in both engines
    val fmt =
      """CASE WHEN substr(hex(encode(text)), 1, 8) = '89504E47' THEN 'png'
              WHEN substr(hex(encode(text)), 1, 6) = 'FFD8FF'   THEN 'jpeg'
              WHEN substr(hex(encode(text)), 1, 8) = '47494638' THEN 'gif'
              WHEN substr(hex(encode(text)), 1, 8) = '52494646' THEN 'riff'
              WHEN substr(hex(encode(text)), 1, 8) = '1A45DFA3' THEN 'matroska'
              ELSE 'unknown' END"""
    s"""SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS fp,
       $fmt AS fmt,
       ${feat(0)} AS feat0,
       ${feat(1)} AS feat1
       FROM documents WHERE doc_id < 200 ORDER BY doc_id"""
  }

  /** Per-user session windows (30-minute gap) over the events table —
    * the Structured Streaming sessionizer run in batch mode; the
    * oracle replays it as gaps-and-islands SQL. Timestamps emitted as
    * epoch micros so both engines hash identically. */
  def q60Sessionize(s: SparkSession, dir: String): DataFrame =
    Streaming.sessionize(Queries.eventsTable(s, dir), "30 minutes")
      .select(col("user_id"),
        unix_micros(col("session_start")).as("start_us"),
        col("n_events"),
        round(col("sum_value") * 100).cast("long").as("sum_value_c"))
      .orderBy("user_id", "start_us")

  val q60Sql: String =
    """WITH lagd AS (SELECT user_id, ts, value,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM events),
       flag AS (SELECT *, CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 30 MINUTE
           THEN 1 ELSE 0 END AS new_s FROM lagd),
       sess AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
           ROWS UNBOUNDED PRECEDING) AS sid FROM flag)
       SELECT user_id, CAST(epoch_us(MIN(ts)) AS BIGINT) AS start_us,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
       FROM sess GROUP BY user_id, sid ORDER BY user_id, start_us"""

  /** The reference's full baseline dataflow (SURVEY §3.1) as ONE
    * declarative pipeline: ingest → clean → dedup-first → distributed
    * embed → multi-query exact kNN → resolve ids back to snippets.
    * Everything stays on executors; the only driver materialization
    * is the driver-contract result itself. Rows-only check (the
    * embedder hash isn't ANSI-SQL-expressible); every stage is
    * individually oracle-checked or spec-covered elsewhere. */
  def q46PipelineE2e(s: SparkSession, dir: String): DataFrame = {
    import graft.ingest.Ingest
    val raw = graft.sources.Tables.load(s, dir, "documents")
    val cleaned = raw.select(col("doc_id"),
      Ingest.cleanText(col("text")).as("text"))
    val deduped = Ingest.dedupFirst(cleaned, col("text"), col("doc_id"))
    val embedded = graft.embed.Embed
      .embedDocs(deduped, "doc_id", "text", new graft.embed.HashEmbedder(64))
      .select(col("doc_id"), col("vec").cast("array<double>").as("v"))
    val queries = embedded.filter(col("doc_id") < 3)
      .select(col("doc_id").as("qid"), col("v").as("qv"))
    val hits = graft.search.Search
      .multiTopK(embedded, "doc_id", "v", queries, "qid", "qv", 5)
    hits.join(raw.select(col("doc_id"), Ingest.snippet(col("text"), 40).as("snippet")),
        "doc_id")
      .select(col("qid"), col("rank"), col("doc_id"), col("score"), col("snippet"))
      .orderBy("qid", "rank")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q46_pipeline_e2e" -> (q46PipelineE2e _),
    "q50_binary_features" -> (q50BinaryFeatures _),
    "q60_sessionize" -> (q60Sessionize _))

  val oracle: Map[String, String] = Map(
    "q50_binary_features" -> q50Sql,
    "q60_sessionize" -> q60Sql)
}
