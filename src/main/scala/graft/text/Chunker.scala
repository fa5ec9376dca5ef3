package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the context-window prep step a
  * training/RAG pipeline runs between curation and embedding: split
  * each document into overlapping fixed-size token windows (chunk i
  * starts at token `i*stride + 1`, covers up to `chunkSize` tokens,
  * the tail chunk may be short). Generalizes the reference's
  * whole-document embedding unit (`src/pipeline/pipeline.py:169`
  * embeds one row per document) to the chunked unit real pipelines
  * feed to bounded-context encoders.
  *
  * Scale notes: per-row generate-and-slice — one codegen'd projection,
  * no shuffle, no UDF; output size is `Σ ceil(n_tokens/stride)` rows,
  * linear in the scan. The token array is materialized ONCE per row
  * (bound attribute) before the window expressions reference it, per
  * the measured guidance in [[graft.dedup.Dedup.shinglesFromToks]].
  */
object Chunker {

  /** One row per (document, chunk): `(id, chunk_id, start_tok, n_toks,
    * chunk_text)`. `chunk_id` is 0-based and dense per document;
    * `start_tok` is the 1-based token offset. Every document yields at
    * least one chunk (the tokenizer never returns an empty array). */
  def chunkRows(df: DataFrame, idCol: String, textCol: String,
                chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    df.select(col(idCol), TextAnalysis.toks(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(1), size(col("__toks")), lit(stride))))
      .select(
        col(idCol),
        col("pos").cast("long").as("chunk_id"),
        col("col").cast("long").as("start_tok"),
        least(size(col("__toks")) - col("col") + 1, lit(chunkSize))
          .cast("long").as("n_toks"),
        array_join(slice(col("__toks"), col("col"), lit(chunkSize)), " ")
          .as("chunk_text"))
  }
}
