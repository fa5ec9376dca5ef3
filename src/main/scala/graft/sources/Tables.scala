package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loading for the driver testdata layout
  * (`/root/testdata/sf{N}/NAME.parquet`, see TESTDATA.md).
  *
  * Mirrors the reference's two ingest surfaces — CSV scan
  * (reference `src/pipeline/pipeline.py:26-29`) and Parquet reload
  * (`src/pipeline/evaluation.py:75`) — generalized to a named-table
  * catalog. All reads are plain `spark.read.parquet`, so Catalyst's
  * vectorized Parquet scan, predicate pushdown, and column pruning
  * apply to every downstream operator for free.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** CSV ingest with the reference's options (header, multiLine,
    * quote-escape `"`) — reference `src/pipeline/pipeline.py:26-29`. */
  def csv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .csv(path)
}
