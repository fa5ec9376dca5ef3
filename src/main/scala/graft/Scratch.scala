package graft

import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling experiments (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count() // warmup

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIME $label rows=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    time("shingleRows")(Dedup.shingleRows(docs, "doc_id", "text", 3).count())
    time("banded")(Dedup.bandedSignatures(docs, "doc_id", "text", 3, 16, 4).count())
    val pairs = Dedup.lshCandidates(docs, "doc_id", "text", 3, 16, 4)
    time("lshCandidates")(pairs.count())
    time("q31_full")(Dedup.jaccardVerify(docs, "doc_id", "text", pairs, 3).count())
    // q47 tail stages in isolation
    import graft.text.TextAnalysis._
    time("exact_dedup")(Dedup.exact(docs, "text", "doc_id").count())
    time("quality_only")(docs.select(col("doc_id"),
      qualityScore(col("text")).as("q")).filter(col("q") >= 0.5).count())
    time("langid_only")(docs.select(col("doc_id"),
      langId(col("text")).as("l")).filter(col("l") === "en").count())
    time("q47_full")(CurationQueries.all("q47_curation_e2e")(spark, dir).count())
    spark.stop()
  }
}
