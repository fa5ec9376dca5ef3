package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling experiments (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries("q42_mmr")(spark, dir).show(20, truncate = false)
    SparkEntry.queries("q57_rag_e2e")(spark, dir).show(20, truncate = false)
    spark.stop()
  }
}
