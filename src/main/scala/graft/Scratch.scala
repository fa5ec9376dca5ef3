package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling experiments (not part of the library surface).
  * Edit freely: time a query, dump a plan, probe a cross-engine
  * numeric question — whatever the current investigation needs. */
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
    for (q <- args.drop(1)) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(q)(spark, dir)
      val n = df.count()
      println(f"SCRATCH $q rows=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
      df.show(5, truncate = false)
    }
    spark.stop()
  }
}
