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
    for (q <- Seq("q62_asof_join", "q63_cms_heavy_hitters",
                  "q64_bucketed_join", "q65_salted_join", "q66_range_join")) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(q)(spark, dir)
      val n = df.count()
      println(f"SMOKE $q rows=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
      df.show(5, truncate = false)
    }
    spark.stop()
  }
}
