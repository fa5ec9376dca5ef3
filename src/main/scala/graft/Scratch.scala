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
      // optional single-query dump for a targeted tools/oracle_check.py run
      sys.env.get("SCRATCH_OUT").foreach { out =>
        df.coalesce(1).write.mode("overwrite").parquet(s"$out/$q")
        val sql = SparkEntry.oracleSql.get(q).map(x =>
          "\"" + x.replace("\\", "\\\\").replace("\"", "\\\"")
            .replace("\n", "\\n").replace("\t", "\\t") + "\"").getOrElse("null")
        java.nio.file.Files.write(java.nio.file.Paths.get(s"$out/oracle_sql.json"),
          s"""{"$q": $sql}""".getBytes)
      }
    }
    spark.stop()
  }
}
