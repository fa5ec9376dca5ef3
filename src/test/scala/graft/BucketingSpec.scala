package graft

import org.apache.spark.sql.functions._

/** Bucketed tables: pre-partitioned storage so repeated equi-joins on
  * the bucket key run WITHOUT a shuffle — the at-rest co-location
  * strategy for the embedding/document tables at warehouse scale. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of two tables bucketed on the key plans without an exchange") {
    // default warehouse (warehouse.dir is a static conf); managed
    // tables are dropped at the end so nothing persists. Also clear
    // any stale location dirs a previously-failed run left behind.
    spark.sql("DROP TABLE IF EXISTS emb_b")
    spark.sql("DROP TABLE IF EXISTS meta_b")
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"))
    Seq("emb_b", "meta_b").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) org.apache.commons.io.FileUtils.deleteDirectory(d)
    }

    spark.range(0, 1000).toDF("id")
      .withColumn("v", expr("array(cast(id as double), 1.0d)"))
      .write.bucketBy(8, "id").sortBy("id").saveAsTable("emb_b")
    spark.range(0, 1000).toDF("id")
      .withColumn("label", (col("id") % 5).cast("int"))
      .write.bucketBy(8, "id").sortBy("id").saveAsTable("meta_b")

    // force the sort-merge path: tiny test tables would otherwise be
    // broadcast (which disables bucketing entirely)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("emb_b").join(spark.table("meta_b"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected shuffle-free bucketed join:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(joined.count() == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    spark.sql("DROP TABLE IF EXISTS emb_b")
    spark.sql("DROP TABLE IF EXISTS meta_b")
  }
}
