package graft

import graft.ingest.Salting
import org.apache.spark.sql.functions._

/** Skew-salted join: identical results to the plain join, hot key
  * spread across salts. */
class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin matches the plain join on a skewed key distribution") {
    // 10k facts, 90% on one hot key
    val fact = spark.range(0, 10000).toDF("id")
      .withColumn("k", when(col("id") % 10 < 9, lit(1L)).otherwise(col("id") % 100))
    val dim = (0L until 100L).map(k => (k, s"name_$k")).toDF("k", "name")

    val plain = fact.join(dim, "k").select("id", "name")
      .as[(Long, String)].collect().toSet
    val salted = Salting.saltedJoin(fact, col("id"), dim, "k", 8)
      .select("id", "name").as[(Long, String)].collect().toSet
    assert(salted == plain)
    assert(salted.size == 10000)
  }

  test("salt is deterministic and bounded") {
    val s = spark.range(0, 1000).toDF("id")
      .select(Salting.salt(col("id"), 8).as("s"))
      .as[Long].collect()
    assert(s.forall(x => x >= 0 && x < 8))
    assert(s.distinct.length == 8) // all salts actually used
  }
}
