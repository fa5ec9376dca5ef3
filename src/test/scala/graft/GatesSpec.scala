package graft

import org.apache.spark.sql.functions._

/** Pins [[Gates]] to the exceptAll idiom it replaced (round 19): for
  * every case the old gate and the new gate must agree — including
  * multiplicity, null, NaN, array-column and positional-rename
  * corners the rewrite must not change. */
class GatesSpec extends SparkSpec {

  import spark.implicits._

  private def oldSame(a: org.apache.spark.sql.DataFrame,
                      b: org.apache.spark.sql.DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  private def oldCount(a: org.apache.spark.sql.DataFrame,
                       b: org.apache.spark.sql.DataFrame): Long =
    a.exceptAll(b).unionByName(b.toDF(a.columns: _*).exceptAll(a)).count()

  test("equal multisets with duplicate rows: sameRows true, diff 0") {
    val a = Seq((1L, "x"), (1L, "x"), (2L, "y")).toDF("id", "t")
    val b = Seq((2L, "y"), (1L, "x"), (1L, "x")).toDF("id", "t")
    assert(Gates.sameRows(a, b) === oldSame(a, b))
    assert(Gates.sameRows(a, b))
    assert(Gates.symDiffCount(a, b) === 0L)
  }

  test("an extra copy on one side fails the gate both ways") {
    val a = Seq((1L, "x"), (1L, "x")).toDF("id", "t")
    val b = Seq((1L, "x")).toDF("id", "t")
    assert(!Gates.sameRows(a, b) && !oldSame(a, b))
    assert(!Gates.sameRows(b, a))
    assert(Gates.symDiffCount(a, b) === oldCount(a, b))
    assert(Gates.symDiffCount(a, b) === 1L)
  }

  test("disjoint rows count on both sides of the symmetric diff") {
    val a = Seq((1L, "x"), (3L, "z")).toDF("id", "t")
    val b = Seq((1L, "x"), (4L, "w"), (4L, "w")).toDF("id", "t")
    assert(Gates.symDiffCount(a, b) === oldCount(a, b))
    assert(Gates.symDiffCount(a, b) === 3L)
    assert(!Gates.sameRows(a, b))
  }

  test("null cells compare null-safe, exactly like exceptAll") {
    val a = Seq((Some(1L), Option.empty[String]), (None, Some("y")))
      .toDF("id", "t")
    val b = Seq((None, Some("y")), (Some(1L), Option.empty[String]))
      .toDF("id", "t")
    assert(Gates.sameRows(a, b) === oldSame(a, b))
    assert(Gates.sameRows(a, b))
    val c = Seq((Some(1L), Some("y"))).toDF("id", "t")
    assert(!Gates.sameRows(a, c) && !oldSame(a, c))
  }

  test("NaN groups as equal to NaN, exactly like exceptAll") {
    val a = Seq((1L, Double.NaN), (2L, 0.5)).toDF("id", "s")
    val b = Seq((2L, 0.5), (1L, Double.NaN)).toDF("id", "s")
    assert(Gates.sameRows(a, b) === oldSame(a, b))
    assert(Gates.sameRows(a, b))
  }

  test("array columns (the vector/code gate shape) compare by value") {
    val a = Seq((1L, Seq(0.1, 0.2)), (2L, Seq(0.3, 0.4)))
      .toDF("id", "v")
    val b = Seq((2L, Seq(0.3, 0.4)), (1L, Seq(0.1, 0.2)))
      .toDF("id", "v")
    assert(Gates.sameRows(a, b) === oldSame(a, b))
    assert(Gates.sameRows(a, b))
    val c = Seq((1L, Seq(0.1, 0.2)), (2L, Seq(0.3, 0.41)))
      .toDF("id", "v")
    assert(!Gates.sameRows(a, c) && !oldSame(a, c))
  }

  test("b's columns align positionally, not by name") {
    val a = Seq((1L, "x")).toDF("id", "t")
    val b = Seq((1L, "x")).toDF("other", "name")
    assert(Gates.sameRows(a, b) === oldSame(a, b))
    assert(Gates.sameRows(a, b))
  }

  test("empty frames: equal to each other, unequal to non-empty") {
    val a = Seq.empty[(Long, String)].toDF("id", "t")
    val b = Seq.empty[(Long, String)].toDF("id", "t")
    val c = Seq((1L, "x")).toDF("id", "t")
    assert(Gates.sameRows(a, b) && oldSame(a, b))
    assert(!Gates.sameRows(a, c) && !oldSame(a, c))
    assert(Gates.symDiffCount(a, c) === 1L)
    assert(Gates.symDiffCount(a, b) === 0L)
  }

  test("the gate plans ONE aggregate over ONE union, not two") {
    val a = Seq((1L, "x")).toDF("id", "t")
    val b = Seq((1L, "x")).toDF("id", "t")
    val plan = a.withColumn("__gate_w", lit(1L))
      .unionByName(b.withColumn("__gate_w", lit(-1L)))
      .groupBy(col("id"), col("t")).agg(sum(col("__gate_w")).as("__gate_d"))
      .where(col("__gate_d") =!= 0L)
      .queryExecution.optimizedPlan
    val unions = plan.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
    }
    assert(unions.length === 1)
  }
}
