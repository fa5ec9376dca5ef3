package graft

import org.apache.spark.sql.functions._
import graft.search.{Assign, ClusteredFixture, GraphAnn, IVF}

/** The round-19 two-level BUILD assignment contract: above
  * [[Assign.TwoLevelMinParts]] cells, vectors route through the
  * supercell tables instead of the flat parts-sized fold — and on the
  * clustered fixture the selection must be BIT-IDENTICAL to the flat
  * reference (the same corpus/scale where GraphAnnSpec pins the
  * serving side's two-level selection equality). */
class AssignSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = ClusteredFixture
    .rows(nClusters = 40, perCluster = 40) // 1600 rows
    .toDF("vec_id", "v").localCheckpoint()

  private lazy val cells160 = {
    val c = Assign.routingTableFor(docs, "vec_id", "v", 160).localCheckpoint()
    assert(c.count() >= Assign.TwoLevelMinParts)
    c
  }

  private def collectAssign(df: org.apache.spark.sql.DataFrame): Set[(Long, Int)] =
    df.select(col("id"), col("part")).as[(Long, Int)].collect().toSet

  test("two-level topR equals the flat fold bit-for-bit at 160 cells, r in 1..3") {
    val parts = cells160.count().toInt
    for (r <- 1 to 3) {
      val flat = collectAssign(Assign.flatTopR(docs, "vec_id", "v", cells160, r))
      val two = collectAssign(Assign.topR(docs, "vec_id", "v", cells160, r, parts))
      assert(flat == two,
        s"r=$r: two-level assignment diverged from the flat fold " +
          s"(${(flat diff two).size} missing, ${(two diff flat).size} extra)")
      // every vector got exactly r cells (the fixture's routing is
      // non-degenerate: 160 live cells, far above r)
      val perId = two.groupBy(_._1).map(_._2.size).toSet
      assert(perId == Set(r), s"r=$r: expected exactly $r cells per vector")
    }
  }

  test("below the threshold topR IS the flat fold (plan regime, not just values)") {
    val cells = Assign.routingTableFor(docs, "vec_id", "v", 32).localCheckpoint()
    val n = cells.count().toInt
    assert(n < Assign.TwoLevelMinParts)
    val flat = collectAssign(Assign.flatTopR(docs, "vec_id", "v", cells, 2))
    val auto = collectAssign(Assign.topR(docs, "vec_id", "v", cells, 2, n))
    assert(flat == auto)
  }

  test("superTables recomputation equals an index's persisted round-18 sidecars") {
    // the build assigns through the SAME tables it persists; an
    // append that re-derives (legacy index) must land on the same
    // bits — pure-function determinism is what makes append == rebuild
    // survive the two-level flip
    val path = java.nio.file.Files.createTempDirectory("assign_sidecars").toString
    GraphAnn.writeIndex(docs, "vec_id", "v", m = 8, efC = 48, 160, path)
    val cells = spark.read.parquet(s"$path/routing")
      .select(col("part").cast("int").as("part"),
        col("rvec").cast("array<double>").as("rvec"))
    val parts = cells.count().toInt
    val (supers, members) = Assign.superTables(cells, parts)
    val supersDisk = spark.read.parquet(s"$path/routing2c")
      .select(col("spart").cast("int"), col("srvec").cast("array<double>"))
      .as[(Int, Seq[Double])].collect().toSet
    val supersRe = supers.as[(Int, Seq[Double])].collect().toSet
    assert(supersRe == supersDisk, "recomputed supercells diverged from the sidecar")
    val memDisk = spark.read.parquet(s"$path/routing2")
      .select(col("spart").cast("int"), col("part").cast("int"))
      .as[(Int, Int)].collect().toSet
    val memRe = members.select(col("spart"), col("part"))
      .as[(Int, Int)].collect().toSet
    assert(memRe == memDisk, "recomputed membership diverged from the sidecar")
  }

  test("IVF assignAuto above the threshold matches flat assign and preserves payload columns") {
    val e = docs.select(col("vec_id"), col("v"),
      (col("vec_id") % 7).as("payload"))
    val cents = cells160
      .select(col("part").cast("long").as("cid"), col("rvec").as("cvec"))
      .localCheckpoint()
    val k = cents.count().toInt
    val flat = IVF.assign(e, "vec_id", "v", cents)
      .select(col("vec_id"), col("payload"), col("cid"))
      .as[(Long, Long, Long)].collect().toSet
    val auto = IVF.assignAuto(e, "vec_id", "v", cents, k)
      .select(col("vec_id"), col("payload"), col("cid"))
      .as[(Long, Long, Long)].collect().toSet
    assert(flat == auto, "assignAuto diverged from the flat assign at 160 cells")
  }

  test("a memberless supercell never drops a vector from two-level assignment") {
    // membership is the cells' own top-2 choice, so a supercell can
    // end up memberless; stage 1 must probe only member-bearing
    // supercells or a vector whose top-S supercells are all
    // memberless silently vanishes from the index (the build side
    // has no per-query completeness net). Hand-built fixture:
    // supercell 0 is the nearest to every vector but holds NO
    // members — every vector must still assign.
    val d = 4
    def unit(axis: Int): Seq[Double] =
      Seq.tabulate(d)(i => if (i == axis) 1.0 else 0.0)
    // supercell 0 points along axis 0 (closest to all vectors below);
    // supercells 1..2 hold the actual members
    val supers = Seq(
      (0, unit(0)), (1, unit(1)), (2, unit(2)))
      .toDF("spart", "srvec")
    val members = Seq(
      (1, 10, unit(1)), (1, 11, unit(3)),
      (2, 11, unit(3)), (2, 12, unit(2)))
      .toDF("spart", "part", "rvec")
    val docs = (0L until 8L).map(i => (i, unit(0)))
      .toDF("vec_id", "v")
    val got = graft.search.Assign
      .twoLevelTopR(docs, "vec_id", "v", supers, members, 2)
      .select(col("id"), col("part")).as[(Long, Int)].collect()
    assert(got.map(_._1).distinct.length == 8,
      "every vector must survive two-level assignment even when its " +
        "nearest supercell is memberless")
    assert(got.groupBy(_._1).forall(_._2.length == 2),
      "each vector gets its full replica count from the live supercells")
  }

  test("graph append == rebuild bit-identity holds at two-level scale (parts >= 128)") {
    // the q84-class gate on the NEW assignment path: append routes the
    // delta through the index's persisted sidecars, the rebuild
    // re-derives them from the same routing — same pure function,
    // same bits (node rows AND adjacency)
    val split = 1400L
    val pathA = java.nio.file.Files.createTempDirectory("assign_append").toString
    val pathB = java.nio.file.Files.createTempDirectory("assign_rebuild").toString
    GraphAnn.writeIndex(docs.filter(col("vec_id") < split), "vec_id", "v",
      m = 8, efC = 48, 160, pathA)
    GraphAnn.appendToIndex(spark, pathA,
      docs.filter(col("vec_id") >= split), "vec_id", "v")
    GraphAnn.writeIndexWith(spark.read.parquet(s"$pathA/routing"),
      docs, "vec_id", "v", m = 8, efC = 48, pathB)
    def nodesOf(p: String): Set[(Long, Int, Seq[Long])] =
      GraphAnn.nodesDf(spark, p)
        .select(col("id"), col("part").cast("int"), col("nbrs"))
        .as[(Long, Int, Seq[Long])].collect().toSet
    assert(nodesOf(pathA) == nodesOf(pathB),
      "append over the persisted sidecars diverged from the rebuild " +
        "under the same routing")
  }
}
