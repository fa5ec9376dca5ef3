package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: the native kernels exposed as SQL functions via
  * spark.sql.extensions. Needs its own SparkSession (extensions apply
  * at session construction), so the shared one is cleared and
  * restored around the suite; the underlying SparkContext is reused.
  */
class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSpec.spark // make sure the shared context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder()
      .master("local[2]")
      // withExtensions (not just the config string): the config path
      // is only consulted when a fresh SparkContext is built, and the
      // suite reuses the shared one
      .withExtensions(new org.apache.spark.sql.graftnative.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    SparkSession.setDefaultSession(SparkSpec.spark)
    SparkSession.setActiveSession(SparkSpec.spark)
  }

  test("graft_dot is callable from SQL") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .collect().head.getDouble(0)
    assert(r == 32.0)
  }

  test("graft_dot matches the HOF form on ragged and null-element arrays") {
    // zip_with null-pads the shorter array and the null propagates
    // through the sum — both forms must return NULL, not a partial sum
    val r = spark.sql(
      """SELECT graft_dot(a, b) AS fused,
                aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D,
                  (acc, x) -> acc + x) AS hof
         FROM VALUES
           (array(1.0D, 2.0D), array(3.0D)),
           (array(1.0D, CAST(NULL AS DOUBLE)), array(3.0D, 4.0D)),
           (CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)),
           (array(1.0D, 2.0D), array(3.0D, 4.0D)) AS t(a, b)""")
      .collect()
    r.foreach { row =>
      assert(row.isNullAt(0) == row.isNullAt(1))
      if (!row.isNullAt(0)) assert(row.getDouble(0) == row.getDouble(1))
    }
    assert(r.count(_.isNullAt(0)) == 3)
  }

  test("optimizer rewrites the HOF dot-product idiom into the fused kernel") {
    // inputs derived from range() so constant folding can't collapse
    // the plan before the rewrite is observable
    spark.sql(
      """SELECT array(CAST(id AS DOUBLE) + 1.0D, 2.0D, 3.0D) AS a,
              array(4.0D, 5.0D, 6.0D) AS b FROM range(1)""")
      .createOrReplaceTempView("vecs")
    val df = spark.sql(
      """SELECT aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D,
           (acc, x) -> acc + x) AS d FROM vecs""")
    assert(df.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    assert(df.collect().head.getDouble(0) == 32.0)
  }

  test("graft_l2norm and graft_pq_reconstruct are callable from SQL") {
    val n = spark.sql(
      "SELECT graft_l2norm(array(3.0D, 4.0D)) AS v").head.getSeq[Double](0)
    assert(math.abs(n(0) - 0.6) < 1e-9 && math.abs(n(1) - 0.8) < 1e-9)
    // 2 subspaces of 1 dim, codebook {[0,0],[1,10]}: x=[0.9, 9.0]
    // quantizes to entry 1 in both subspaces -> reconstruct [1.0, 10.0]
    val r = spark.sql(
      """SELECT graft_pq_reconstruct(array(0.9D, 9.0D),
           array(array(0.0D, 0.0D), array(1.0D, 10.0D)), 2) AS v""")
      .head.getSeq[Double](0)
    assert(r == Seq(1.0, 10.0))
  }

  test("graft_topk aggregates per group from SQL") {
    spark.sql(
      """SELECT * FROM VALUES (1L, 10L, 0.5D), (1L, 11L, 0.9D), (1L, 12L, 0.7D),
         (2L, 20L, 0.1D), (2L, 21L, 0.3D) AS t(qid, id, score)""")
      .createOrReplaceTempView("scored")
    val rows = spark.sql(
      """SELECT qid, e.id, e.rank FROM (
           SELECT qid, explode(graft_topk(id, score, 2)) AS e
           FROM scored GROUP BY qid)
         ORDER BY qid, e.rank""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, 11L, 1L), (1L, 12L, 2L), (2L, 21L, 1L), (2L, 20L, 2L)))
  }

  test("graft_cms sketches from SQL and estimates match the Column API") {
    import org.apache.spark.sql.graftnative.CountMinSketch
    import org.apache.spark.sql.functions._
    spark.sql(
      """SELECT * FROM VALUES ('alpha', 3L), ('beta', 2L), ('alpha', 1L)
         AS t(term, w)""").createOrReplaceTempView("cms_in")
    val grid = spark.sql(
      """SELECT graft_cms(CAST(conv(substring(md5(term), 1, 8), 16, 10) AS BIGINT),
                          w, 64, 2) AS g
         FROM cms_in""")
    val est = grid.select(
      CountMinSketch.estimate(col("g"), CountMinSketch.hash32(lit("alpha")), 64, 2),
      CountMinSketch.estimate(col("g"), CountMinSketch.hash32(lit("beta")), 64, 2))
      .first()
    assert(est.getLong(0) === 4L)
    assert(est.getLong(1) === 2L)
    intercept[Exception] {
      spark.sql("SELECT graft_cms(1L, 1L, 64, 0) FROM cms_in").collect()
    }
  }
}
