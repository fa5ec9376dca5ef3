package graft

import org.apache.spark.sql.functions._

/** Sketch aggregates for corpus-scale statistics: HyperLogLog++
  * distinct counts and approximate quantiles — the constant-memory
  * summaries a 100 TB profile pass runs instead of exact aggregation.
  * Catalyst ships both (approx_count_distinct / approx_percentile);
  * these specs pin their error contracts on real corpus data. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("HLL++ distinct term count stays within rsd of the exact count") {
    val terms = docs.select(explode(graft.lexical.BM25.tokens(col("text"))).as("t"))
    val exact = terms.select(countDistinct(col("t"))).as[Long].head()
    val approx = terms.select(approx_count_distinct(col("t"), rsd = 0.05))
      .as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.15,
      s"approx=$approx exact=$exact")
  }

  test("approximate median of doc length brackets the exact median") {
    val lens = docs.select(length(col("text")).cast("double").as("len"))
    val exact = lens.stat.approxQuantile("len", Array(0.5), 0.0).head // relErr 0 = exact
    val approx = lens.select(
      percentile_approx(col("len"), lit(0.5), lit(100))).as[Double].head()
    assert(math.abs(approx - exact) / exact < 0.1, s"approx=$approx exact=$exact")
  }

  test("sketches aggregate per group (distinct terms per language)") {
    val perLang = docs
      .select(col("lang"), explode(graft.lexical.BM25.tokens(col("text"))).as("t"))
      .groupBy("lang")
      .agg(approx_count_distinct(col("t")).as("n_terms"))
      .as[(String, Long)].collect().toMap
    assert(perLang.nonEmpty)
    perLang.values.foreach(v => assert(v > 0))
  }
}
