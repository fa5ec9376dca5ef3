package graft

import graft.embed.Spectral
import org.apache.spark.sql.functions._

/** Relational power iteration: mean exactness, convergence to a known
  * dominant direction, determinism. */
class SpectralSpec extends SparkSpec {
  import spark.implicits._

  test("meanVec equals the driver-side mean to quantization precision") {
    val vecs = Seq(
      Seq(1.0, 2.0, 3.0), Seq(3.0, 2.0, 1.0), Seq(2.0, 5.0, -1.0))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val mu = Spectral.meanVec(df, "v").as[Seq[Double]].head()
    val want = Seq(2.0, 3.0, 1.0)
    mu.zip(want).foreach { case (got, w) => assert(math.abs(got - w) < 1e-5) }
  }

  test("topComponent recovers a planted dominant direction") {
    // variance 100x larger along dimension 0 than elsewhere
    val rows = (0 until 200).map { i =>
      val big = if (i % 2 == 0) 10.0 + i * 0.01 else -10.0 - i * 0.01
      (i.toLong, Seq(big, math.sin(i).abs * 0.3, math.cos(i) * 0.2, 0.1))
    }
    val df = rows.toDF("id", "v")
    val pc = Spectral.topComponent(df, "v", 3)
      .select(col("pc")).as[Seq[Double]].head()
    assert(math.abs(pc(0)) > 0.99, s"expected e0-dominant component, got $pc")
    // unit norm (to quantization precision)
    assert(math.abs(pc.map(x => x * x).sum - 1.0) < 1e-3)
  }

  test("removeTop drives the corrected vectors' projection onto pc to ~0, unit norm") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val art = Spectral.topComponent(emb, "v", 3).localCheckpoint()
    val corrected = emb.crossJoin(broadcast(art))
      .select(col("pc"), Spectral.removeTopRaw(col("v"), col("mu"), col("pc")).as("r"))
      .select(col("pc"), Spectral.normalizeQuant(col("r")).as("c"))
    val stats = corrected.select(
        abs(aggregate(zip_with(col("c"), col("pc"),
          (x, p) => x * p), lit(0.0), (a, x) => a + x)).as("proj"),
        aggregate(transform(col("c"), x => x * x), lit(0.0), (a, x) => a + x).as("nsq"))
      .agg(max(col("proj")), min(col("nsq")), max(col("nsq")))
      .as[(Double, Double, Double)].head()
    assert(stats._1 < 1e-6, s"max |projection| ${stats._1} not ~0 after removal")
    assert(stats._2 > 0.999 && stats._3 < 1.001, s"norms not ~1: $stats")
  }

  test("topComponent is deterministic run-to-run") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    def run() = Spectral.topComponent(emb, "v", 2)
      .select(col("pc")).as[Seq[Double]].head()
    assert(run() == run())
  }
}
