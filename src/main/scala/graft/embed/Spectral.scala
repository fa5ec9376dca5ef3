package graft.embed

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spectral embedding diagnostics: the corpus mean vector and the top
  * principal component of the centered embedding matrix, computed by
  * RELATIONAL power iteration — the artifacts of the standard
  * "all-but-the-top" embedding post-process (remove the mean and the
  * top common direction(s); Mu & Viswanath 2018), which pipelines run
  * on a new embedder before committing a corpus to it.
  *
  * Scale shape: each power-iteration step is ONE corpus scan — a
  * per-row fold for the projection s_i = x'_i·v (no row inflation),
  * then a per-dimension aggregate for w_j = Σ_i x'_ij·s_i whose
  * exchange carries d rows per partition. The iterate v is a one-row
  * broadcast. Nothing corpus-sized moves, iterations localCheckpoint
  * like IVF.refine so plan size stays constant.
  *
  * Determinism discipline (the q58/q78 recipe): every cross-row sum
  * quantizes its terms to integers first (1e-6 for data-scale terms,
  * 1e-9 for projection terms), so partial-aggregation merge order
  * cannot change a bit; the remaining arithmetic is elementwise IEEE
  * on identical operands, so the whole iteration — including the
  * quantized-norm normalization — replays exactly in the DuckDB
  * oracle (q89).
  */
object Spectral {

  /** Per-dimension quantized-exact mean as a ONE-ROW (mu: array)
    * frame — order-independent integer sums, like IVF.refine's
    * centroid means. */
  def meanVec(docs: DataFrame, vecCol: String): DataFrame =
    docs.select(posexplode(col(vecCol)))
      .toDF("pos", "x")
      .groupBy("pos")
      .agg((sum(round(col("x") * 1e6).cast("long")).cast("double") /
        (count(lit(1)).cast("double") * 1e6)).as("m"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(transform(col("pm"), p => p.getField("m")).as("mu"))

  /** Quantized-exact norm of a (small, ordered) vector column: the
    * squares are integer-quantized before the fold so the value is a
    * pure function of the element values. */
  private def quantNorm(v: Column): Column =
    sqrt(aggregate(transform(v, x => round(x * x * 1e6).cast("long")),
      lit(0L), (acc, q) => acc + q).cast("double") / 1e6)

  /** Quantized-exact inner product in 1e-9 units (LONG) — the
    * order-independent projection sum of the iteration and the q94
    * correction. */
  def quantDotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, p) => round(x * p * 1e9).cast("long")),
      lit(0L), (acc, q) => acc + q)

  /** Center + project out the top component (UNNORMALIZED — compose
    * with [[normalizeQuant]]). The fold-valued projection is spread
    * via `array_repeat` so it evaluates once per ROW, not once per
    * element (the measured HOF-lambda lesson: VectorF.l2normalizeHof,
    * SCALE.md); the per-element arithmetic is unchanged, so the SQL
    * replay is identical. */
  def removeTopRaw(v: Column, mu: Column, pc: Column): Column = {
    val centered = zip_with(v, mu, (x, m) => x - m)
    val proj = quantDotQ(centered, pc).cast("double") / 1e9
    val scaledPc = zip_with(pc, array_repeat(proj, size(pc)),
      (p, pj) => p * pj)
    zip_with(centered, scaledPc, (x, s) => x - s)
  }

  /** Quantized-exact L2 normalization (the iteration's rule, exposed
    * for the q94 correction pipeline); the norm is spread via
    * `array_repeat` — once per row. */
  def normalizeQuant(v: Column): Column =
    zip_with(v, array_repeat(quantNorm(v) + 1e-9, size(v)), (x, n) => x / n)

  /** Top principal component of the CENTERED embeddings by `iters`
    * power-iteration steps from the deterministic start
    * v0 = (1/√d, …, 1/√d). Returns ONE row (mu, pc). */
  def topComponent(docs: DataFrame, vecCol: String, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val mu = meanVec(docs, vecCol).localCheckpoint()
    val centered = docs.crossJoin(broadcast(mu))
      .select(zip_with(col(vecCol), col("mu"), (x, m) => x - m).as("xc"))
    val d = sqrt(size(col("mu")).cast("double"))
    var v = mu.select(transform(col("mu"), _ => lit(1.0) / d).as("pc"))
      .localCheckpoint()
    for (_ <- 0 until iters) {
      // s_i = x'_i · v, terms quantized at 1e-9 (projection scale)
      val scored = centered.crossJoin(broadcast(v))
        .select(col("xc"),
          (aggregate(zip_with(col("xc"), col("pc"),
            (x, p) => round(x * p * 1e9).cast("long")),
            lit(0L), (acc, q) => acc + q).cast("double") / 1e9).as("s"))
      // w_j = Σ_i x'_ij · s_i, terms quantized at 1e-6 (data scale)
      val next = scored
        .select(col("s"), posexplode(col("xc")))
        .toDF("s", "pos", "x")
        .groupBy("pos")
        .agg(sum(round(col("x") * col("s") * 1e6).cast("long")).as("wq"))
        .agg(array_sort(collect_list(struct(col("pos"), col("wq")))).as("pw"))
        .select(transform(col("pw"), p => p.getField("wq").cast("double") / 1e6).as("w"))
        .select(transform(col("w"), x => x / (quantNorm(col("w")) + 1e-9)).as("pc"))
      v = next.localCheckpoint()
    }
    mu.crossJoin(v)
  }
}
