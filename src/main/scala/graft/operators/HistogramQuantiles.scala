package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed quantiles over a quantized value column, via the
  * histogram trick: aggregate (key, value-bucket) counts, cumulative-
  * sum over buckets within each key, and read the threshold off the
  * cumulative histogram.
  *
  * The built-in exact `percentile` aggregate buffers every value of a
  * group on one task — at 100 TB a per-language quality quantile
  * would pull a corpus-sized value list onto a handful of tasks. Here
  * the shuffle carries one row per DISTINCT bucket (bounded by the
  * value resolution, e.g. 10^4 for 4-decimal scores), the per-key
  * window runs over that bounded bucket list, and everything is
  * integer arithmetic — exact, skew-proof, and SQL-replayable.
  * `approx_percentile` trades the exactness for one pass; this trades
  * value resolution instead, which for already-rounded scores is free.
  */
object HistogramQuantiles {

  /** Per-key type-1 (lower) quantile thresholds: for each percent p,
    * the smallest value whose cumulative count reaches ceil(p·N/100)
    * — expressed as the integer comparison 100·cum ≥ p·N, so no
    * floating point is involved anywhere.
    *
    * `value` must be integral (pre-quantized by the caller). Returns
    * (key, percent, threshold).
    */
  /** Internal + output column names; caller frames must not use them. */
  private val reserved = Set("__n", "__cum", "__N", "percent", "threshold")

  def thresholds(df: DataFrame, key: String, value: String,
                 percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      s"percents must be in [1, 100], got ${percents.mkString(", ")}")
    require(!reserved(key) && !reserved(value),
      s"thresholds reserves column names ${reserved.mkString(", ")}; rename $key/$value")
    // quantiles are over the NON-NULL values: a null bucket would sort
    // first under Spark's NULLS FIRST and shift every threshold down
    // (and diverge from SQL replays, which default to NULLS LAST)
    val hist = df.filter(col(value).isNotNull)
      .groupBy(col(key), col(value)).agg(count(lit(1)).as("__n"))
    val wCum = Window.partitionBy(col(key)).orderBy(col(value))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(key))
    hist.select(col(key), col(value),
        sum(col("__n")).over(wCum).as("__cum"),
        sum(col("__n")).over(wAll).as("__N"))
      .withColumn("percent", explode(array(percents.map(lit(_)): _*)))
      .filter(col("__cum") * 100 >= col("percent") * col("__N"))
      .groupBy(col(key), col("percent"))
      .agg(min(col(value)).as("threshold"))
  }
}
