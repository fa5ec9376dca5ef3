package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded time-range (interval) join: pairs every left row with the
  * right rows of the same key whose timestamp falls in
  * [left.ts, left.ts + window] — "what happened on this key within W
  * after the anchor event". The companion of [[AsOfJoin]] for
  * window-attribution instead of point-in-time enrichment.
  *
  * Spark plans the naive formulation (`l.key = r.key AND r.ts BETWEEN
  * l.ts AND l.ts + W`) as an equi-join ONLY on the key, shuffling the
  * full per-key history together and filtering after the row
  * multiplication — quadratic in per-key density, a scale-killer for
  * hot keys. This operator bucketizes time by the window width: a
  * qualifying pair always lands in the left row's bucket b or b + 1
  * (integer division: floor((t + W) / W) = floor(t / W) + 1), so the
  * left side is emitted into exactly those two buckets, the right
  * side into its own bucket, and the join becomes a plain hash
  * equi-join on (key, bucket) plus a residual range filter. Each
  * qualifying pair meets in EXACTLY one bucket — no dedup pass.
  * Shuffle volume is 2|L| + |R| rows; per-task width is bounded by
  * per-(key, window) density, the natural partition grain of the
  * workload, and the window width is the skew knob.
  */
object RangeJoin {

  /** Inner range join. `left` and `right` must share the `key` column
    * name, and their remaining column names must be disjoint (alias
    * before the call); both timestamp columns are Spark timestamps.
    * Returns all left columns then all right columns.
    *
    * @param windowMicros inclusive upper bound, in microseconds
    */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
                ltsCol: String, rtsCol: String, windowMicros: Long): DataFrame = {
    require(windowMicros > 0, s"rangeJoin requires window > 0, got $windowMicros")
    require(!(left.columns ++ right.columns).contains("__b"),
      "rangeJoin reserves the column name __b; rename it")
    val lUs = unix_micros(col(ltsCol))
    val rUs = unix_micros(col(rtsCol))
    // floor-division bucket, exact in integer arithmetic: pmod gives
    // the non-negative remainder (so pre-1970 negatives floor, not
    // truncate toward zero), and dividing the exact multiple is
    // lossless for |us| < 2^53 (year ~2255)
    def bucket(us: org.apache.spark.sql.Column) =
      ((us - pmod(us, lit(windowMicros))) / windowMicros).cast("long")
    val l2 = left.withColumn("__b",
      explode(array(bucket(lUs), bucket(lUs) + 1L)))
    val r2 = right.withColumn("__b", bucket(rUs))
    l2.join(r2, Seq(key, "__b"))
      .filter(rUs >= lUs && rUs <= lUs + windowMicros)
      .drop("__b")
  }
}
