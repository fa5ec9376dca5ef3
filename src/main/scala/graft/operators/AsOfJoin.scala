package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join: for each left row, attach the latest
  * right row whose timestamp is at-or-before the left row's, within
  * the same key group — the standard enrichment join of event
  * pipelines (each event sees the most recent prior state).
  *
  * Spark has no native as-of join, and the naive formulations are
  * scale-killers: a theta-join (`l.key = r.key AND l.ts >= r.ts` +
  * argmax) row-multiplies by the full right history per key, and a
  * per-row probe collects to the driver. This operator instead uses
  * the union + running-last-value plan: tag both sides, union them,
  * and take `last(right_row, ignoreNulls)` over a window partitioned
  * by key and ordered by (ts, side). Cost is ONE hash shuffle on the
  * key plus one sort within each partition — linear in |L| + |R|,
  * independent of match fan-out, the shape kdb/Flink temporal joins
  * compile to.
  *
  * Determinism: at equal timestamps the right row sorts before the
  * left row (at-or-before semantics include it), and right rows that
  * also tie on timestamp are ordered by `rightTieBreak` ascending so
  * the greatest tiebreak wins. Both rules are total, so the result is
  * bit-stable and SQL-replayable.
  */
object AsOfJoin {

  /** Left as-of join. Returns every left column (top level) plus one
    * struct column `asof` holding the matched right row, null when no
    * right row precedes the left row.
    *
    * @param key          equality key column name (present both sides)
    * @param tsCol        orderable timestamp column name (present both sides)
    * @param rightTieBreak right-side column breaking (key, ts) ties;
    *                      the greatest value wins
    */
  /** Internal column names; caller frames must not use them (or the
    * output name `asof`) — guarded, not silently clobbered. */
  private val reserved = Set("__k", "__t", "__side", "__tb", "__lv", "__rv", "__m")

  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               tsCol: String, rightTieBreak: String): DataFrame = {
    val clash = (left.columns ++ right.columns).filter(reserved)
    require(clash.isEmpty,
      s"asofJoin reserves column names ${reserved.mkString(", ")}; " +
        s"rename: ${clash.mkString(", ")}")
    require(!left.columns.contains("asof"),
      "asofJoin emits the matched right row as `asof`; rename the left column")
    val lSchema = StructType(left.schema.fields)
    val rSchema = StructType(right.schema.fields)
    val lPrep = left.select(
      col(key).as("__k"), col(tsCol).as("__t"), lit(1).as("__side"),
      lit(null).cast(right.schema(rightTieBreak).dataType).as("__tb"),
      struct(left.columns.map(col): _*).as("__lv"),
      lit(null).cast(rSchema).as("__rv"))
    val rPrep = right.select(
      col(key).as("__k"), col(tsCol).as("__t"), lit(0).as("__side"),
      col(rightTieBreak).as("__tb"),
      lit(null).cast(lSchema).as("__lv"),
      struct(right.columns.map(col): _*).as("__rv"))
    // side 0 (right) sorts before side 1 (left) at equal ts, so an
    // exactly-simultaneous right row is visible to the left row
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lPrep.unionByName(rPrep)
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(c => col("__lv").getField(c).as(c)) :+
        col("__m").as("asof"): _*)
  }
}
