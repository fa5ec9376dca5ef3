package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ingest / row-level operators (SURVEY §2.2, P1–P10).
  *
  * The reference's ingest is a pandas pipeline executed on the driver
  * (`src/pipeline/pipeline.py:26-73`); here every step is a Catalyst
  * expression or window, so the same pipeline runs partitioned on the
  * full corpus with filters and projections pushed into the scan.
  */
object Ingest {

  /** P1: case-insensitive select + rename. Resolves each canonical
    * name against the actual header ignoring case (reference
    * `src/pipeline/pipeline.py:33-46`); missing required columns
    * raise, like the reference's ValueError. */
  def resolveColumns(df: DataFrame, canonical: Seq[String]): DataFrame = {
    val byLower = df.columns.groupBy(_.toLowerCase).map { case (k, v) => (k, v.head) }
    val cols = canonical.map { c =>
      byLower.get(c.toLowerCase) match {
        case Some(orig) => col(orig).as(c)
        case None => throw new IllegalArgumentException(s"required column not found: $c")
      }
    }
    df.select(cols: _*)
  }

  /** P3: clean_text — strip CR/LF, collapse whitespace runs, trim.
    * The reference does this in a Python UDF
    * (`src/pipeline/utils.py:43-48`); natively it is two codegen'd
    * string expressions — no UDF, no serialization boundary. */
  def cleanText(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, "[\\r\\n]+", " "), "\\s+", " "))

  /** P5: conditional specialty prefix — `text = specialty + ", " + text`
    * only when specialty is non-null (reference
    * `src/pipeline/pipeline.py:59-64`). NOT concat_ws: the separator
    * must disappear with the null field. */
  def prefixWhenPresent(prefix: Column, text: Column): Column =
    when(prefix.isNotNull && length(trim(prefix)) > 0,
      concat(trim(prefix), lit(", "), text)).otherwise(text)

  /** P6: deterministic dedup keeping the FIRST occurrence by `ord`
    * (the reference's pandas `drop_duplicates` keeps first,
    * `src/pipeline/pipeline.py:67`; Spark's `dropDuplicates` keeps an
    * arbitrary row, so we pin it with a window). One shuffle on the
    * dedup key; at scale this is a hash-partitioned exchange that AQE
    * sizes automatically. */
  def dedupFirst(df: DataFrame, key: Column, ord: Column): DataFrame =
    df.withColumn("__rn", row_number().over(Window.partitionBy(key).orderBy(ord.asc)))
      .filter(col("__rn") === 1)
      .drop("__rn")

  /** P8: fixed-size deterministic sample — an LCG keyed on `id`
    * replaces the reference's `pdf.sample(n, random_state=42)`
    * (`src/pipeline/pipeline_mode.py:129-130`). Pure int64 arithmetic
    * so the oracle replays it exactly; `TakeOrderedAndProject` keeps
    * it a single pass at scale.
    *
    * The id is reduced mod 2^31 BEFORE the multiply: Spark wraps
    * Long overflow silently while DuckDB BIGINT arithmetic raises, so
    * without the reduction the engine and its oracle replay diverge
    * once ids approach ~8.4e9. (2^31−1) · 1103515245 < 2^62 — no
    * overflow in either engine at any id. Unchanged for ids < 2^31. */
  def pseudoShuffleKey(id: Column): Column =
    ((id % lit(2147483648L)) * lit(1103515245L) + lit(12345L)) % lit(2147483648L)

  def sampleN(df: DataFrame, id: Column, n: Int): DataFrame =
    df.orderBy(pseudoShuffleKey(id).asc, id.asc).limit(n)

  /** P9: display snippet — first `n` chars, newlines flattened
    * (reference `src/pipeline/pipeline_mode.py:48`). */
  def snippet(c: Column, n: Int): Column =
    regexp_replace(substring(c, 1, n), "[\\r\\n]", " ")
}
