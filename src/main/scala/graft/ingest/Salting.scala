package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew salting for joins whose key distribution is heavy-tailed.
  *
  * AQE's skew-join split handles most cases at runtime; explicit
  * salting is the static fallback when one key dominates so hard that
  * even split partitions overwhelm a task (the classic null-key /
  * celebrity-key problem at 100 TB). The fact side gets a
  * deterministic salt in [0, nSalts); the dimension side is exploded
  * nSalts ways; the join key becomes (key, salt), so the hot key's
  * rows spread over nSalts tasks. Row multiplication is confined to
  * the SMALL side — the fact table is never duplicated.
  */
object Salting {

  /** Deterministic per-row salt — hash of the row's id, not rand(),
    * so replays and retries are stable. */
  def salt(id: Column, nSalts: Int): Column = pmod(xxhash64(id), lit(nSalts))

  /** Salted equi-join of a skewed fact table against a small
    * dimension: semantically identical to
    * `fact.join(dim, fact(key) === dim(key), "inner")`. */
  def saltedJoin(fact: DataFrame, factId: Column, dim: DataFrame,
                 key: String, nSalts: Int): DataFrame = {
    val salted = fact.withColumn("__salt", salt(factId, nSalts))
    val exploded = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(nSalts - 1L))))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }
}
