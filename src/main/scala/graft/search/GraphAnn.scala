package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-partition graph ANN (SURVEY §2 R2 option (c), the deferred
  * fourth path next to LSH / IVF / PQ): each partition builds an
  * NSW-style proximity graph over ITS vectors with mapPartitions —
  * the one operator family where per-partition imperative logic is
  * the honest design, matching how FAISS/HNSW shards compose — then
  * greedy beam search inside every partition yields candidate sets
  * that merge through an EXACT re-score into the global top-k.
  *
  * Scale shape: the graph never leaves its partition (no shuffle to
  * build), a query broadcast-fans out to all partitions, and the
  * exchange carries only O(partitions × ef) candidate rows into a
  * bounded-heap top-k. At 100 TB each partition is a segment file's
  * worth of vectors (the standard "one graph per segment, merge by
  * re-score" layout of Lucene-style vector search); recall per probe
  * cost beats list-pruning when lists are unbalanced because beam
  * search adapts to local density.
  *
  * Determinism: nodes insert in ascending-id order, neighbor lists
  * and beams break score ties by lowest id, so the same partition
  * content always yields the same graph and candidates; the FINAL
  * ranking re-scores candidates exactly, so output order is as
  * deterministic as Search.topK over the candidate union. The result
  * is NOT SQL-replayable (graph construction is iterative and
  * partition-local), so this path is spec-gated (GraphAnnSpec pins
  * recall floors vs exact), ✗-marked in SURVEY like S7/M9.
  *
  * Not the reference's HNSW (hnswlib via FAISS,
  * `src/pipeline/pipeline_mode.py:217-223`) — a single-layer NSW per
  * partition with beam search, which preserves the navigable-graph
  * recall behavior the reference tunes with efSearch while staying
  * dependency-free and deterministic.
  */
object GraphAnn {

  /** One partition's navigable graph: adjacency lists over local row
    * indices, built by INCREMENTAL insertion — each new node beam-
    * searches the graph-so-far for its m nearest reachable neighbors
    * and links bidirectionally (neighbor lists trimmed back to m by
    * score). Insertion order is ascending id, entry point is the
    * first row. */
  private[graft] type Adjacency = Array[scala.collection.mutable.ArrayBuffer[Int]]

  private[graft] def buildGraph(vecs: Array[Array[Double]],
                                 m: Int, efC: Int): Adjacency = {
    val n = vecs.length
    val nbrs: Adjacency = Array.fill(n)(scala.collection.mutable.ArrayBuffer.empty[Int])
    def link(a: Int, b: Int): Unit = {
      val buf = nbrs(a)
      if (!buf.contains(b)) {
        buf += b
        if (buf.length > m) {
          // keep the m closest by dot (ties: lowest index)
          val worst = buf.minBy(j => (dot(vecs(a), vecs(j)), -j))
          buf -= worst
        }
      }
    }
    var i = 1
    while (i < n) {
      val found = searchGraph(vecs, nbrs, vecs(i), efC, i)
      found.take(m).foreach { case (j, _) => link(i, j); link(j, i) }
      i += 1
    }
    nbrs
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Greedy best-first beam search from node 0 over the first `limit`
    * nodes: expand the best unexpanded candidate, keep a beam of the
    * ef best seen, stop when the beam's worst beats every frontier
    * node. Returns (index, score) sorted by (score desc, index asc). */
  private[graft] def searchGraph(vecs: Array[Array[Double]],
                                  nbrs: Adjacency,
                                  q: Array[Double], ef: Int,
                                  limit: Int): Array[(Int, Double)] = {
    if (limit <= 0) return Array.empty
    val visited = new java.util.BitSet(limit)
    // frontier: max-heap by score (ties: lowest index first)
    val ord = Ordering.by[(Int, Double), (Double, Int)] { case (i, s) => (s, -i) }
    val frontier = scala.collection.mutable.PriorityQueue.empty[(Int, Double)](ord)
    val beam = scala.collection.mutable.PriorityQueue.empty[(Int, Double)](ord.reverse)
    def consider(i: Int): Unit = if (!visited.get(i)) {
      visited.set(i)
      val s = dot(vecs(i), q)
      frontier.enqueue((i, s))
      beam.enqueue((i, s))
      if (beam.size > ef) beam.dequeue()
    }
    consider(0)
    var continue = true
    while (continue && frontier.nonEmpty) {
      val (best, bestScore) = frontier.dequeue()
      if (beam.size >= ef && bestScore < beam.head._2) continue = false
      else {
        nbrs(best).foreach(j => if (j < limit) consider(j))
        // implicit CHAIN BACKBONE: every node also reaches its id
        // neighbors i±1. Proximity links alone can disconnect — a
        // clique of exact-duplicate vectors fills each member's
        // trimmed neighbor list with fellow copies and strands the
        // entry component (surfaced by the 10× ScaleProbe corpus,
        // whose id-shifted embedding copies are exact duplicates);
        // the chain keeps the graph navigable from any entry point
        // with zero storage and no effect on the trim heuristic.
        if (best + 1 < limit) consider(best + 1)
        if (best - 1 >= 0) consider(best - 1)
      }
    }
    beam.dequeueAll.toArray.sortBy { case (i, s) => (-s, i) }
  }

  /** Graph-ANN top-k: build/search one NSW graph per partition,
    * exact-re-score the per-partition beams, global bounded top-k.
    * `query` must be a ONE-ROW frame (Search.topK contract). Knobs:
    * `m` = max neighbors per node (graph degree), `ef` = search beam
    * width — the efSearch dial of the reference's HNSW config. */
  def graphTopK(docs: DataFrame, idCol: String, vecCol: String,
                query: DataFrame, queryVecCol: String,
                k: Int, m: Int = 8, ef: Int = 48): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(m >= 1 && ef >= k,
      s"need m >= 1 and ef >= k, got m=$m ef=$ef k=$k")
    Search.requireIntegralId(docs, idCol, "graphTopK")
    val spark = docs.sparkSession
    import spark.implicits._
    // one query row, bounded driver materialization (same contract as
    // every single-query entry point)
    val qv = query.select(col(queryVecCol).cast("array<double>"))
      .as[Seq[Double]].head().toArray
    val bq = spark.sparkContext.broadcast(qv)
    val src = docs.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
    // graph build cost is superlinear in rows-per-partition (each
    // insertion beam-searches the partition's graph-so-far), so an
    // under-parallel scan — a small local file arriving as ONE split —
    // must be spread before building; the id-hash repartition keeps
    // each graph a deterministic function of corpus content. No-op at
    // real scale, where maxPartitionBytes bounds rows per partition.
    val par = spark.sparkContext.defaultParallelism
    val spread = if (src.rdd.getNumPartitions < par)
      src.repartition(par, col(idCol)) else src
    val cands = spread
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        // ascending-id order makes the graph a pure function of the
        // partition's CONTENT, independent of scan row order
        val rows = it.map { case (id, v) => (id, v.toArray) }.toArray.sortBy(_._1)
        if (rows.isEmpty) Iterator.empty
        else {
          val vecs = rows.map(_._2)
          val graph = buildGraph(vecs, m, efC = ef)
          searchGraph(vecs, graph, bq.value, ef, vecs.length)
            .iterator.map { case (i, s) => (rows(i)._1, s) }
        }
      }
      .toDF(idCol, "score")
    cands
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .withColumn("rank", row_number().over(
        Search.wAll.orderBy(col("score").desc, col(idCol).asc)).cast("long"))
      .select(col(idCol), col("rank"), round(col("score"), 6).as("score"))
  }
}
