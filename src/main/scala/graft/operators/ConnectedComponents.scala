package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list —
  * the transitive-closure step that turns pairwise near-duplicate
  * MATCHES into duplicate CLUSTERS (the reference-style single-pass
  * "drop the higher id of each pair" policy under-merges chains:
  * a~b, b~c must place a, b, c in ONE cluster even when a~c was never
  * emitted as a pair).
  *
  * Algorithm: min-label propagation. Every node starts labeled with
  * its own id; each round every node takes the min of its label and
  * its neighbors' labels; at convergence the label is the component's
  * minimum node id — a deterministic, content-independent cluster id.
  * Each round is one hash join (edges × labels, keyed by node) and
  * one min-aggregate — all map-side-combinable, nothing driver-sized.
  * Round count equals the graph diameter, which for near-dup clusters
  * (short chains around a template) is small; pathological
  * long-diameter graphs would want the alternating large-star /
  * small-star variant, which halves distances per round — the loop
  * here is deliberately the simple one, with a hard iteration cap
  * that throws instead of returning an under-merged clustering.
  */
object ConnectedComponents {

  /** Component id (= min reachable node id) per node appearing in
    * `edges`. Returns (v, component). */
  def components(edges: DataFrame, aCol: String, bCol: String,
                 maxIters: Int = 30): DataFrame = {
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    // symmetric closure once, materialized: every iteration re-reads it
    val sym = edges.select(col(aCol).as("a"), col(bCol).as("b"))
      .unionByName(edges.select(col(bCol).as("a"), col(aCol).as("b")))
      .localCheckpoint()
    var labels = sym.select(col("a").as("v")).distinct()
      .withColumn("l", col("v")).localCheckpoint()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIters) {
      // neighbor labels flow along edges: for edge (a, b), a receives
      // label(b); keeping the node's own label in the union makes the
      // min monotone non-increasing (convergence is guaranteed)
      val nbr = sym.join(labels, col("b") === col("v"))
        .select(col("a").as("v"), col("l"))
      val next = labels.unionByName(nbr)
        .groupBy("v").agg(min(col("l")).as("l"))
        .localCheckpoint()
      changed = next.join(labels.withColumnRenamed("l", "prev"), "v")
        .filter(col("l") =!= col("prev")).count()
      labels = next
      it += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters iterations")
    labels.select(col("v"), col("l").as("component"))
  }
}
