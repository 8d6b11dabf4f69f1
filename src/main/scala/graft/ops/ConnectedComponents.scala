package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering
  * step of a dedup pipeline: near-dup PAIRS (MinHash/SimHash/cosine
  * candidates) become duplicate GROUPS, from which one representative
  * per group survives.
  *
  * Algorithm: iterative min-label propagation. Every node starts as its
  * own label; each round joins labels across edges and keeps the
  * per-node minimum; convergence when a round changes nothing. Rounds
  * are whole shuffles (label-hash joins) — O(diameter) rounds, each
  * linear in |E| — the standard Spark formulation when diameters are
  * small (dedup clusters are near-cliques, so 2-3 rounds). The
  * alternating large-star/small-star optimization (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond") drops in here if
  * adversarial long-chain graphs appear.
  *
  * Deterministic: labels are min node ids — no RNG, no tie ambiguity.
  */
object ConnectedComponents {

  /** @param edges two-column frame of undirected edges (columns `srcCol`,
    *              `dstCol`); nodes not present in any edge are absent
    *              from the result (singletons are their own component)
    * @return (node, component) — component = min node id reachable
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .distinct()
      .cache()
    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("component", col("node"))
      .cache()
    // labels only ever decrease (min), so the label SUM is a monotone
    // convergence witness: equal sums between rounds ⟺ nothing changed.
    // One action per round instead of a materialize + a change-count job.
    var prevSum = Option.empty[Long]
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // neighbor labels: for node a, the labels of all b adjacent to a
      val viaNeighbors = sym
        .join(labels.withColumnRenamed("node", "b"), "b")
        .select(col("a").as("node"), col("component"))
      val next = labels.select("node", "component").union(viaNeighbors)
        .groupBy("node").agg(min(col("component")).as("component"))
        .cache()
      val s = next.agg(sum(col("component"))).head.getLong(0)
      converged = prevSum.contains(s)
      prevSum = Some(s)
      labels.unpersist()
      labels = next
      i += 1
    }
    labels
  }

  /** Dedup selection: from near-dup `edges` over `df`'s `idCol`, keep one
    * representative per component (the min id) plus every untouched row.
    */
  def dedupByComponents(df: DataFrame, idCol: String, edges: DataFrame,
                        srcCol: String, dstCol: String): DataFrame = {
    val comps = labelPropagation(edges, srcCol, dstCol)
    val losers = comps.filter(col("node") =!= col("component"))
      .select(col("node").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }
}
