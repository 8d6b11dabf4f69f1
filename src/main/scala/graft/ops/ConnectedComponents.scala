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
    *              `dstCol`, integral ids); nodes not present in any edge
    *              are absent from the result (singletons are their own
    *              component)
    * @param driverThreshold edge count below which the components are
    *              solved with exact union-find on the driver: a dedup
    *              candidate graph is a tiny fraction of the corpus (the
    *              point of LSH), and at kilobyte scale the distributed
    *              loop pays per-round plan-compilation and shuffle
    *              overhead orders of magnitude above the actual work
    *              (measured 4× on the corpus pipeline). Above the
    *              threshold the label-join loop below runs fully
    *              distributed.
    * @return (node, component) — component = min node id reachable
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       maxIter: Int = 20,
                       driverThreshold: Long = 1000000L): DataFrame = {
    val sym = edges.select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .union(edges.select(col(dstCol).cast("long").as("a"),
        col(srcCol).cast("long").as("b")))
      .distinct()
      .cache()
    if (sym.count() <= driverThreshold) {
      val result = unionFindLocal(sym)
      sym.unpersist() // collected already; the result frame is driver-built
      return result
    }
    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("component", col("node"))
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
      var next = labels.select("node", "component").union(viaNeighbors)
        .groupBy("node").agg(min(col("component")).as("component"))
      // Periodic lazy lineage truncation (same hazard as PageRank's
      // loop: unbounded nesting makes each round's convergence action
      // pay O(depth) analysis). Lazy — the sum action below
      // materializes it; periodic — a checkpoint boundary erases size
      // stats and demotes optimizer choices, so only cut every few
      // rounds. Dedup graphs converge in 2-3 rounds and never hit it.
      if ((i + 1) % 5 == 0) next = next.localCheckpoint(false)
      val s = next.agg(sum(col("component"))).head.getLong(0)
      converged = prevSum.contains(s)
      prevSum = Some(s)
      labels = next
      i += 1
    }
    // labels stays materialized (it is the returned frame); sym's rounds
    // are done — dropping it here is what keeps k successive components()
    // calls from accumulating k edge caches in executor storage.
    sym.unpersist()
    labels
  }

  /** Exact union-find over a collected edge list (union-by-min keeps the
    * root the minimum id, path compression keeps it near-constant).
    */
  private def unionFindLocal(sym: DataFrame): DataFrame = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    sym.collect().foreach { row =>
      val (a, b) = (row.getLong(0), row.getLong(1))
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    val session = sym.sparkSession
    import session.implicits._
    parent.keys.toSeq.map(n => (n, find(n))).toDF("node", "component")
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
