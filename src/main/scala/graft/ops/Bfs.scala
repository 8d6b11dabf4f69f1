package graft.ops

import graft.ops.Checkpoints.TruncateOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source breadth-first search: minimum hop count from a seed
  * set to every reachable node — the graph-proximity primitive under
  * "within k hops of a flagged account", influence-radius audits, and
  * crawl-frontier scheduling, sitting next to PageRank (global
  * importance) and personalized PageRank (weighted proximity) as the
  * UNWEIGHTED proximity measure.
  *
  * Classic synchronous frontier expansion (the Pregel formulation —
  * Malewicz et al., SIGMOD'10): round i joins only the CURRENT
  * frontier against the edge list, so work per round is proportional
  * to the frontier's out-degree sum, never to |V|·|E|. All shuffles
  * carry bare node keys (8 bytes); the visited set participates only
  * as an anti-join build side. At 100 TB the anti-join against an
  * ever-growing visited set is the cost center — swap it for a Bloom
  * filter pre-filter (false positives only SHRINK the frontier,
  * correctness unaffected since re-discovered nodes carry larger
  * hops) and keep the exact anti-join as the final arbiter.
  *
  * `maxHops` is FIXED, not a convergence loop (the q94/q203
  * discipline): an external oracle unrolls the same rounds CTE by
  * CTE and replays the result exactly. Seeds count at hop 0 whether
  * or not they touch any edge — isolated seeds surface with hops=0
  * rather than vanishing. Lineage is truncated every round (lazy
  * localCheckpoint): the visited union otherwise nests one join
  * deeper per round, and the analyzer cost grows super-linearly in
  * that depth (the KCore lesson).
  *
  * @param undirected symmetrize the edge list before expanding
  *        (a→b implies b→a); false follows edges as given
  * @return (node, hops) — minimum hop distance, hops ∈ [0, maxHops],
  *         one row per seed or reached node
  */
object Bfs {

  def hopCounts(edges: DataFrame, srcCol: String, dstCol: String,
                seeds: DataFrame, seedCol: String, maxHops: Int,
                undirected: Boolean = true): DataFrame = {
    require(maxHops >= 0, s"maxHops must be non-negative, got $maxHops")
    val fwd = edges.select(col(srcCol).as("__a"), col(dstCol).as("__b"))
    // Lazy checkpoint, not cache(): the loop is one lazy plan referencing
    // e once per round, and no action runs before return — a cache()
    // paired with a pre-return unpersist would never serve a single job
    // and every round would rebuild the edge projection. The checkpoint
    // materializes once at the caller's first action and feeds all
    // rounds; release it via GraftSession.withQueryCaches.
    val e =
      (if (undirected)
         fwd.unionByName(edges.select(col(dstCol).as("__a"), col(srcCol).as("__b")))
       else fwd).truncated
    var dist = seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("hops", lit(0))
    var frontier = dist.select("node")
    for (i <- 1 to maxHops) {
      val next = e.join(frontier, e("__a") === frontier("node"))
        .select(col("__b").as("node")).distinct()
        .join(dist, Seq("node"), "left_anti")
        .truncated
      dist = dist.unionByName(next.withColumn("hops", lit(i)))
        .truncated
      frontier = next
    }
    dist.withColumn("hops", col("hops").cast("int"))
  }
}
