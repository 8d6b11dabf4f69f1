package graft.ops

import graft.ops.Checkpoints.TruncateOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source weighted shortest paths by synchronous Bellman–Ford
  * relaxation: minimum path COST from a seed set under nonnegative
  * integer edge weights — the weighted companion to [[Bfs]] (hop
  * counts) and the exact counterpart of q204's personalized-PageRank
  * proximity, powering "cheapest route to a trusted node" trust
  * propagation and weighted-radius audits.
  *
  * Each round is one relaxation: current distances join the edge list
  * (dist + w candidates for every out-edge), union the standing
  * distances, and a min-aggregate keyed on the 8-byte node id keeps
  * the best label per node — the Pregel SSSP formulation (Malewicz et
  * al., SIGMOD'10) with the frontier kept implicit. Unlike [[Bfs]] a
  * node can IMPROVE after first discovery (a longer-hop cheaper path),
  * so rows re-enter the aggregate instead of being anti-joined away;
  * shuffle volume per round is bounded by |E| candidate slivers of
  * (node, dist). At 100 TB, restrict the join to the rows whose
  * distance changed last round (delta-relaxation) — the min-aggregate
  * semantics are unchanged since unchanged rows re-derive the same
  * candidates — and keep weights integral so no float discipline ever
  * enters the labels.
  *
  * `rounds` is FIXED (the q94/q203/q225 engine-parity discipline): an
  * external oracle unrolls the identical relaxations CTE by CTE. After
  * R rounds labels equal the cheapest cost over paths of ≤ R edges —
  * at R ≥ graph diameter that IS the shortest-path distance, before it
  * it is the deterministic R-bounded relaxation both engines replay.
  * Costs stay in long arithmetic end to end; seeds label 0 whether or
  * not they touch an edge.
  *
  * @param undirected symmetrize the edge list (a→b implies b→a at the
  *        same weight); false relaxes along edge direction only
  * @return (node, dist) — minimum path cost over ≤ `rounds` edges,
  *         one row per seed or node reached within `rounds`
  */
object ShortestPaths {

  def bellmanFord(edges: DataFrame, srcCol: String, dstCol: String,
                  weightCol: String, seeds: DataFrame, seedCol: String,
                  rounds: Int, undirected: Boolean = true): DataFrame = {
    require(rounds >= 0, s"rounds must be non-negative, got $rounds")
    val fwd = edges.select(col(srcCol).as("__a"), col(dstCol).as("__b"),
      col(weightCol).cast("long").as("__w"))
    val e =
      (if (undirected)
         fwd.unionByName(edges.select(col(dstCol).as("__a"),
           col(srcCol).as("__b"), col(weightCol).cast("long").as("__w")))
       else fwd).truncated // serves every round's
    // relax join at the caller's first action (the Bfs note: a cache
    // unpersisted before return never serves); withQueryCaches releases
    var dist = seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("dist", lit(0L))
    for (_ <- 1 to rounds) {
      val relaxed = e.join(dist, e("__a") === dist("node"))
        .select(col("__b").as("node"), (col("dist") + col("__w")).as("dist"))
      // lineage truncates every round (the KCore lesson): dist feeds
      // both the relax join and the union, so an untruncated loop
      // doubles the logical plan per round
      dist = dist.unionByName(relaxed)
        .groupBy("node").agg(min(col("dist")).as("dist"))
        .truncated
    }
    dist
  }
}
