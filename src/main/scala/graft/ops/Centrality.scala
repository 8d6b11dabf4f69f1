package graft.ops

import graft.ops.Checkpoints.TruncateOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distance-based centralities from a sampled source set, bounded at a
  * hop horizon — the proximity face of the centrality family next to
  * [[Betweenness]] (brokerage) and PageRank/HITS (flow): HOW CLOSE a
  * node sits to the rest of the graph.
  *
  * Harmonic centrality (Marchiori & Latora 2000; the closeness variant
  * Boldi & Vigna recommend because it is well-defined on disconnected
  * graphs): H(v) = Σ_s 1/dist(s, v), summed over the sampled sources
  * that reach v within `maxDepth` — unreached pairs contribute 0
  * instead of poisoning an average with infinities.
  *
  * Determinism discipline: 1/d is NOT dyadic for d = 3, 5, 6, …, so a
  * float sum over sources would be engine-order-dependent. Instead
  * each distance contributes the FIXED-POINT long round(1e6/d) — the
  * q247 quantization trick — so the per-node reduction is an exact
  * integer sum in any order and the single final division is rounded
  * once at 6.
  *
  * Scale shape: the [[Betweenness.perSourceBfs]] forward sweep only —
  * `maxDepth` frontier joins over (source, node) slivers, one
  * node-keyed integer aggregation, one lazy edge checkpoint.
  *
  * @return (node, n_reach, harmonic) for nodes reached at depth ≥ 1 by
  *         at least one source; n_reach counts the reaching sources
  */
object Centrality {

  def harmonicFromSources(edges: DataFrame, srcCol: String, dstCol: String,
                          sources: DataFrame, sourceCol: String,
                          maxDepth: Int): DataFrame = {
    require(maxDepth >= 1, s"maxDepth must be at least 1, got $maxDepth")
    val e = edges.select(col(srcCol).as("__a"), col(dstCol).as("__b"))
      .distinct().truncated
    Betweenness.perSourceBfs(e, sources, sourceCol, maxDepth)
      .filter(col("__d") >= 1)
      .select(col("node"),
        round(lit(1000000.0) / col("__d").cast("double"), 0)
          .cast("long").as("__w"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_reach"),
        round(sum(col("__w")).cast("double") / lit(1000000.0), 6)
          .as("harmonic"))
  }
}
