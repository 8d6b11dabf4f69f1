package graft.ops

import graft.ops.Checkpoints.TruncateOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-distance betweenness centrality from a sampled source set —
  * Brandes' dependency accumulation (Brandes, J. Math. Sociology 2001)
  * truncated at `maxDepth` hops (Borgatti's bounded-distance variant),
  * the brokerage diagnostic the buyer→supplier graphs (q226 HITS /
  * q231 assortativity) lack: WHICH nodes sit on the shortest routes.
  *
  * Exact all-pairs Brandes is Θ(|V|·|E|) — unrunnable at scale and
  * pointless for a diagnostic; the standard estimator samples sources
  * (Brandes & Pich 2007) and bounds the horizon. Both knobs are the
  * caller's: `sources` rows seed the forward sweeps, `maxDepth` caps
  * them, and every (source, node) pair rides ONE frame so all sweeps
  * advance in the same fixed rounds (the Bfs/landmark discipline —
  * `maxDepth` forward + `maxDepth` backward frontier joins, shuffles
  * carrying (source, node, σ/δ) slivers, lineage truncated per round
  * by lazy localCheckpoint, released via withQueryCaches).
  *
  * Forward: σ (shortest-path counts) accumulate as EXACT integer sums
  * over predecessor frontiers. Backward, by decreasing depth d:
  *   δ(v) = Σ_{v→w, dist(w)=d+1} σ(v)/σ(w) · (1 + δ(w))
  * with δ ≡ 0 at the horizon. Pairs (s, w) beyond `maxDepth` don't
  * count — bounded-distance semantics, not an approximation of the
  * unbounded score.
  *
  * Determinism: σ is integer-exact in any aggregation order. δ is a
  * float sum; on unique-shortest-path graphs (trees, chains — the
  * oracle's planted shape) every addend is integer-valued, and on
  * σ-branching graphs the ratios are small dyadic rationals in
  * practice, so the per-group sums are exact well past 2^53; the
  * final score is rounded at 6 regardless.
  *
  * @return (node, bc) for every node reached at depth ≥ 1 from any
  *         source — bc = Σ_sources δ, rounded to 6; nodes on no
  *         shortest route report 0.0 rather than vanishing
  */
object Betweenness {

  /** Per-source truncated BFS with shortest-path counting: one frame
    * of (__src, node, __d, __sigma) rows covering every source's sweep
    * in the same `maxDepth` fixed rounds. σ sums are exact integers.
    * The edge frame must already be projected to (__a, __b) and
    * lazily checkpointed by the caller (it is reused per round —
    * and, in Brandes, by the backward sweep too).
    */
  private[ops] def perSourceBfs(e: DataFrame, sources: DataFrame,
                                sourceCol: String, maxDepth: Int): DataFrame = {
    var visited = sources.select(col(sourceCol).as("__src")).distinct()
      .select(col("__src"), col("__src").as("node"),
        lit(0).as("__d"), lit(1L).as("__sigma"))
    var frontier = visited
    for (d <- 1 to maxDepth) {
      val next = frontier.join(e, frontier("node") === e("__a"))
        .groupBy(col("__src"), col("__b").as("node"))
        .agg(sum(col("__sigma")).as("__sigma"))
        .join(visited.select("__src", "node"), Seq("__src", "node"),
          "left_anti")
        .withColumn("__d", lit(d))
        .select("__src", "node", "__d", "__sigma")
        .truncated
      visited = visited.unionByName(next).truncated
      frontier = next
    }
    visited
  }

  def truncatedBrandes(edges: DataFrame, srcCol: String, dstCol: String,
                       sources: DataFrame, sourceCol: String,
                       maxDepth: Int): DataFrame = {
    require(maxDepth >= 1, s"maxDepth must be at least 1, got $maxDepth")
    // One lazy checkpoint serves all 2·maxDepth joins (the Bfs lesson).
    val e = edges.select(col(srcCol).as("__a"), col(dstCol).as("__b"))
      .distinct().truncated
    val visited = perSourceBfs(e, sources, sourceCol, maxDepth)
    // Backward sweep: delta by decreasing depth; horizon starts at 0.
    var deltas = visited.filter(col("__d") === maxDepth)
      .select(col("__src"), col("node"), col("__sigma"),
        lit(0.0).as("__delta"))
    var acc = deltas
    for (d <- (maxDepth - 1) to 1 by -1) {
      val layer = visited.filter(col("__d") === d)
      val dref = deltas.select(col("__src").as("__dsrc"),
        col("node").as("__w"), col("__sigma").as("__sw"),
        col("__delta").as("__dw"))
      val contrib = layer.join(e, layer("node") === e("__a"))
        .join(dref,
          col("__src") === col("__dsrc") && col("__b") === col("__w"))
        .groupBy(col("__src"), col("node"))
        .agg(sum(col("__sigma").cast("double") / col("__sw").cast("double") *
          (lit(1.0) + col("__dw"))).as("__c"))
      val next = layer.join(
          contrib.select(col("__src"), col("node"), col("__c")),
          Seq("__src", "node"), "left")
        .select(col("__src"), col("node"), col("__sigma"),
          coalesce(col("__c"), lit(0.0)).as("__delta"))
        .truncated
      acc = acc.unionByName(next)
      deltas = next
    }
    acc.groupBy(col("node"))
      .agg(round(sum(col("__delta")), 6).as("bc"))
  }
}
