package graft.ops

import graft.ops.Checkpoints.TruncateOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration weighted PageRank as join-based iteration.
  *
  * Each iteration is one hash join (transition edges x current ranks) +
  * one aggregation — the standard scale-out formulation: rank state and
  * edges both stay partitioned by node key, so a 10^9-node graph runs as
  * `iters` shuffles of the (node, rank) sliver, never materializing a
  * matrix. The edge/transition frame is checkpointed once and serves
  * every iteration; dangling nodes (no in-edges after a hop) keep the
  * teleport term via the left join.
  *
  * Determinism contract for oracle parity: ranks are rounded to 10 dp
  * each iteration, so cross-engine float-sum ordering differences
  * (~1e-15) cannot accumulate; callers round the final output coarser.
  */
object PageRank {

  /** @param edges   directed weighted edges
    * @param damping teleport-complement factor (classic 0.85)
    * @param checkpointEvery lineage-truncation cadence: every N
    *        iterations the rank state is lazily localCheckpoint-ed so
    *        the plan never nests more than N joins (unbounded nesting
    *        makes per-action analysis + plan stringification O(depth),
    *        heap-fatal past a few dozen rounds). Periodic — not
    *        per-iteration — because a checkpoint boundary also erases
    *        size stats, demoting the small rank-state join from
    *        broadcast to shuffle; inside a window the optimizer keeps
    *        full visibility. Swap in reliable `checkpoint` via
    *        `setCheckpointDir` when executor-loss recompute-from-scratch
    *        is unacceptable.
    * @return (node, rank) after `iters` synchronous updates from the
    *         uniform start 1/N
    */
  def run(edges: DataFrame, src: String, dst: String, weight: String,
          iters: Int, damping: Double = 0.85, checkpointEvery: Int = 15): DataFrame = {
    // Checkpoints, not cache()+pre-return unpersist (the Bfs note): the
    // loop is lazy, so a cache released before return would never serve
    // the caller's action and nodes/trans would rebuild once per
    // iteration. nodes materializes here via the count below; trans at
    // the caller's first action; withQueryCaches releases both.
    val nodes = edges.select(col(src).as("node"))
      .union(edges.select(col(dst).as("node"))).distinct()
      .truncated
    val n = nodes.count()
    val outW = edges.groupBy(col(src)).agg(sum(col(weight)).as("__out_w"))
    val trans = edges.join(outW, src)
      .select(col(src).as("__u"), col(dst).as("__v"),
        (col(weight) / col("__out_w")).as("__p"))
      .truncated
    val teleport = (1.0 - damping) / n
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
    for (i <- 1 to iters) {
      val contrib = trans.join(ranks, trans("__u") === ranks("node"))
        .groupBy(col("__v")).agg(sum(col("rank") * col("__p")).as("__in"))
      ranks = nodes.join(contrib, nodes("node") === contrib("__v"), "left")
        .select(col("node"),
          round(lit(teleport) + lit(damping) * coalesce(col("__in"), lit(0.0)), 10).as("rank"))
      if (i % checkpointEvery == 0 && i < iters)
        ranks = ranks.truncated
    }
    ranks
  }

  /** PERSONALIZED PageRank (Haveliwala 2002): the random surfer
    * teleports only to the `seeds` set (uniformly), so rank measures
    * proximity TO THE SEEDS through the edge structure — the
    * graph-side retrieval/rerank primitive ("entities related to this
    * query set") next to the global importance of [[run]]. Start
    * distribution = uniform over seeds; per-iteration update
    * `rank(v) = isSeed(v)·(1−d)/|S| + d·Σ_u rank(u)·p(u→v)`. Same
    * join-iteration shape, cadence, and 10-dp per-iteration rounding
    * discipline as [[run]] — an external oracle unrolls it CTE by CTE
    * (q204).
    */
  def personalized(edges: DataFrame, src: String, dst: String, weight: String,
                   seeds: DataFrame, seedCol: String, iters: Int,
                   damping: Double = 0.85, checkpointEvery: Int = 15): DataFrame = {
    val seedSet = seeds.select(col(seedCol).as("node")).distinct()
    val nodes = edges.select(col(src).as("node"))
      .union(edges.select(col(dst).as("node"))).distinct()
      .join(seedSet.withColumn("__s", lit(1)), Seq("node"), "left")
      .select(col("node"), coalesce(col("__s"), lit(0)).as("__s"))
      .truncated // materialized by the count below
    val nSeeds = nodes.filter(col("__s") === 1).count()
    require(nSeeds > 0, "personalized PageRank needs at least one seed present in the graph")
    val outW = edges.groupBy(col(src)).agg(sum(col(weight)).as("__out_w"))
    val trans = edges.join(outW, src)
      .select(col(src).as("__u"), col(dst).as("__v"),
        (col(weight) / col("__out_w")).as("__p"))
      .truncated // serves all iters at the caller's action
    val teleport = (1.0 - damping) / nSeeds
    var ranks = nodes.select(col("node"),
      (col("__s") * lit(1.0 / nSeeds)).as("rank"))
    for (i <- 1 to iters) {
      val contrib = trans.join(ranks, trans("__u") === ranks("node"))
        .groupBy(col("__v")).agg(sum(col("rank") * col("__p")).as("__in"))
      ranks = nodes.join(contrib, nodes("node") === contrib("__v"), "left")
        .select(col("node"),
          round(col("__s") * lit(teleport)
            + lit(damping) * coalesce(col("__in"), lit(0.0)), 10).as("rank"))
      if (i % checkpointEvery == 0 && i < iters)
        ranks = ranks.truncated
    }
    ranks
  }
}
