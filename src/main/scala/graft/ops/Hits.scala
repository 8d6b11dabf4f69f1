package graft.ops

import graft.ops.Checkpoints.TruncateOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs-and-authorities (Kleinberg, JACM'99) over a weighted
  * bipartite edge list: authority(s) accumulates the hub mass of
  * everyone pointing at s, hub(c) accumulates the authority mass of
  * everything c points at — mutual reinforcement that separates
  * "big because well-connected to the important" from raw degree.
  * On a buyer→supplier graph the hub side scores broad, well-aimed
  * buyers and the authority side scores suppliers favored by those
  * buyers — the companion diagnostic to q94's PageRank (which needs
  * a homogeneous node space; HITS is native to bipartite).
  *
  * Each half-iteration is one hash join (edges × current scores) +
  * one aggregation, both shuffling only (node, score) slivers keyed
  * by node — the PageRank scale shape verbatim; the edge frame is
  * checkpointed once and serves every half-step. Normalization is 1-norm (scores sum to 1 per side):
  * unlike the classic 2-norm it needs no sqrt and keeps the oracle
  * arithmetic plain SQL, and since normalization is only a shared
  * scale factor the RANKING is identical. The per-side total lands
  * via a one-row broadcast cross join — no driver-side action inside
  * the loop, the whole run stays one lazy plan.
  *
  * Determinism contract for oracle parity (the PageRank discipline):
  * scores round to 10 dp after each normalization, so cross-engine
  * float-sum ordering differences cannot accumulate; callers round
  * the final output coarser. `iters` is fixed — an external oracle
  * unrolls the same updates CTE by CTE (q226).
  *
  * @param edges weighted bipartite edges, hub side → authority side;
  *        hub and authority key spaces are treated as disjoint
  * @return ("hub"|"auth", node, score) after `iters` rounds from the
  *         uniform hub start 1/|H|
  */
object Hits {

  /** @param exactRounding true (the oracle-parity contract above):
    *        normalize + round(10) after EVERY half-update — each
    *        normalization is a global reduction, so the run pays
    *        2·iters sequential barrier jobs. false (production): HITS
    *        is scale-invariant, so run the raw join+agg chain as ONE
    *        lazy plan and normalize each side once at the end — same
    *        ranking, floats differ below the rounding grid (the q120
    *        fold-vs-plain-sum pattern; spec-pinned agreement). Raw
    *        magnitudes drift by ~(mean weighted degree)^iters between
    *        the end-point normalizations — far inside double range for
    *        real graphs, but don't feed 1e30-scale weights at high
    *        iters without normalizing.
    */
  def bipartite(edges: DataFrame, hubCol: String, authCol: String,
                weightCol: String, iters: Int,
                exactRounding: Boolean = true): DataFrame = {
    require(iters >= 1, s"iters must be at least 1, got $iters")
    // Lazy checkpoint, not cache(): the whole run is one lazy plan with
    // no action before return, so a cache unpersisted before return
    // would never serve a job and all 2·iters half-step joins would
    // rebuild the edge projection. The checkpoint materializes once at
    // the caller's first action; withQueryCaches releases it.
    val e = edges.select(col(hubCol).as("__c"), col(authCol).as("__s"),
      col(weightCol).cast("double").as("__w")).truncated
    val hubs = e.select(col("__c").as("node")).distinct()
    var h = hubs.crossJoin(broadcast(hubs.agg(count(lit(1)).as("__n"))))
      .select(col("node"), (lit(1.0) / col("__n")).as("score"))
    var a: DataFrame = null
    // The raw scores feed BOTH the normalization total and the scored
    // rows. Checkpointing raw (lazily) BEFORE fanning out makes the two
    // references share one materialized copy — without it each
    // half-step runs its edge join twice (once under the broadcast
    // total, once under the scores) and the doubled plans nest, so an
    // untruncated loop costs 4^i re-evaluations of the first join
    // (measured 22 s vs 3 s at sf0.1, iters = 5). Truncation every
    // half-step also keeps the analyzer's plan depth constant.
    def normalized(rawIn: DataFrame, roundTo: Int): DataFrame = {
      val raw = rawIn.truncated
      raw.crossJoin(broadcast(raw.agg(sum(col("__raw")).as("__tot"))))
        .select(col("node"), round(col("__raw") / col("__tot"), roundTo).as("score"))
    }
    def half(scores: DataFrame, inCol: String, outCol: String): DataFrame =
      e.join(scores.select(col("node").as("__jn"), col("score")),
          e(inCol) === col("__jn"))
        .groupBy(e(outCol).as("node"))
        .agg(sum(col("score") * col("__w")).as("__raw"))
    for (_ <- 1 to iters) {
      val aRaw = half(h, "__c", "__s")
      // Production path checkpoints only the h-half: a is referenced
      // exactly once (by the next h update), so an inline a costs one
      // extra join re-evaluation ONLY for the final output's a side,
      // while halving the per-iteration (node, score) materializations
      // — at cluster scale, half the barriers. The exact path keeps
      // both (each normalization is referenced twice).
      a = if (exactRounding) normalized(aRaw, 10)
          else aRaw.select(col("node"), col("__raw").as("score"))
      val hRaw = half(a, "__s", "__c")
      h = if (exactRounding) normalized(hRaw, 10)
          else hRaw.truncated
            .select(col("node"), col("__raw").as("score"))
    }
    val (hOut, aOut) =
      if (exactRounding) (h, a)
      else (normalized(h.select(col("node"), col("score").as("__raw")), 10),
            normalized(a.select(col("node"), col("score").as("__raw")), 10))
    hOut.select(lit("hub").as("kind"), col("node"), col("score"))
      .unionByName(aOut.select(lit("auth").as("kind"), col("node"), col("score")))
  }
}
