package graft.ops

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
  * cached once. Normalization is 1-norm (scores sum to 1 per side):
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

  def bipartite(edges: DataFrame, hubCol: String, authCol: String,
                weightCol: String, iters: Int,
                checkpointEvery: Int = 1): DataFrame = {
    require(iters >= 1, s"iters must be at least 1, got $iters")
    val e = edges.select(col(hubCol).as("__c"), col(authCol).as("__s"),
      col(weightCol).cast("double").as("__w")).cache()
    val hubs = e.select(col("__c").as("node")).distinct()
    var h = hubs.crossJoin(broadcast(hubs.agg(count(lit(1)).as("__n"))))
      .select(col("node"), (lit(1.0) / col("__n")).as("score"))
    var a: DataFrame = null
    def normalized(raw: DataFrame): DataFrame =
      raw.crossJoin(broadcast(raw.agg(sum(col("__raw")).as("__tot"))))
        .select(col("node"), round(col("__raw") / col("__tot"), 10).as("score"))
    for (i <- 1 to iters) {
      a = normalized(
        e.join(h, e("__c") === h("node"))
          .groupBy(col("__s").as("node")).agg(sum(col("score") * col("__w")).as("__raw")))
      h = normalized(
        e.join(a.select(col("node").as("__an"), col("score").as("__as")),
            e("__s") === col("__an"))
          .groupBy(col("__c").as("node")).agg(sum(col("__as") * col("__w")).as("__raw")))
      // truncate lineage EVERY iteration by default, not the PageRank
      // cadence: `normalized` embeds its input plan twice (the agg and
      // the scored rows), so an untruncated loop grows the logical
      // plan 4^i-fold — analysis alone stalls past ~4 iterations
      if (i % checkpointEvery == 0 && i < iters) {
        a = a.localCheckpoint(eager = false)
        h = h.localCheckpoint(eager = false)
      }
    }
    e.unpersist(blocking = false)
    h.select(lit("hub").as("kind"), col("node"), col("score"))
      .unionByName(a.select(lit("auth").as("kind"), col("node"), col("score")))
  }
}
