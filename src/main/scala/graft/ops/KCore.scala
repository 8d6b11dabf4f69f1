package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by synchronous peeling (Seidman 1983; the
  * distributed formulation of Montresor et al.): repeatedly delete
  * every node whose current degree is below k, together with its
  * edges, until the survivors — the k-core — all have in-core degree
  * ≥ k. The standard graph-densification gate (spam/bot subgraph
  * mining, community seeding) next to q94 PageRank and q166 triangles.
  *
  * Each round is one degree aggregation plus two semi-joins on the
  * symmetrized edge list — all shuffles on node keys, nothing
  * quadratic, no driver-side state. Peeling removes whole frontiers
  * per round (not one node at a time), so rounds needed = the peel
  * DEPTH, typically tiny (single digits on power-law graphs; the
  * sf0.01 part graph converges in 5).
  *
  * `rounds` is FIXED, not a convergence loop, for the engine-parity
  * discipline of PageRank/Lloyd: an external oracle unrolls the same
  * R peels CTE by CTE and replays the result exactly (q203). At
  * convergence within R the output IS the k-core; before convergence
  * it is the deterministic R-peel frontier, identical in both
  * engines. At 100 TB, checkpoint the edge frame every few rounds
  * (localCheckpoint) so the iterated lineage stays shallow — the q94
  * PageRank note applies verbatim.
  *
  * @return surviving (node, deg) rows — in-core degree after `rounds`
  *         peels, filtered to deg ≥ k
  */
object KCore {

  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
            rounds: Int): DataFrame = {
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionByName(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
    var alive = sym
    for (_ <- 0 until rounds) {
      val keep = alive.groupBy("a").agg(count(lit(1)).as("__d"))
        .filter(col("__d") >= k).select("a")
      // truncate lineage EVERY round (lazy localCheckpoint, the
      // ConnectedComponents discipline): each round embeds the prior
      // plan three times (degree agg + both endpoint filters), so an
      // untruncated loop grows the logical plan 3^R-fold — R = 10
      // measurably OOMs the ANALYZER, never mind execution
      alive = alive
        .join(keep, Seq("a"), "left_semi")
        .join(keep.select(col("a").as("b")), Seq("b"), "left_semi")
        .localCheckpoint(eager = false)
    }
    alive.groupBy(col("a").as("node")).agg(count(lit(1)).cast("int").as("deg"))
      .filter(col("deg") >= k)
  }
}
