package graft.ops

import graft.ops.Checkpoints.TruncateOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal independent set by Luby's algorithm (Luby, SIAM J. Comput.
  * 1986) — the parallel symmetry-breaking primitive: a set where no
  * two members are adjacent and every non-member has a member
  * neighbor. The distributed way to pick non-conflicting
  * representatives in one sweep — canonical-doc election inside
  * near-dup clusters, conflict-free task batches over a dependency
  * graph, landmark spreading (q229's landmarks chosen by key modulus
  * could instead be an MIS so no two landmarks are adjacent).
  *
  * Luby's coin flips are replaced by the engine's deterministic hash
  * priority ([[Sampling.hashRank]]: md5-derived, DuckDB-replayable),
  * tie-broken by node id into a strict total order — same O(log n)
  * expected round count (the hash behaves as a random permutation),
  * but bit-reproducible across engines and runs: each round every
  * UNDECIDED node whose (priority, id) beats all undecided neighbors
  * joins the set, and its neighbors drop out.
  *
  * Scale shape per round: one edge⋈undecided join + a per-node
  * max(struct) aggregate (the local-max test), one neighbor-kill
  * semi/anti join — all shuffles on node keys, frontier-sized;
  * lineage truncates every round (the q225 discipline). `rounds` is
  * FIXED for the oracle-unroll contract: after R rounds the output is
  * the deterministic R-round state (nodes still undecided surface as
  * such); at R ≳ log n it is a true MIS (independence always holds;
  * maximality once no node is undecided — both spec-pinned).
  *
  * @return (node, status) for every node of the symmetrized graph,
  *         status ∈ in | out | undecided
  */
object Mis {

  def luby(edges: DataFrame, srcCol: String, dstCol: String,
           rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be at least 1, got $rounds")
    // Lazy checkpoint, not cache() (the Bfs note): the whole run is one
    // lazy plan, so a cache unpersisted before return never serves and
    // each of the 2·rounds edge joins would rebuild the symmetrization.
    val e = edges.select(col(srcCol).as("__a"), col(dstCol).as("__b"))
      .unionByName(edges.select(col(dstCol).as("__a"), col(srcCol).as("__b")))
      .truncated
    val nodes = e.select(col("__a").as("node")).distinct()
      .truncated
    var u = nodes.withColumn("pr", Sampling.hashRank(col("node")))
    var ins = nodes.limit(0).select(col("node"))
    for (_ <- 1 to rounds) {
      // strongest undecided neighbor, per undecided node — decided
      // neighbors don't compete (they are gone from u)
      // field names matter: struct comparison needs identical types on
      // both sides, so both tuples are built as (p, n)
      val nbrMax = e
        .join(u.select(col("node").as("__b"), col("pr").as("__npr")), Seq("__b"))
        .groupBy(col("__a").as("node"))
        .agg(max(struct(col("__npr").as("p"), col("__b").as("n"))).as("__mx"))
      val c = u.join(nbrMax, Seq("node"), "left")
        .filter(col("__mx").isNull ||
          struct(col("pr").as("p"), col("node").as("n")) > col("__mx"))
        .select("node")
        .truncated
      // neighbors of the winners drop out. Adjacent winners are
      // impossible under a strict total order, so anti-joining the RAW
      // neighbor set (no c-exclusion, no u-restriction — an anti join
      // against a superset removes the same rows) is both correct and
      // the cheapest form. `ins` needs no per-round checkpoint (it is
      // a union of already-checkpointed winner frames), and `outs` is
      // derived once at the end as nodes − ins − undecided — the first
      // cut maintained both incrementally and paid ~4 checkpointed
      // frames per round for it (8.8 s → the current shape at sf0.1).
      val kill = e.join(c.select(col("node").as("__a")), Seq("__a"))
        .select(col("__b").as("node")).distinct()
      ins = ins.unionByName(c)
      u = u.join(c, Seq("node"), "left_anti")
        .join(kill, Seq("node"), "left_anti")
        .truncated
    }
    ins.select(col("node"), lit("in").as("status"))
      .unionByName(u.select(col("node"), lit("undecided").as("status")))
      .unionByName(nodes
        .join(ins, Seq("node"), "left_anti")
        .join(u.select("node"), Seq("node"), "left_anti")
        .select(col("node"), lit("out").as("status")))
  }
}
