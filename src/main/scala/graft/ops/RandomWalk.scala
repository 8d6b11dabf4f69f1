package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Random-walk corpus generation (the DeepWalk/node2vec precursor —
  * Perozzi et al., KDD'14): from every seed node, take `steps` uniform
  * hops over the symmetrized graph and emit the visited sequence. The
  * walk corpus IS the training data for skip-gram graph embeddings —
  * the graph-side analogue of the text pipeline's token streams — and
  * doubles as a proximity sampler for negative mining.
  *
  * "Uniform" is derandomized the engine way ([[Sampling.hashRank]]):
  * hop i of walker w at node v picks neighbor index
  * `hash(w|i|v) mod deg(v)` over the node's id-ordered adjacency — a
  * pure function of (walker, step, node), so walks are reproducible
  * across runs, partitionings, and engines (q238's oracle replays
  * every hop); including v in the key lets revisits draw fresh
  * directions instead of looping deterministically.
  *
  * Scale shape: the id-ordered, degree-annotated adjacency is built
  * ONCE (per-node window, parallel across nodes) and each hop is one
  * equi-join keyed on the 8-byte node id, walker-count rows a side —
  * never |V|·|E|; lineage truncates per hop (the q225 discipline). A
  * walker whose node has no out-neighbor simply ends (cannot happen on
  * a symmetrized graph). At 100 TB the standard trick applies
  * unchanged: run W walkers per seed by salting the walker id.
  *
  * @return (walker, step, node): the seed at step 0, then one row per
  *         completed hop, step ∈ [0, steps]
  */
object RandomWalk {

  def walks(edges: DataFrame, srcCol: String, dstCol: String,
            seeds: DataFrame, seedCol: String, steps: Int,
            undirected: Boolean = true): DataFrame = {
    require(steps >= 0, s"steps must be non-negative, got $steps")
    val fwd = edges.select(col(srcCol).as("__a"), col(dstCol).as("__b"))
    val e =
      if (undirected)
        fwd.unionByName(edges.select(col(dstCol).as("__a"), col(srcCol).as("__b")))
      else fwd
    val adj = e
      .withColumn("__idx", row_number()
        .over(Window.partitionBy("__a").orderBy(col("__b"))))
      .withColumn("__deg", count(lit(1)).over(Window.partitionBy("__a")))
      .localCheckpoint(eager = false)
    var cur = seeds.select(col(seedCol).as("walker")).distinct()
      .withColumn("node", col("walker"))
    var out = cur.withColumn("step", lit(0))
    for (i <- 1 to steps) {
      // hop target: the (hash mod degree)-th neighbor in id order —
      // hashRank yields 1 + H mod 1000003, so (hr − 1) is the raw
      // 60-bit-fold residue the oracle reproduces before its own mod
      val hr = Sampling.hashRank(
        concat_ws("|", col("walker"), lit(i), col("node")))
      cur = cur.join(adj, cur("node") === adj("__a"))
        .filter(col("__idx") === (hr - 1) % col("__deg") + 1)
        .select(col("walker"), col("__b").as("node"))
        .localCheckpoint(eager = false)
      out = out.unionByName(cur.withColumn("step", lit(i)))
    }
    out.withColumn("step", col("step").cast("int"))
  }
}
