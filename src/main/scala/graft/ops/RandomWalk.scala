package graft.ops

import graft.ops.Checkpoints.TruncateOps
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
      .truncated
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
        .truncated
      out = out.unionByName(cur.withColumn("step", lit(i)))
    }
    out.withColumn("step", col("step").cast("int"))
  }

  /** node2vec-biased second-order walks (Grover & Leskovec, KDD'16
    * §3.2): hop weights depend on the PREVIOUS node t — a candidate x
    * from current node v weighs 1/p if x = t (return), 1 if x is also
    * a neighbor of t (stay in the triangle), 1/q otherwise (venture a
    * second hop out). p > 1, q < 1 biases walks outward (DFS-like,
    * community structure); p < 1, q > 1 keeps them local (BFS-like,
    * structural roles). Step 1 has no predecessor and hops uniformly
    * ([[walks]] semantics).
    *
    * Derandomized weighted sampling: candidates order by neighbor id;
    * the pick is the first whose RUNNING weight sum crosses
    * u·total, with u = [[Sampling.hashUniform]](w|i|v|t) — a pure
    * function of (walker, step, node, prev), so the walk replays
    * across runs, partitionings and engines. Float discipline: the
    * running sum is an ordered window fold and `total` is taken as
    * max(running) — never an unordered partition sum, whose
    * engine-dependent addend order could flip a boundary pick; with
    * the default binary-exact weights the running sums are EXACT
    * doubles. `returnP`/`inoutQ` should be powers of two for that
    * exactness (require-d), which loses no modeling power (the
    * node2vec grid search is typically over {0.25, 0.5, 1, 2, 4}).
    *
    * Scale shape per hop: one adjacency join (node-keyed), one
    * neighbor-of-prev flag join ((prev, x)-keyed against the distinct
    * edge set), one per-walker window over candidate rows (walker-
    * keyed, degree-bounded partitions) — all 8-byte-ish keys, walker-
    * count rows; lineage truncates per hop. The second-order state is
    * one extra column (prev), not a materialized |V|² transition
    * matrix — the standard scale answer to node2vec's preprocessing
    * blow-up.
    *
    * @return (walker, step, node): seed at step 0, then one row per
    *         completed hop
    */
  def biasedWalks(edges: DataFrame, srcCol: String, dstCol: String,
                  seeds: DataFrame, seedCol: String, steps: Int,
                  returnP: Double, inoutQ: Double,
                  undirected: Boolean = true): DataFrame = {
    require(steps >= 0, s"steps must be non-negative, got $steps")
    def isPow2(x: Double): Boolean = {
      val l = math.log(x) / math.log(2.0)
      x > 0 && math.abs(l - math.rint(l)) < 1e-12
    }
    require(isPow2(returnP) && isPow2(inoutQ),
      s"returnP/inoutQ must be powers of two for exact running sums, " +
        s"got ($returnP, $inoutQ)")
    val fwd = edges.select(col(srcCol).as("__a"), col(dstCol).as("__b"))
    val e =
      (if (undirected)
         fwd.unionByName(edges.select(col(dstCol).as("__a"), col(srcCol).as("__b")))
       else fwd).distinct().truncated
    val adj = e
      .withColumn("__idx", row_number()
        .over(Window.partitionBy("__a").orderBy(col("__b"))))
      .withColumn("__deg", count(lit(1)).over(Window.partitionBy("__a")))
      .truncated
    var cur = seeds.select(col(seedCol).as("walker")).distinct()
      .withColumn("node", col("walker"))
      .withColumn("prev", col("walker")) // placeholder until the first hop
    var out = cur.select(col("walker"), col("node")).withColumn("step", lit(0))
    for (i <- 1 to steps) {
      cur =
        if (i == 1) {
          // no predecessor yet: uniform hop, the walks() formula
          val hr = Sampling.hashRank(
            concat_ws("|", col("walker"), lit(i), col("node")))
          cur.join(adj, cur("node") === adj("__a"))
            .filter(col("__idx") === (hr - 1) % col("__deg") + 1)
            .select(col("walker"), col("__b").as("node"),
              col("node").as("prev"))
            .truncated
        } else {
          val nearEdges = e.select(col("__a").as("__pa"),
            col("__b").as("__xb"), lit(true).as("__near"))
          val cand = cur.join(adj, cur("node") === adj("__a"))
            .join(nearEdges,
              col("prev") === col("__pa") && col("__b") === col("__xb"),
              "left_outer")
          val wt = when(col("__b") === col("prev"), lit(1.0 / returnP))
            .otherwise(when(col("__near"), lit(1.0))
              .otherwise(lit(1.0 / inoutQ)))
          val byId = Window.partitionBy("walker").orderBy(col("__b"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          val all = Window.partitionBy("walker")
          val u = Sampling.hashUniform(concat_ws("|",
            col("walker"), lit(i), col("node"), col("prev")))
          cand.withColumn("__wt", wt)
            .withColumn("__cum", sum(col("__wt")).over(byId))
            .withColumn("__tot", max(col("__cum")).over(all))
            .filter(col("__cum") - col("__wt") < u * col("__tot") &&
              u * col("__tot") <= col("__cum"))
            .select(col("walker"), col("__b").as("node"),
              col("node").as("prev"))
            .truncated
        }
      out = out.unionByName(
        cur.select(col("walker"), col("node")).withColumn("step", lit(i)))
    }
    out.withColumn("step", col("step").cast("int"))
  }
}
