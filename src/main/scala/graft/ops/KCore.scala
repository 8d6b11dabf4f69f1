package graft.ops

import graft.ops.Checkpoints.TruncateOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-core operators: [[kCore]] extracts the FIXED-k core subgraph by
  * synchronous peeling (Seidman 1983; the distributed formulation of
  * Montresor et al.); [[coreness]] computes EVERY node's core number
  * by the h-index fixed-point iteration (Lü, Chen, Ren, Zhang, Zhou &
  * Stanley, "The H-index of a network node and its relation to degree
  * and coreness", Nature Communications 2016). The pair covers both
  * query shapes: "give me the dense k-core" (gate) and "rank nodes by
  * structural depth" (full decomposition).
  */
object KCore {

  /** k-core subgraph by synchronous peeling: repeatedly delete every
    * node whose current degree is below k, together with its edges,
    * until the survivors — the k-core — all have in-core degree ≥ k.
    * The standard graph-densification gate (spam/bot subgraph mining,
    * community seeding) next to q94 PageRank and q166 triangles.
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
        .truncated
    }
    alive.groupBy(col("a").as("node")).agg(count(lit(1)).cast("int").as("deg"))
      .filter(col("deg") >= k)
  }

  /** Coreness of EVERY node via h-index iteration: start each node at
    * its degree and repeatedly replace the value with the h-index of
    * its neighbors' values (the largest h such that ≥ h neighbors hold
    * ≥ h); the fixed point IS the coreness (Lü et al. 2016). The
    * classical Batagelj–Zaversnik peel removes the global minimum
    * sequentially; the h-operator is a per-node function of the 1-hop
    * neighborhood, so every round is one join + one per-node fold —
    * the natural distributed form (and, unlike [[kCore]] run per k, a
    * single sweep yields the whole decomposition).
    *
    * Per round: neighbors' values arrive by one hash join on the edge
    * list; the h-index folds in the COUNT-THRESHOLD form. With S(v) =
    * #neighbors holding value ≥ v, h = max over distinct values v of
    * min(v, S(v)): every v ≤ h gives min ≤ v ≤ h; every v > h has
    * S(v) ≤ S(h+1) < h+1 so min ≤ h; and the smallest distinct value
    * v̂ ≥ h (which exists since S(h) ≥ h > 0) attains min(v̂, S(v̂)) =
    * min(v̂, S(h)) ≥ h. So the fold is groupBy(node, val) → count
    * (map-side partial combine collapses a mega-hub's 10^7 neighbor
    * rows to ≤ #distinct-values rows per map partition BEFORE the
    * shuffle), then one running-sum window over the collapsed frame —
    * the per-node sort is over DISTINCT values, not neighbors, so the
    * 10^7-neighbor hub that would have serialized one task under the
    * naive row_number-over-all-neighbors fold now sorts at most its
    * value-diversity (bounded by max degree, typically hundreds).
    * Exact and tie-free: val is the window key and unique per node.
    *
    * Unlike [[kCore]]'s fixed rounds, this ITERATES TO THE TRUE FIXED
    * POINT, witnessed by one scalar per round: values are monotone
    * non-increasing under the h-operator (each starts at degree and is
    * bounded below by coreness), so sum(val) strictly decreases until
    * the fixed point and sum-unchanged ⟺ no node changed. An external
    * oracle stays exact by unrolling MORE rounds than convergence
    * needs — extra rounds past the fixed point are identity (q266
    * unrolls 24; measured needs: 21/10/5 at sf0.001/0.01/0.1). Budget
    * exhaustion fails fast (the ConnectedComponents.alternatingStar
    * discipline): a non-converged frame holds upper bounds, not
    * corenesses, and silently returning it would be wrong labels.
    *
    * @return (node, coreness) — one row per node with degree ≥ 1
    */
  def coreness(edges: DataFrame, srcCol: String, dstCol: String,
               maxIter: Int = 64, undirected: Boolean = true): DataFrame = {
    val fwd = edges.select(col(srcCol).as("__a"), col(dstCol).as("__b"))
    val e =
      (if (undirected)
         fwd.unionByName(edges.select(col(dstCol).as("__a"), col(srcCol).as("__b")))
       else fwd).truncated
    // The sum witness rides each checkpoint materialization (observe,
    // the Checkpoints.truncatedObserving idiom): one action and one
    // pass per round instead of checkpoint-then-agg's two. The
    // getOrElse(0L) keeps the empty-frame semantics: sum() over an
    // edgeless input observes null and must yield the empty result,
    // not NPE.
    def sumVal(m: Map[String, Any]): Long =
      Option(m("__s")).map(_.asInstanceOf[Long]).getOrElse(0L)
    val (v0, m0) = e.groupBy(col("__a").as("node"))
      .agg(count(lit(1)).cast("int").as("val"))
      .truncatedObserving(sum(col("val")).as("__s"))
    var v = v0
    var prevSum = sumVal(m0)
    var converged = prevSum == 0L
    // one h-operator round; superseded rounds' checkpoint frames stay
    // persisted until the caller's withQueryCaches scope exits (the
    // Bfs/Landmarks family idiom — Dataset.unpersist cannot release a
    // localCheckpoint, only the RDD sweep can)
    def hStep(cur: DataFrame): DataFrame = {
      val nb = e.join(cur, e("__b") === cur("node"))
        .select(e("__a").as("node"), col("val"))
      // count-threshold h-index (see scaladoc): collapse to
      // (node, val, count) with map-side combine, then S(val) as a
      // running sum over the distinct-value frame and
      // h = max(min(val, S(val))) — no per-neighbor sort anywhere
      val cnt = nb.groupBy("node", "val").agg(count(lit(1)).as("__c"))
      val w = Window.partitionBy("node").orderBy(col("val").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cnt.withColumn("__s", sum(col("__c")).over(w))
        .groupBy("node")
        .agg(max(least(col("val"), col("__s"))).cast("int").as("val"))
    }
    // One convergence check per round. A 2-rounds-per-action block
    // check (exact under per-node monotonicity) was tried and measured
    // flat at x4 — the rounds' shuffle work dominates, not job count —
    // so the simpler loop stays.
    var i = 0
    while (!converged && i < maxIter) {
      val (next, m) = hStep(v).truncatedObserving(sum(col("val")).as("__s"))
      val s = sumVal(m)
      converged = s == prevSum
      prevSum = s
      v = next
      i += 1
    }
    require(converged, s"h-index iteration did not reach its fixed point " +
      s"within maxIter=$maxIter rounds; the current values are upper " +
      "bounds on coreness, not corenesses. Raise maxIter (rounds needed " +
      "are bounded by the graph's core depth, O(max coreness) in practice).")
    v.select(col("node"), col("val").as("coreness"))
  }
}
