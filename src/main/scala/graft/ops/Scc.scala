package graft.ops

import graft.ops.Checkpoints.TruncateOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Strongly connected components of a DIRECTED edge list — the cycle
  * diagnostic for buyer→supplier / citation / identity-link graphs
  * that undirected CC (q77/q217/q233) cannot see: undirected
  * components say "these touch", SCCs say "these feed back into each
  * other", which is what circular-trade detection, dependency-cycle
  * audits and condensation-DAG rollups actually need.
  *
  * Algorithm (distributed path): min-label COLORING with
  * forward/backward confirmation — the MapReduce-friendly member of
  * the Fleischer/Hendrickson/Pınar forward-backward family (FB's
  * divide-and-conquer recursion does not map to a fixed shuffle
  * pipeline; coloring replaces the recursion with peeling rounds, the
  * formulation of Orzan's SCC coloring and of Slota et al.'s
  * trim+FB-coloring hybrids):
  *
  *  1. color(v) = min node id that can REACH v (propagated to
  *     convergence along forward edges; each class's minimum is a
  *     root: no smaller id reaches it);
  *  2. within each color class, nodes that can reach their root
  *     through SAME-COLORED nodes are exactly SCC(root): the root
  *     reaches every class member (it colored them), and a
  *     same-colored return path certifies mutual reachability, while
  *     any path THROUGH another color would imply a smaller reacher
  *     and a different color — contradiction;
  *  3. decided nodes leave the graph; repeat on the remainder (each
  *     round decides at least every class root's SCC, so the active
  *     set strictly shrinks).
  *
  * Shuffle shape per round: the two propagation loops are the
  * engine's frontier discipline verbatim (node-keyed equi-join + agg,
  * 8-byte keys, lazy localCheckpoint every step, convergence via a
  * monotone sum witness — the [[ConnectedComponents]] lesson);
  * deciding and peeling are two anti-joins. Peeling rounds scale with
  * the CONDENSATION structure, not |V|: cycle-rich graphs decide in a
  * few rounds; a pure n-chain of singleton SCCs is the pathological
  * O(n) case, which is why small graphs short-circuit to the exact
  * driver path (Tarjan) below `driverThreshold` — the same
  * tiny-graph economics as [[ConnectedComponents.labelPropagation]],
  * and the planted trade graphs sit under it while identity-link
  * graphs at 100 TB run the distributed loop.
  *
  * Deterministic: labels are min node ids — no RNG, no tie ambiguity.
  *
  * @param edges directed edges (`srcCol` → `dstCol`, integral ids);
  *        nodes absent from every edge are absent from the result
  * @return (node, component) — component = min node id of the node's
  *         SCC; singleton SCCs (including self-loop-only nodes) map
  *         to themselves
  */
object Scc {

  def components(edges: DataFrame, srcCol: String, dstCol: String,
                 driverThreshold: Long = 1000000L,
                 maxOuter: Int = 40, maxInner: Int = 60): DataFrame = {
    val e0 = edges.select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .distinct()
      .cache()
    if (e0.count() <= driverThreshold) {
      val result = tarjanLocal(e0)
      e0.unpersist()
      return result
    }

    val spark = e0.sparkSession
    var decided = spark.range(0).select(col("id").as("node"),
      col("id").as("component"))
    // self-edges never certify anything the trivial path doesn't
    var active = e0.filter(col("a") =!= col("b")).truncated
    var activeNodes = e0.select(col("a").as("node"))
      .union(e0.select(col("b").as("node"))).distinct()
      .truncated
    var outer = 0
    var done = activeNodes.limit(1).count() == 0L
    while (!done && outer < maxOuter) {
      // ---- 0. trim (Slota et al.'s accelerator): an active node with
      // no in-edge or no out-edge cannot sit on a cycle — a singleton
      // SCC, decidable without any propagation. One pass per round
      // (newly exposed trivial nodes peel next round); on DAG-like
      // remainders this collapses what would be one peel round per
      // condensation layer into bulk decisions.
      val both = active.select(col("b").as("node")).distinct()
        .join(active.select(col("a").as("node")).distinct(), Seq("node"))
        .truncated
      val trivial = activeNodes.join(both, Seq("node"), "left_anti")
        .select(col("node"), col("node").as("component"))
        .truncated(eager = true) // eager: read by the union AND the peels below
      decided = decided.unionByName(trivial)
      activeNodes = both
      active = active
        .join(both.select(col("node").as("a")), Seq("a"))
        .join(both.select(col("node").as("b")), Seq("b"))
        .select("a", "b").truncated
      done = activeNodes.limit(1).count() == 0L
      if (done) { outer += 1 }
      else {
      // ---- 1. forward min-label coloring to convergence ----
      var color = activeNodes.withColumn("color", col("node"))
      var prevSum = Option.empty[Long]
      var converged = false
      var i = 0
      while (!converged && i < maxInner) {
        val via = active
          .join(color.select(col("node").as("a"), col("color")), "a")
          .select(col("b").as("node"), col("color"))
        // witness rides the checkpoint pass (truncatedObserving): one
        // action/pass per round, not checkpoint-then-agg's two
        val (next, m) = color.select("node", "color").union(via)
          .groupBy("node").agg(min(col("color")).as("color"))
          .truncatedObserving(sum(col("color")).as("__s"))
        val s = m("__s").asInstanceOf[Long]
        converged = prevSum.contains(s)
        prevSum = Some(s)
        color = next
        i += 1
      }
      require(converged,
        s"Scc: forward coloring did not converge within maxInner=$maxInner " +
          "rounds — raise maxInner (rounds needed are the active subgraph's " +
          "forward-reachability diameter)")
      // ---- 2. backward reach within color, from the class roots ----
      // same-colored edges only; reversed (b -> a)
      val sameColored = active
        .join(color.select(col("node").as("a"), col("color").as("__ca")), "a")
        .join(color.select(col("node").as("b"), col("color").as("__cb")), "b")
        .filter(col("__ca") === col("__cb"))
        .select(col("b").as("from"), col("a").as("to"))
        .truncated
      var reached = color.filter(col("color") === col("node")).select("node")
      var frontier = reached
      var growing = true
      var j = 0
      while (growing && j < maxInner) {
        val newly = sameColored
          .join(frontier.select(col("node").as("from")), "from")
          .select(col("to").as("node")).distinct()
          .join(reached, Seq("node"), "left_anti")
          .truncated
        val n = newly.limit(1).count()
        if (n == 0L) growing = false
        else {
          reached = reached.union(newly).truncated
          frontier = newly
        }
        j += 1
      }
      require(!growing,
        s"Scc: backward confirmation did not drain within maxInner=$maxInner " +
          "rounds — raise maxInner")
      // ---- 3. decide, peel, recurse ----
      val roundDecided = reached.join(color, "node")
        .select(col("node"), col("color").as("component"))
        .truncated(eager = true) // eager: everything below and the return reads it
      decided = decided.unionByName(roundDecided)
      activeNodes = activeNodes
        .join(roundDecided.select("node"), Seq("node"), "left_anti")
        .truncated
      active = active
        .join(roundDecided.select(col("node").as("a")), Seq("a"), "left_anti")
        .join(roundDecided.select(col("node").as("b")), Seq("b"), "left_anti")
        .truncated
      done = activeNodes.limit(1).count() == 0L
      outer += 1
      }
    }
    require(done,
      s"Scc: active nodes remain after maxOuter=$maxOuter peeling rounds — " +
        "the condensation is deeper than the budget (e.g. a long chain of " +
        "singleton SCCs); raise maxOuter or lower driverThreshold")
    e0.unpersist()
    decided
  }

  /** Exact Tarjan SCC over a collected edge list (iterative — explicit
    * stacks, no recursion: collected graphs can still be deep chains).
    * Component representative = min node id of the SCC.
    */
  private def tarjanLocal(e: DataFrame): DataFrame = {
    val edges = e.collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.HashMap
      .empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
    val nodes = scala.collection.mutable.LinkedHashSet.empty[Long]
    edges.foreach { case (a, b) =>
      nodes += a; nodes += b
      adj.getOrElseUpdate(a, scala.collection.mutable.ArrayBuffer.empty) += b
    }
    val index = scala.collection.mutable.HashMap.empty[Long, Int]
    val low = scala.collection.mutable.HashMap.empty[Long, Int]
    val onStack = scala.collection.mutable.HashSet.empty[Long]
    val stack = scala.collection.mutable.ArrayBuffer.empty[Long]
    val comp = scala.collection.mutable.HashMap.empty[Long, Long]
    var counter = 0
    // iterative DFS: frames of (node, next child offset)
    nodes.toSeq.sorted.foreach { start =>
      if (!index.contains(start)) {
        val frames = scala.collection.mutable.ArrayBuffer[(Long, Int)]((start, 0))
        index(start) = counter; low(start) = counter; counter += 1
        stack += start; onStack += start
        while (frames.nonEmpty) {
          val (v, ci) = frames.last
          val children = adj.getOrElse(v, scala.collection.mutable.ArrayBuffer.empty)
          if (ci < children.length) {
            frames(frames.length - 1) = (v, ci + 1)
            val w = children(ci)
            if (!index.contains(w)) {
              index(w) = counter; low(w) = counter; counter += 1
              stack += w; onStack += w
              frames += ((w, 0))
            } else if (onStack.contains(w)) {
              low(v) = math.min(low(v), index(w))
            }
          } else {
            frames.remove(frames.length - 1)
            if (frames.nonEmpty) {
              val p = frames.last._1
              low(p) = math.min(low(p), low(v))
            }
            if (low(v) == index(v)) { // root of an SCC: pop it
              val members = scala.collection.mutable.ArrayBuffer.empty[Long]
              var w = 0L
              do {
                w = stack.remove(stack.length - 1)
                onStack -= w
                members += w
              } while (w != v)
              val rep = members.min
              members.foreach(m => comp(m) = rep)
            }
          }
        }
      }
    }
    val session = e.sparkSession
    import session.implicits._
    // parallelize (not a LocalRelation): up to driverThreshold nodes —
    // a single-task local table would ship the whole result as one
    // oversized task; 8 slices keeps tasks inside the recommended size
    session.sparkContext
      .parallelize(nodes.toSeq.map(n => (n, comp(n))), 8)
      .toDF("node", "component")
  }
}
