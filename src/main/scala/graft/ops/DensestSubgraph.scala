package graft.ops

import graft.ops.Checkpoints.TruncateOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Densest-subgraph extraction by batched greedy peeling — Charikar's
  * 2-approximation (STOC 2000) in the distributed (1+ε)-batch form of
  * Bahmani, Kumar & Vassilvitskii (VLDB 2012), at ε = 1/2: each round
  * removes EVERY node whose degree is ≤ 2(1+ε)·|E|/|V| = 3|E|/|V|, so
  * the node count shrinks geometrically (factor ≥ 1+ε per round) and
  * the loop finishes in O(log₁.₅ n) rounds regardless of graph size —
  * the property that makes the sequential remove-one-minimum peel
  * (O(n) rounds) cluster-viable. The densest prefix over the peel
  * trace is a 2(1+ε) = 3-approximation of the maximum-density
  * subgraph (ε = 1/2 keeps the factor tight enough that a planted
  * clique over a sparse fringe actually surfaces — at ε = 1 the
  * round-0 threshold 4|E|/|V| already swallows moderate cliques); the
  * trace itself is the useful artifact for curation (spam/bot/
  * link-farm mining reads the density knee, not just the winner).
  *
  * Determinism discipline: the peel condition is evaluated in exact
  * integers — remove iff `2 · deg · |V| ≤ 3 · Σdeg` (Σdeg = 2|E|, so
  * this IS deg ≤ 3|E|/|V| without the float) — and the reported
  * density is the fixed-point integer `(10⁶ · |E|) div |V|`, so an
  * external SQL engine replays the trace bit-identically (no float
  * boundary, no tie ambiguity). `2 · deg · |V|` stays far inside
  * Long: even at 100 TB-scale graphs (|V| = 10⁹, max-deg = 10⁷) the
  * product is 2·10¹⁶ < 2⁶³.
  *
  * Scale shape: per round, one degree aggregation (map-side combine on
  * node keys) + a 2-scalar collect + two semi-joins of the edge list
  * against the survivor set — all shuffles on node keys, nothing
  * quadratic, driver state bounded by O(rounds) scalars. Lineage is
  * truncated per round with a lazy localCheckpoint (the KCore /
  * ConnectedComponents discipline — each round embeds the prior plan
  * three times, so an untruncated loop grows the plan 3^R-fold).
  */
object DensestSubgraph {

  /** Peel trace: one row per round over the UNDIRECTED edge list
    * (each edge one row, endpoints in either order, no self-loops) —
    * `(round, n_nodes, n_edges, density_fp, is_best)` where
    * `density_fp = (10⁶·|E|) div |V|` and `is_best` marks the first
    * round attaining the maximum density (the 2(1+ε)-approximate
    * densest subgraph is that round's survivor set). Stops at the
    * first empty round or after `maxRounds` peels — both engines
    * truncate identically, so a fixed `maxRounds` keeps the trace
    * oracle-replayable even before convergence.
    */
  def peelTrace(edges: DataFrame, srcCol: String, dstCol: String,
                maxRounds: Int): DataFrame = {
    val spark = edges.sparkSession
    var alive = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .truncated
    val trace = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    var round = 0
    var emptied = false
    while (round < maxRounds && !emptied) {
      // 2 scalars per round to the driver — bounded, the iterative-op
      // budget (KCore peels collect nothing; CC collects a count).
      // They ride the degree frame's checkpoint pass (truncatedObserving):
      // deg previously fed TWO consumers — the scalar readout action and
      // the next round's semi-join lineage — and, unmaterialized, the
      // degree aggregation ran twice per round. One pass now computes,
      // checkpoints and measures it.
      val (deg, m) = alive.select(col("a").as("node"))
        .unionByName(alive.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("__d"))
        .truncatedObserving(count(lit(1)).as("v"), sum(col("__d")).as("d2"))
      val v = m("v").asInstanceOf[Long]
      val d2 = Option(m("d2")).map(_.asInstanceOf[Long]).getOrElse(0L)
      if (v == 0L) emptied = true
      else {
        trace += ((round, v, d2 / 2))
        val keep = deg
          .filter(lit(2L) * col("__d") * lit(v) > lit(3L) * lit(d2))
          .select("node")
        alive = alive
          .join(keep.select(col("node").as("a")), Seq("a"), "left_semi")
          .join(keep.select(col("node").as("b")), Seq("b"), "left_semi")
          .truncated
        round += 1
      }
    }
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("round", IntegerType, nullable = false),
      StructField("n_nodes", LongType, nullable = false),
      StructField("n_edges", LongType, nullable = false)))
    val rows = spark.createDataFrame(
        spark.sparkContext.parallelize(
          trace.toSeq.map { case (r, v, e) => org.apache.spark.sql.Row(r, v, e) }, 1),
        schema)
      .withColumn("density_fp",
        expr("(1000000 * n_edges) div n_nodes").cast("long"))
    // first round attaining max density — exact-integer comparisons
    // only, so the winner matches any engine's replay of the trace
    val all = Window.partitionBy(lit(1))
    rows
      .withColumn("__best", max(col("density_fp")).over(all))
      .withColumn("__br",
        min(when(col("density_fp") === col("__best"), col("round"))).over(all))
      .withColumn("is_best", col("round") === col("__br"))
      .drop("__best", "__br")
  }
}
