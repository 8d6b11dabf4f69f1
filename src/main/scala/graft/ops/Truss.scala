package graft.ops

import graft.ops.Checkpoints.TruncateOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-truss decomposition step — the EDGE-cohesion refinement of
  * [[KCore]]'s node peeling (Cohen, NSA TR 2008): the k-truss is the
  * maximal subgraph in which every EDGE closes at least k−2 triangles.
  * Where k-core asks "is this node well-connected", k-truss asks "is
  * this TIE itself embedded in mutual structure" — the sharper signal
  * for community cores and for pruning incidental co-occurrence edges
  * before clustering (a hub edge survives k-core trivially but dies in
  * the truss unless its endpoints share neighbors).
  *
  * Algorithm: support peeling to a fixpoint — compute per-edge
  * support (triangles through the edge) on the CURRENT subgraph, drop
  * edges below k−2, repeat; monotone (supports only fall as edges
  * leave), so equal edge counts between rounds certify the fixpoint,
  * and EXTRA rounds past it are no-ops — which is what lets a
  * fixed-round unrolled SQL oracle replay a convergence loop exactly
  * (q242: the oracle unrolls more rounds than the data needs; both
  * engines agree on every prefix after convergence).
  *
  * Per-round support uses the degree-ordered orientation of
  * [[Triangles]] (Suri & Vassilvitskii, WWW'11): each triangle is
  * enumerated exactly once at its smallest-(degree, id) corner, wedge
  * fanout bounded by Σ d⁺(v)² ≤ |E|^1.5 — no hub deg² blow-up — then
  * scattered back to its three canonical edges through one
  * explode + count. All shuffles are (node or edge-pair)-keyed
  * equi-joins; lineage truncates every round; one count action per
  * round is the convergence witness. Integer arithmetic end to end.
  *
  * @param edges any directed/duplicated edge list; canonicalized
  *              (a < b, self-loops dropped, distinct) first
  * @param k     truss order (≥ 2; k = 2 keeps every edge in ≥ 0
  *              triangles, i.e. the whole simple graph)
  * @return (a, b, support) — the surviving canonical edges with their
  *         support inside the k-truss (support ≥ k−2 by construction)
  */
object Truss {

  def ktruss(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
             maxIter: Int = 30): DataFrame = {
    require(k >= 2, s"k must be at least 2, got $k")
    var e = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .truncated
    var n = e.count()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // count witness rides the checkpoint pass (truncatedObserving):
      // one action/pass per round, not checkpoint-then-count's two
      val (next, obs) = e.join(edgeSupport(e), Seq("a", "b"), "left")
        .filter(coalesce(col("support"), lit(0L)) >= (k - 2).toLong)
        .select("a", "b")
        .truncatedObserving(count(lit(1)).as("__n"))
      val m = obs("__n").asInstanceOf[Long]
      converged = m == n // supports only fall: same size ⟺ nothing dropped
      n = m
      e = next
      i += 1
    }
    require(converged,
      s"Truss.ktruss did not reach its fixpoint within maxIter=$maxIter " +
        "peeling rounds — pathological input or budget too small")
    e.join(edgeSupport(e), Seq("a", "b"), "left")
      .select(col("a"), col("b"),
        coalesce(col("support"), lit(0L)).as("support"))
  }

  /** Per-canonical-edge triangle count over a canonical (a < b,
    * distinct) edge list, via the degree-ordered orientation. Edges in
    * no triangle are absent (callers coalesce to 0).
    */
  private[graft] def edgeSupport(e: DataFrame): DataFrame = {
    val deg = e.select(col("a").as("node")).unionAll(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val keyed = e
      .join(deg.select(col("node").as("a"), struct(col("d"), col("node")).as("ka")), "a")
      .join(deg.select(col("node").as("b"), struct(col("d"), col("node")).as("kb")), "b")
    val oriented = keyed.select(
      when(col("ka") < col("kb"), col("a")).otherwise(col("b")).as("u"),
      when(col("ka") < col("kb"), col("b")).otherwise(col("a")).as("v"),
      when(col("ka") < col("kb"), col("kb")).otherwise(col("ka")).as("kv"))
      .truncated // read 3x below (two wedge sides + closer)
    val wedges = oriented.select(col("u"), col("v").as("x"), col("kv").as("kx"))
      .join(oriented.select(col("u"), col("v").as("y"), col("kv").as("ky")), "u")
      .filter(col("kx") < col("ky"))
    val tri = wedges.join(
      oriented.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"))
      .select(col("u"), col("x"), col("y"))
    // scatter each triangle to its three canonical edges
    tri.select(explode(array(
        struct(least(col("u"), col("x")).as("a"), greatest(col("u"), col("x")).as("b")),
        struct(least(col("u"), col("y")).as("a"), greatest(col("u"), col("y")).as("b")),
        struct(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))))
        .as("__e"))
      .select(col("__e.a").as("a"), col("__e.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("support"))
  }
}
