package graft

import org.apache.spark.sql.functions._
import graft.ops.DensestSubgraph

class DensestSubgraphSpec extends SparkSuite {
  import spark.implicits._

  /** In-spec sequential replay of the exact integer peel rule — the
    * engine must match this trace bit for bit (same rule the DuckDB
    * oracle unrolls).
    */
  private def refTrace(edges0: Set[(Long, Long)],
                       maxRounds: Int): Seq[(Int, Long, Long, Long)] = {
    var edges = edges0
    var out = Vector.empty[(Int, Long, Long)]
    var r = 0
    var done = false
    while (r < maxRounds && !done) {
      val deg = edges.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
      val v = deg.size.toLong
      val d2 = deg.values.sum
      if (v == 0) done = true
      else {
        out = out :+ ((r, v, d2 / 2))
        val keep = deg.filter { case (_, d) => 2 * d * v > 3 * d2 }.keySet
        edges = edges.filter { case (a, b) => keep(a) && keep(b) }
        r += 1
      }
    }
    out.map { case (r0, v, e) => (r0, v, e, 1000000L * e / v) }
  }

  // K6 clique (density 2.5) + a 12-node path (density ~0.92) + a
  // pendant star off node 1 — the peel must strip the sparse fringe
  // first and flag the clique rounds as densest
  private val cliqueNodes = (1L to 6L)
  private val clique = for {
    a <- cliqueNodes; b <- cliqueNodes if a < b
  } yield (a, b)
  private val path = (100L until 111L).map(i => (i, i + 1))
  private val star = (200L to 203L).map(i => (1L, i))
  private val planted: Set[(Long, Long)] =
    (clique ++ path ++ star).toSet

  test("peelTrace matches the sequential integer-rule replay on a planted graph") {
    val edges = planted.toSeq.toDF("a", "b")
    val got = DensestSubgraph.peelTrace(edges, "a", "b", maxRounds = 24)
      .orderBy("round")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    val ref = refTrace(planted, 24)
    assert(got.length == ref.length, s"trace length ${got.length} vs ${ref.length}")
    got.zip(ref).foreach { case ((gr, gv, ge, gd, _), (rr, rv, re, rd)) =>
      assert((gr, gv, ge, gd) == ((rr, rv, re, rd)),
        s"round $gr: got ($gv,$ge,$gd) ref ($rv,$re,$rd)")
    }
    // the clique survives the fringe peels: max density is the clique's
    val bestFp = got.map(_._4).max
    assert(bestFp == 2500000L, s"expected the K6 density 2.5, got $bestFp")
    // is_best marks exactly the FIRST max-density round
    val bests = got.filter(_._5)
    assert(bests.length == 1)
    assert(bests.head._1 == got.filter(_._4 == bestFp).map(_._1).min)
  }

  test("peelTrace: node count shrinks geometrically (Bahmani bound) and terminates") {
    val edges = planted.toSeq.toDF("a", "b")
    val vs = DensestSubgraph.peelTrace(edges, "a", "b", maxRounds = 24)
      .orderBy("round").collect().map(_.getLong(1))
    assert(vs.zip(vs.tail).forall { case (a, b) => b < a },
      s"node count must strictly decrease: ${vs.toSeq}")
    // ε = 1/2 batch peel: rounds ≤ log₁.₅ n with slack (Bahmani et al.
    // 2012) — log₁.₅ 22 ≈ 7.6, so 10 bounds it comfortably
    assert(vs.length <= 10, s"planted 22-node graph peeled in ${vs.length} rounds")
  }

  test("peelTrace on an empty edge set is an empty trace") {
    val edges = Seq((1L, 2L)).toDF("a", "b").filter(col("a") < 0)
    assert(DensestSubgraph.peelTrace(edges, "a", "b", maxRounds = 4).count() == 0)
  }
}
