package graft

import org.apache.spark.sql.functions._
import graft.ops.{LinkPrediction, PrefixSum, Skyline}

/** Round-13 additions: 2-D skyline (global two-phase prefix-max +
  * grouped window variants) and neighborhood-overlap link prediction.
  */
class SkylineLinkPredSpec extends SparkSuite {
  import spark.implicits._

  test("PrefixSum.withRunningMax: exclusive, null-prefixed, cross-partition") {
    val df = spark.range(0, 100).toDF("x")
      .withColumn("y", pmod(col("x") * 37, lit(100)))
      .repartition(7)
    val got = PrefixSum.withRunningMax(df, "y", "pm", Seq(col("x").asc))
      .orderBy("x").collect()
    var best = Option.empty[Long]
    got.foreach { r =>
      val expect = best.map(Long.box).orNull
      assert(r.getAs[Any]("pm") == expect, s"at x=${r.getLong(0)}")
      val y = r.getLong(1)
      best = Some(best.fold(y)(math.max(_, y)))
    }
  }

  test("Skyline.frontier2d matches the quadratic dominance definition") {
    // (x, y) points with duplicates and ties at the frontier.
    val pts = Seq((1, 5), (1, 5), (1, 3), (2, 7), (2, 6), (3, 7), (4, 2),
      (5, 8), (6, 8), (6, 1)).zipWithIndex
      .map { case ((x, y), i) => (i.toLong, x, y) }
    val df = pts.toDF("id", "x", "y").repartition(4)
    val got = Skyline.frontier2d(df, "x", "y")
      .select("id").as[Long].collect().toSet
    val naive = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, qx, qy) =>
        qx <= x && qy >= y && (qx < x || qy > y)
      }
    }.map(_._1).toSet
    assert(got == naive)
    // Both (1,5) duplicates survive: neither strictly dominates the other.
    assert(got.count(pts.filter(p => p._2 == 1 && p._3 == 5).map(_._1).toSet) == 2)
  }

  test("Skyline.frontier2dByGroup = frontier2d per group") {
    val df = (for {
      g <- Seq("a", "b"); i <- 0 until 50
    } yield (g, i.toLong, (i * 13 % 50) + (if (g == "a") 0 else 100),
        (i * 29 % 50).toLong))
      .toDF("g", "id", "x", "y").repartition(5)
    val got = Skyline.frontier2dByGroup(df, "g", "x", "y")
      .select("g", "id").as[(String, Long)].collect().toSet
    val expect = Seq("a", "b").flatMap { g =>
      Skyline.frontier2d(df.filter(col("g") === g), "x", "y")
        .select("g", "id").as[(String, Long)].collect()
    }.toSet
    assert(got == expect)
  }

  test("LinkPrediction.scores on a hand-checked 5-node graph") {
    // Path 1-2-3-4 plus edge 1-3: wedges at 2 (1,3), at 3 (1,4)&(2,4)&(1,2), at 1 (2,3).
    // Non-edges: (1,4), (2,4), and (2,3)? 2-3 IS an edge. Edges: 12,23,34,13.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L)).toDF("a", "b")
    val got = LinkPrediction.scores(edges, "a", "b", hubCap = 32)
      .orderBy("u", "v")
      .select("u", "v", "cn", "jaccard", "adamic_adar")
      .as[(Long, Long, Int, Double, Double)].collect().toSeq
    // deg: 1->2, 2->2, 3->3, 4->1.
    // (1,4): common nbr 3 (deg 3): aa = 1/ln3; jaccard = 1/(2+1-1) = 0.5
    // (2,4): common nbr 3: aa = 1/ln3; jaccard = 1/(2+1-1) = 0.5
    val aaLn3 = math.round(1e6 / math.log(3.0)) / 1e6
    assert(got == Seq(
      (1L, 4L, 1, 0.5, aaLn3),
      (2L, 4L, 1, 0.5, aaLn3)))
  }

  test("LinkPrediction hub cap drops the hub as witness but keeps its degree") {
    // Star center 0 with leaves 1..5, plus edge 1-2. With hubCap < 5 the
    // center cannot witness leaf pairs; only wedges at 1 and 2 remain.
    val star = (1L to 5L).map(l => (0L, l)) :+ (1L, 2L)
    val edges = star.toDF("a", "b")
    val got = LinkPrediction.scores(edges, "a", "b", hubCap = 4)
      .select("u", "v").as[(Long, Long)].collect().toSet
    // Wedges at 1: (0,2) is an edge; at 2: (0,1) is an edge — so no
    // candidate pairs survive at all once the hub is capped out.
    assert(got.isEmpty)
    val uncapped = LinkPrediction.scores(edges, "a", "b", hubCap = 32)
    // Uncapped, the center witnesses all leaf pairs except the 1-2 edge.
    assert(uncapped.count() == 9) // C(5,2) = 10 minus the (1,2) edge
    // Degrees still include the hub: (3,4) jaccard = 1/(1+1-1)... both
    // leaves have degree 1 (to hub) -> jaccard 1/(2-1) = 1.0 with cn=1.
    val r34 = uncapped.filter(col("u") === 3 && col("v") === 4)
      .select("cn", "jaccard").as[(Int, Double)].head()
    assert(r34 == ((1, 1.0)))
  }
}
