package graft

import org.apache.spark.sql.functions._
import graft.ops.Scc

/** [[Scc.components]]: exact driver Tarjan under the threshold, the
  * trim+coloring peeling loop above it, row-identical results on both.
  */
class SccSpec extends SparkSuite {
  import spark.implicits._

  private def scc(edges: Seq[(Long, Long)], threshold: Long = 1000000L)
  : Map[Long, Long] =
    Scc.components(edges.toDF("s", "t"), "s", "t",
        driverThreshold = threshold)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two cycles joined one-way stay separate SCCs; bridge chain nodes are singletons") {
    // cycle A: 1→2→3→1; cycle B: 10→11→12→10; bridge 3→7→10 (one-way)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L),
      (3L, 7L), (7L, 10L))
    val got = scc(e)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 7L -> 7L))
  }

  test("figure-eight: cycles sharing a node merge into one SCC") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 8L), (8L, 9L), (9L, 3L))
    val got = scc(e)
    assert(got.values.toSet == Set(1L) && got.keySet ==
      Set(1L, 2L, 3L, 8L, 9L))
  }

  test("pure chain (both id directions) and self-loops are all singletons") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), // ascending chain
      (9L, 8L), (8L, 7L), // descending chain
      (5L, 5L)) // self-loop
    val got = scc(e)
    assert(got == got.keys.map(k => k -> k).toMap)
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 7L, 8L, 9L))
  }

  test("distributed peeling path is row-identical to driver Tarjan (mixed graph, long cycle)") {
    // 11-cycle with SHUFFLED ids (coloring must propagate the real min
    // around the whole ring: 7 generates Z/11, so ids are not in ring
    // order), a 3-cycle, and a DAG diamond bridged one-way between them
    val ring = (0 until 11).map(i => (i * 7 % 11 + 100L, (i + 1) * 7 % 11 + 100L))
    val extra = Seq((300L, 301L), (301L, 302L), (302L, 300L), // 3-cycle
      (1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), // diamond + tail
      (4L, 100L), (302L, 1L)) // one-way bridges into/out of the cycles
    val e = ring ++ extra
    val exact = scc(e)
    val dist = scc(e, threshold = 0L)
    assert(dist == exact, "distributed result diverges from Tarjan")
    // closed form: ring members share min ring id, 3-cycle shares 300,
    // diamond/tail nodes are singletons
    val ringNodes = ring.flatMap(p => Seq(p._1, p._2)).toSet
    val ringMin = ringNodes.min
    ringNodes.foreach(n => assert(exact(n) == ringMin))
    Seq(300L, 301L, 302L).foreach(n => assert(exact(n) == 300L))
    Seq(1L, 2L, 3L, 4L).foreach(n => assert(exact(n) == n))
  }

  test("q239 planted graph: even customers one SCC per customer, odd all singletons") {
    // miniature of the q239 construction: customers 2 (even, cyclic)
    // and 3 (odd, chain), orders chained in date order
    val orders = Seq(
      (2L, 20L, "1996-01-01"), (2L, 25L, "1996-02-01"), (2L, 22L, "1996-03-01"),
      (3L, 30L, "1996-01-15"), (3L, 31L, "1996-02-15"))
    val o = orders.toDF("c", "k", "d")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c").orderBy(col("d"), col("k"))
    val chain = o.withColumn("nk", lead(col("k"), 1).over(w))
      .filter(col("nk").isNotNull).select(col("k").as("s"), col("nk").as("t"))
    val back = o.groupBy("c")
      .agg(min(struct(col("d"), col("k"))).getField("k").as("first_k"),
        max(struct(col("d"), col("k"))).getField("k").as("last_k"),
        count(lit(1)).as("n"))
      .filter(col("c") % 2 === 0 && col("n") >= 2)
      .select(col("last_k").as("s"), col("first_k").as("t"))
    val got = Scc.components(chain.unionByName(back), "s", "t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(20L -> 20L, 25L -> 20L, 22L -> 20L,
      30L -> 30L, 31L -> 31L))
  }
}
