package graft

import org.apache.spark.sql.functions._
import graft.llm.{SetSimJoin, TextOps}
import graft.ops.ZOrder

/** Invariants for the engine-infrastructure family (q139-q143). */
class EngineQueriesSpec extends SparkSuite {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("prefix-filter join returns EXACTLY the brute-force pair set") {
    val sets = spark.read.parquet(s"$sf/documents.parquet").select(col("doc_id"),
      TextOps.ngramsAll(TextOps.tokenize(col("text")), 3).as("s"))
    val fast = SetSimJoin.prefixFilterJoin(sets, "doc_id", "s", 0.5)

    val d = sets.select(col("doc_id"), array_distinct(col("s")).as("s"))
      .filter(size(col("s")) > 0)
    val a = d.select(col("doc_id").as("a_doc"), col("s").as("sa"))
    val b = d.select(col("doc_id").as("b_doc"), col("s").as("sb"))
    val brute = a.crossJoin(b).filter(col("a_doc") < col("b_doc"))
      .select(col("a_doc"), col("b_doc"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb")))).as("jaccard"))
      .filter(col("jaccard") >= 0.5)

    assert(fast.exceptAll(brute).count() == 0)
    assert(brute.exceptAll(fast).count() == 0)
    assert(fast.count() > 0, "expected planted near-dup pairs at sf0.001")
  }

  test("prefix-filter join plans no cartesian / nested-loop join") {
    val plan = q("q139_prefix_sim_join").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
  }

  test("zValue interleaves bits exactly (deinterleave round-trips)") {
    val bits = 10
    val df = spark.range(0, 2000, 7)
      .select((col("id") % 1024).as("x"), ((col("id") * 31 + 5) % 1024).as("y"))
      .withColumn("z", ZOrder.zValue(col("x"), col("y"), bits))
    // rebuild x and y from alternating z bits
    val xBack = (0 until bits).map(i =>
      shiftleft(shiftright(col("z"), 2 * i).bitwiseAND(lit(1L)), i)).reduce(_ + _)
    val yBack = (0 until bits).map(i =>
      shiftleft(shiftright(col("z"), 2 * i + 1).bitwiseAND(lit(1L)), i)).reduce(_ + _)
    assert(df.filter(xBack =!= col("x") || yBack =!= col("y")).count() == 0)
    // SQL twin produces the identical value
    val viaSql = df.withColumn("z2", expr(
      ZOrder.zValueSql("x", "y", bits).replace("&", "&"))) // same ANSI ops in Spark SQL
    assert(viaSql.filter(col("z") =!= col("z2")).count() == 0)
  }

  test("zorder buckets bound BOTH dimensions tighter than linear bounds the other") {
    val out = q("q141_zorder_layout").collect().map(r =>
      r.getAs[String]("layout") -> (r.getAs[Double]("avg_x_span"), r.getAs[Double]("avg_y_span"))).toMap
    val (zx, zy) = out("zorder")
    val (_, ly) = out("linear")
    // linear layout leaves the non-sorted dimension unbounded; z-order
    // must bound it strictly tighter while keeping x bounded too
    assert(zy < ly, s"zorder y-span $zy should beat linear y-span $ly")
    assert(zx < 1024 && zy < 1024)
  }

  test("q140 skew profile internal consistency") {
    val rows = q("q140_skew_profile").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("max_rows") <= r.getAs[Long]("n_rows"))
      assert(r.getAs[Double]("skew_ratio") >= 1.0 - 1e-9)
      val share = r.getAs[Double]("top_share")
      assert(share > 0 && share <= 1)
    }
  }

  test("q142 dictionary encoding compresses the word-salad corpus") {
    val rows = q("q142_dict_encode").collect()
    assert(rows.nonEmpty)
    // tiny vocabulary -> 1-2 digit codes must beat multi-char words
    rows.foreach(r => assert(r.getAs[Double]("ratio") < 1.0))
  }

  test("q143 interleave schedule is fair across sources in every prefix") {
    val rows = q("q143_interleave_mix").orderBy("pos").collect()
    assert(rows.length == 100)
    // positions are 1..100 and rnk is non-decreasing along the schedule
    assert(rows.map(_.getAs[Long]("pos")).toSeq == (1L to 100L))
    val rnks = rows.map(_.getAs[Long]("rnk"))
    assert(rnks.zip(rnks.tail).forall { case (p, n) => p <= n })
    // within one rank tier, each source appears at most once
    val bySrc = rows.groupBy(_.getAs[Long]("rnk"))
    bySrc.values.foreach { tier =>
      val srcs = tier.map(_.getAs[String]("source"))
      assert(srcs.distinct.length == srcs.length)
    }
  }
}
