package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec

class RulesSpec extends SparkSuite {
  import spark.implicits._

  test("RangeJoinRewrite: BETWEEN join plans without nested loop and matches exact result") {
    val pts = (0 until 500).map(i => (i, (i * 37 % 1000).toDouble))
    val ivs = (0 until 40).map(i => (i, i * 31.0, i * 31.0 + 150.0))
    val pdf = pts.toDF("pid", "x")
    val idf = ivs.toDF("iid", "lo", "hi")
    val joined = pdf.join(idf, col("x") >= col("lo") && col("x") <= col("hi"))
      .select("pid", "iid")
    val plan = joined.queryExecution.executedPlan
    assert(plan.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      s"expected binned equi-join, got:\n$plan")
    val got = joined.collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val expected = (for {
      (pid, x) <- pts
      (iid, lo, hi) <- ivs
      if x >= lo && x <= hi
    } yield (pid, iid)).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("RangeJoinRewrite: leaves equi-keyed and non-range joins alone") {
    val a = Seq((1, 5.0), (2, 6.0)).toDF("k", "v")
    val b = Seq((1, 4.0, 8.0), (2, 7.0, 9.0)).toDF("k2", "lo", "hi")
    // equi key present -> untouched (plans as a hash join, results exact)
    val equi = a.join(b, col("k") === col("k2") &&
      col("v") >= col("lo") && col("v") <= col("hi"))
    assert(equi.collect().map(_.getInt(0)).toSeq == Seq(1))
    // one-sided inequality only -> no BETWEEN pattern, rule must not fire
    val half = a.join(b, col("v") >= col("lo")) // (5,4) (6,4) match; lo=7 filters both
    assert(half.count() == 2)
  }

  test("GraftSession.builder: preloaded engine config") {
    val b = graft.GraftSession.builder(cores = 2)
    // builder config is applied at getOrCreate; with a session already
    // running we just assert the settings it would apply resolve in the
    // active one built from the same extension class
    assert(spark.conf.get("spark.sql.extensions").contains("GraftExtensions"))
    assert(spark.sql("SELECT graft_dot_product(array(1.0d), array(2.0d)) v")
      .head.getDouble(0) == 2.0)
    assert(b != null)
  }

  test("RangeJoinRewrite: fires through SQL text too") {
    spark.sql("SELECT 1 AS p, 5.0 AS x").createOrReplaceTempView("rj_pts")
    spark.sql("SELECT 10 AS iid, 1.0 AS lo, 6.0 AS hi").createOrReplaceTempView("rj_ivs")
    val df = spark.sql(
      "SELECT p, iid FROM rj_pts JOIN rj_ivs ON x BETWEEN lo AND hi")
    assert(df.collect().map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((1, 10)))
  }
}
