package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only weak-scaling octaves for the bench-dominating graph family
  * (r18 verdict item 5): alternating-star CC (q217's long-diameter
  * order chains), HITS (q226's customer→supplier purchase graph, the
  * production single-normalization path), and Luby MIS (q236's part
  * co-occurrence graph) at x1 → x4 → x16 key-shifted unions of the
  * sf0.1 base — disjoint shifted copies, so the graph grows in
  * COMPONENT COUNT at constant diameter/degree structure: the
  * weak-scaling shape a 100 TB run has, where per-round cost must grow
  * linearly in the edge count and the round count must stay flat.
  *
  * Edges are pre-built and localCheckpointed per scale; the timer sees
  * the ITERATIVE op only, so the per-octave ratio reads the asymptote
  * directly (a ratio ≈ octave factor = input-linear; round-count drift
  * would show as super-linear growth).
  */
object ProfileGraphScaling {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[profile] $name%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }

    def replicate(df: DataFrame, cols: Seq[String], copies: Int): DataFrame = {
      val shifts = cols.map(c =>
        c -> (df.agg(max(col(c))).head().getLong(0) + 1)).toMap
      (0 until copies).map { i =>
        shifts.foldLeft(df) { case (d, (c, s)) =>
          d.withColumn(c, col(c) + lit(i * s)) }
      }.reduce(_ unionByName _)
    }

    val orders = T(spark, dir, "orders")
      .select(col("o_custkey").cast("long").as("c"),
        col("o_orderkey").cast("long").as("k"), col("o_orderdate").as("d"))
      .cache()
    orders.count()
    val liOrd = T(spark, dir, "lineitem")
      .join(T(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").cast("long").as("c"),
        col("l_suppkey").cast("long").as("s"),
        col("l_orderkey").cast("long").as("o"),
        col("l_partkey").cast("long").as("p"))
      .cache()
    liOrd.count()

    for (copies <- Seq(1, 4, 16)) {
      println(s"== x$copies ==")
      // q217 shape: per-customer date-consecutive order chains
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("c").orderBy(col("d"), col("k"))
      val chain = replicate(orders, Seq("c", "k"), copies)
        .withColumn("nk", lead(col("k"), 1).over(w))
        .filter(col("nk").isNotNull)
        .select(col("k").as("s"), col("nk").as("t"))
        .localCheckpoint()
      time(s"cc_alternating_star x$copies")(
        graft.ops.ConnectedComponents.alternatingStar(chain, "s", "t"))
      chain.unpersist()

      // q226 shape: customer→supplier weighted purchase graph, hub side
      // replicated (busier marketplace, constant authority set)
      val hitsE = replicate(liOrd.select("c", "s"), Seq("c"), copies)
        .groupBy("c", "s").agg(count(lit(1)).as("w"))
        .localCheckpoint()
      time(s"hits_production x$copies")(
        graft.ops.Hits.bipartite(hitsE, "c", "s", "w",
          iters = Graph.HitsIters, exactRounding = false))
      hitsE.unpersist()

      // q236 shape: part co-occurrence graph, disjoint shifted copies
      val li = replicate(liOrd.select("o", "p"), Seq("o", "p"), copies)
        .distinct()
      val misE = graft.ops.Cooccur.groupPairs(li, "o", "p")
        .groupBy("pa", "pb").agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 2)
        .select("pa", "pb")
        .localCheckpoint()
      time(s"luby_mis x$copies")(
        graft.ops.Mis.luby(misE, "pa", "pb", rounds = Graph.MisRounds))
      misE.unpersist()
    }
    spark.stop()
  }
}
