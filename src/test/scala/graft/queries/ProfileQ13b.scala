package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{functions => F}

/** Dev-only sub-plan profiler for the q13 pair-blend stage. */
object ProfileQ13b {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$dir/lineitem.parquet").groupBy("l_returnflag").count().collect()
    def time(name: String)(df: => DataFrame): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[piece] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }
    val g = Reports.customerGeo(spark, dir)
    time("customerGeo")(g)
    time("peerPairs")(Reports.peerPairs(spark, dir))
    // pairs without the blend: join shape only
    time("pairsNoBlend") {
      val n = spark.sessionState.conf.numShufflePartitions
      val t = g.select(g.columns.toSeq.map(c => col(c).as(s"t_$c")): _*)
        .filter(col("t_c_custkey") % 7 === 0).repartition(n)
      val s = g.select(g.columns.toSeq.map(c => col(c).as(s"s_$c")): _*)
      t.join(s, col("t_c_nationkey") === col("s_c_nationkey") &&
          col("s_c_custkey") =!= col("t_c_custkey"))
        .select(col("t_c_custkey").as("prospect"), col("s_c_custkey").as("src_custkey"))
    }
    // blend without hops/havs
    time("pairsSimOnly") {
      val n = spark.sessionState.conf.numShufflePartitions
      val t = g.select(g.columns.toSeq.map(c => col(c).as(s"t_$c")): _*)
        .filter(col("t_c_custkey") % 7 === 0).repartition(n)
      val s = g.select(g.columns.toSeq.map(c => col(c).as(s"s_$c")): _*)
      val sim = lit(1.0) - abs(col("t_c_acctbal") - col("s_c_acctbal")) / lit(11000.0)
      t.join(s, col("t_c_nationkey") === col("s_c_nationkey") &&
          col("s_c_custkey") =!= col("t_c_custkey"))
        .select(col("t_c_custkey").as("prospect"), col("s_c_custkey").as("src_custkey"),
          round(sim, 6).as("score"))
    }
    // blend with hops only
    time("pairsHops") {
      val n = spark.sessionState.conf.numShufflePartitions
      val t = g.select(g.columns.toSeq.map(c => col(c).as(s"t_$c")): _*)
        .filter(col("t_c_custkey") % 7 === 0).repartition(n)
      val s = g.select(g.columns.toSeq.map(c => col(c).as(s"s_$c")): _*)
      val hops = F.hopsScoreHex(col("t_naics_num"), col("s_naics_num"))
      t.join(s, col("t_c_nationkey") === col("s_c_nationkey") &&
          col("s_c_custkey") =!= col("t_c_custkey"))
        .select(col("t_c_custkey").as("prospect"), col("s_c_custkey").as("src_custkey"),
          round(hops, 6).as("score"))
    }
    // blend with havs only
    time("pairsHavs") {
      val n = spark.sessionState.conf.numShufflePartitions
      val t = g.select(g.columns.toSeq.map(c => col(c).as(s"t_$c")): _*)
        .filter(col("t_c_custkey") % 7 === 0).repartition(n)
      val s = g.select(g.columns.toSeq.map(c => col(c).as(s"s_$c")): _*)
      val havs = F.haversineScore(col("t_lat"), col("t_lon"), col("s_lat"), col("s_lon"))
      t.join(s, col("t_c_nationkey") === col("s_c_nationkey") &&
          col("s_c_custkey") =!= col("t_c_custkey"))
        .select(col("t_c_custkey").as("prospect"), col("s_c_custkey").as("src_custkey"),
          round(havs, 6).as("score"))
    }
    time("peers")(Reports.peers(spark, dir))
    time("ratedUsage")(Reports.ratedUsage(spark, dir))
    time("q13 full")(Reports.confidence(spark, dir))
    spark.stop()
  }
}
