package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-only stage profiler: times named sub-plans of the report pipeline
  * so optimization targets are measured, not guessed. Usage:
  *   SPARK_GRAFT_CPUS=32 runMain graft.queries.Profile <sfDir>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm-up
    spark.read.parquet(s"$dir/lineitem.parquet").groupBy("l_returnflag").count().collect()

    def time(name: String)(df: => DataFrame): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }

    time("customerGeo")(Reports.customerGeo(spark, dir))
    time("peerPairs")(Reports.peerPairs(spark, dir))
    time("peers(top30)")(Reports.peers(spark, dir))
    time("ratedUsage")(Reports.ratedUsage(spark, dir))
    time("q13_confidence")(Reports.confidence(spark, dir))
    time("q14_penetration")(Reports.penetration(spark, dir))
    time("q22_peer_search")(graft.SparkEntry.queries("q22_peer_search")(spark, dir))
    time("q44_flow")(graft.SparkEntry.queries("q44_peer_search_flow")(spark, dir))
    spark.stop()
  }
}
