package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: ratedUsage join-strategy experiments. */
object Profile2 {
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
    spark.read.parquet(s"$dir/lineitem.parquet").groupBy("l_returnflag").count().collect()

    def time(name: String)(df: => DataFrame): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[profile] $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }

    def usage = T(spark, dir, "orders")
      .join(T(spark, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .join(T(spark, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("o_custkey").as("cust"), col("p_brand"))
      .agg(sum(col("l_quantity")).as("intensity"))

    time("usage (default conf)")(usage)
    time("usage again (warm)")(usage)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
    time("usage bcast64m")(usage)
    time("usage bcast64m warm")(usage)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    println("--- plan default ---")
    usage.explain("formatted")
    spark.stop()
  }
}
