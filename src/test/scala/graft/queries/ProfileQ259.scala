package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage split of q259's a-priori triple mining (guide §1:
  * find the expensive level before touching the operator).
  * Usage: Test/runMain graft.queries.ProfileQ259 [sfDir]
  */
object ProfileQ259 {
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
      println(f"[q259] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }

    val baskets = T(spark, dir, "lineitem")
      .join(T(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
    val b = baskets.select(col("c"), col("p")).distinct()
    val f1 = b.groupBy("p").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 3).select("p")
    val bf = b.join(f1, Seq("p"), "left_semi").localCheckpoint()
    time("bf")(bf)
    val pocc = graft.ops.Cooccur.groupPairs(bf, "c", "p")
    time("pair occurrences")(pocc)
    val f2 = pocc.groupBy("pa", "pb").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 3).select("pa", "pb").localCheckpoint()
    time("f2")(f2)
    val cand = f2.select(col("pa"), col("pb"))
      .join(f2.select(col("pa").as("pb"), col("pb").as("pc")), Seq("pb"))
      .join(f2.select(col("pa"), col("pb").as("pc")), Seq("pa", "pc"),
        "left_semi")
      .select("pa", "pb", "pc").localCheckpoint()
    time("candidates")(cand)
    val anchored = cand.join(bf.select(col("p").as("pa"), col("c")), Seq("pa"))
    time("anchor join (pa)")(anchored)
    val support = anchored
      .join(bf.select(col("p").as("pb"), col("c")), Seq("pb", "c"), "left_semi")
      .join(bf.select(col("p").as("pc"), col("c")), Seq("pc", "c"), "left_semi")
      .groupBy("pa", "pb", "pc").agg(count(lit(1)).as("support"))
      .filter(col("support") >= 3)
    time("triple support")(support)
    spark.stop()
  }
}
