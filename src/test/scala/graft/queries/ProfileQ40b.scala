package graft.queries

import org.apache.spark.ml.recommendation.ALS
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.rec.AlsPipeline

/** ALS fit-knob experiment (dev-only): numBlocks × storage levels. */
object ProfileQ40b {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val usage = T(spark, dir, "orders")
      .join(T(spark, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(T(spark, dir, "part")), col("l_partkey") === col("p_partkey"))
      .groupBy(col("o_custkey").as("cust"), col("p_brand").as("item"))
      .agg(sum(col("l_quantity")).as("intensity"))
    val rated = AlsPipeline.accumulate(usage, "cust", "item", "intensity")
    val triples = AlsPipeline.indexedTriples(rated, "cust", "item").cache()
    println(s"[exp] triples = ${triples.count()}")

    def fit(blocks: Int, storage: String): Unit = {
      // 2 repetitions, report both
      val ts = (1 to 2).map { _ =>
        spark.sparkContext.setCheckpointDir(null)
        val als = new ALS()
          .setRank(15).setMaxIter(5).setRegParam(0.001)
          .setImplicitPrefs(true).setNonnegative(true)
          .setColdStartStrategy("drop").setSeed(0L)
          .setNumUserBlocks(blocks).setNumItemBlocks(blocks)
          .setIntermediateStorageLevel(storage)
          .setUserCol("userId").setItemCol("itemId").setRatingCol("rating")
        val t0 = System.nanoTime()
        val m = als.fit(triples)
        m.userFactors.count(); m.itemFactors.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[exp] blocks=$blocks%2d storage=$storage%-16s ${ts.map(t => f"$t%.2f").mkString(" / ")}s")
    }
    fit(8, "MEMORY_AND_DISK")   // current config
    fit(8, "MEMORY_ONLY")
    fit(4, "MEMORY_ONLY")
    fit(16, "MEMORY_ONLY")
    fit(2, "MEMORY_ONLY")
    spark.stop()
  }
}
