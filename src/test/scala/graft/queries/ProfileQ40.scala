package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.rec.AlsPipeline

/** Stage-level timing of q40 (ALS end-to-end) — local profiling only. */
object ProfileQ40 {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val usage = T(spark, dir, "orders")
      .join(T(spark, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(T(spark, dir, "part")), col("l_partkey") === col("p_partkey"))
      .groupBy(col("o_custkey").as("cust"), col("p_brand").as("item"))
      .agg(sum(col("l_quantity")).as("intensity"))
    val rated = AlsPipeline.accumulate(usage, "cust", "item", "intensity")
    time("usage agg count")(usage.count())
    time("rated count (cold cache)")(rated.count())
    val triples = time("triples build+count") {
      val t = AlsPipeline.indexedTriples(rated, "cust", "item")
      t.count()
      t
    }
    val model = time("ALS fit")(AlsPipeline.train(triples, AlsPipeline.Config()))
    time("factors materialize") {
      model.userFactors.count(); model.itemFactors.count()
    }
    time("recommendForAllUsers") {
      AlsPipeline.recommendations(model, 5).count()
    }
    time("full recs again") {
      AlsPipeline.recommendations(model, 5).count()
    }
    time("recommendationsDirect") {
      AlsPipeline.recommendationsDirect(model, 5).count()
    }
    time("direct again") {
      AlsPipeline.recommendationsDirect(model, 5).count()
    }
    spark.stop()
  }
}
