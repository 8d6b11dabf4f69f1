package graft.queries

import org.apache.spark.sql.SparkSession

/** Dev harness: print scan/exchange counts and the formatted plan of
  * one registered query (`args: <name> [sfDir]`).
  */
object ProfilePlan {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q109_training_prep")
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.collect()
    // AQE toString prints the final plan FOLLOWED by the initial plan —
    // count nodes only in the executed section.
    val full = df.queryExecution.executedPlan.toString
    val plan = full.split("\\+- == Initial Plan ==")(0)
    println(s"[plan] scans=${"Scan parquet".r.findAllIn(plan).size}" +
      s" shuffles=${"Exchange (hash|range|Single|RoundRobin)".r.findAllIn(plan).size}" +
      s" broadcasts=${"BroadcastExchange".r.findAllIn(plan).size}" +
      s" reused=${"ReusedExchange".r.findAllIn(plan).size}")
    if (sys.env.contains("SPARK_GRAFT_FULL_PLAN")) println(full)
    spark.stop()
  }
}
