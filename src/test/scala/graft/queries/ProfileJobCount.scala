package graft.queries

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only deterministic cost profile: runs named registered queries
  * once (count action, the bench protocol) and reports Spark JOBS,
  * STAGES, TASKS and summed task time per query. Job/stage/task counts
  * are a noise-free proxy for per-round action and pass structure —
  * the right evidence when host-level stalls make wall-clock A/B
  * unreliable (SCALE.md "Measurement noise").
  * Usage: Test/runMain graft.queries.ProfileJobCount <sfDir> <q> [q...]
  */
object ProfileJobCount {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).toSeq
    // measure the PRODUCTION plans, like Bench (q120/q226-style queries
    // otherwise run their slower oracle-exact twins here)
    sys.props("graft.bench.production") = "true"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      // match Bench: keep tiny-but-exploding stages wide under AQE
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        taskMs += s.stageInfo.taskMetrics.executorRunTime
      }
    })
    names.foreach { n =>
      for (rep <- 1 to 2) {
        jobs = 0; stages = 0; tasks = 0; taskMs = 0L
        val t0 = System.nanoTime()
        graft.GraftSession.withQueryCaches(spark) {
          graft.SparkEntry.queries(n)(spark, dir).count()
        }
        Thread.sleep(300) // let the async listener bus drain
        println(f"[jobcount] $n%-28s rep$rep wall=${(System.nanoTime() - t0) / 1e9}%7.2f s" +
          f"  jobs=$jobs%4d stages=$stages%4d tasks=$tasks%6d taskTime=${taskMs / 1e3}%8.2f s")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
