package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-only stage profiler for the confidence report (q13). */
object ProfileQ13 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val m = i.taskMetrics
        if (m.executorRunTime > 300)
          stages.add(f"[stage] id=${i.stageId}%3d tasks=${i.numTasks}%3d " +
            f"time=${m.executorRunTime / 1000.0}%6.1fs cpu=${m.executorCpuTime / 1e9}%6.1fs " +
            f"gc=${m.jvmGCTime / 1000.0}%4.1fs " +
            f"sR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%6.1fMB " +
            f"sW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%6.1fMB " +
            f"spill=${m.diskBytesSpilled / 1e6}%5.1fMB")
      }
    })
    spark.read.parquet(s"$dir/lineitem.parquet").groupBy("l_returnflag").count().collect()
    def time(name: String)(df: => DataFrame): Unit = {
      spark.catalog.clearCache()
      stages.clear()
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[profile] $name%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
      stages.forEach(s => println(s))
    }
    time("q13 warmup")(Reports.confidence(spark, dir))
    time("q13 #2")(Reports.confidence(spark, dir))
    time("q14 #1")(Reports.penetration(spark, dir))
    time("q14 #2")(Reports.penetration(spark, dir))
    spark.stop()
  }
}
