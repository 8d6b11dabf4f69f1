package graft.queries

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage-level profile of q217's alternatingStar loop (guide
  * §1: decide whether round time is shuffle, compute, or per-job fixed
  * overhead before touching the operator). Replays the op's exact loop
  * inline with per-round wall times and a stage listener that sums
  * task time vs wall, so scheduling/codegen overhead is visible as the
  * gap. Usage: runMain graft.queries.ProfileQ217 [sfDir]
  */
object ProfileQ217 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var stageCount = 0
    @volatile var taskTimeMs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stageCount += 1
        taskTimeMs += sc.stageInfo.taskMetrics.executorRunTime
      }
    })

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c").orderBy(col("d"), col("k"))
    val edges = T(spark, dir, "orders")
      .select(col("o_custkey").as("c"), col("o_orderkey").as("k"),
        col("o_orderdate").as("d"))
      .withColumn("nk", lead(col("k"), 1).over(w))
      .filter(col("nk").isNotNull)
      .select(col("k").as("s"), col("nk").as("t"))
      .localCheckpoint()
    println(s"[profile] edges: ${edges.count()}")

    // ---- replicate alternatingStar inline with per-round timing ----
    import graft.ops.Checkpoints.TruncateOps
    import org.apache.spark.sql.expressions.Window.{partitionBy => winBy}
    def largeStar(in: DataFrame): DataFrame =
      in.union(in.select(col("b").as("a"), col("a").as("b")))
        .withColumn("mn",
          least(min(col("b")).over(winBy("a")), col("a")))
        .filter(col("b") > col("a"))
        .select(col("b").as("a"), col("mn").as("b"))
        .filter(col("a") =!= col("b"))
    def smallStar(in: DataFrame): DataFrame =
      in.select(greatest(col("a"), col("b")).as("u"),
          least(col("a"), col("b")).as("v"))
        .withColumn("m", min(col("v")).over(winBy("u")))
        .select(explode(array(
          struct(col("v").as("a"), col("m").as("b")),
          struct(col("u").as("a"), col("m").as("b")))).as("__e"))
        .select(col("__e.a").as("a"), col("__e.b").as("b"))
        .filter(col("a") =!= col("b")).distinct()

    def codegenCompiles(): Long =
      org.apache.spark.metrics.source.CodegenMetrics.METRIC_SOURCE_CODE_SIZE.getCount

    // Variant A: the production loop as-is (agg-action witness)
    def runA(rep: Int): Unit = {
      var e = edges.select(col("s").cast("long").as("a"),
          col("t").cast("long").as("b"))
        .filter(col("a") =!= col("b")).distinct()
      var prev = Option.empty[(Long, Long, Long)]
      var converged = false
      var i = 0
      val tAll = System.nanoTime()
      while (!converged && i < 50) {
        stageCount = 0; taskTimeMs = 0L
        val cg0 = codegenCompiles()
        val t0 = System.nanoTime()
        val next = smallStar(largeStar(e)).truncated
        val wv = next.agg(count(lit(1)), sum(col("a")), sum(col("b"))).head
        val witness = (wv.getLong(0),
          if (wv.isNullAt(1)) 0L else wv.getLong(1),
          if (wv.isNullAt(2)) 0L else wv.getLong(2))
        converged = prev.contains(witness)
        prev = Some(witness)
        e = next
        i += 1
        println(f"[profile] A rep$rep round$i%2d  wall=${(System.nanoTime() - t0) / 1e9}%6.2f s" +
          f"  stages=$stageCount%3d  taskTime=${taskTimeMs / 1e3}%7.2f s" +
          f"  codegen=${codegenCompiles() - cg0}%3d  rows=${witness._1}")
      }
      println(f"[profile] A rep$rep TOTAL ${(System.nanoTime() - tAll) / 1e9}%6.2f s  rounds=$i")
    }

    // Variant F: witness via observe() fused into the eager checkpoint
    def runF(rep: Int): Unit = {
      var e = edges.select(col("s").cast("long").as("a"),
          col("t").cast("long").as("b"))
        .filter(col("a") =!= col("b")).distinct()
      var prev = Option.empty[(Long, Long, Long)]
      var converged = false
      var i = 0
      val tAll = System.nanoTime()
      while (!converged && i < 50) {
        stageCount = 0; taskTimeMs = 0L
        val t0 = System.nanoTime()
        val obs = org.apache.spark.sql.Observation()
        val next = smallStar(largeStar(e))
          .observe(obs, count(lit(1)).as("n"), sum(col("a")).as("sa"),
            sum(col("b")).as("sb"))
          .localCheckpoint()   // eager: the one action of the round
        val m = obs.get
        val witness = (m("n").asInstanceOf[Long],
          Option(m("sa")).map(_.asInstanceOf[Long]).getOrElse(0L),
          Option(m("sb")).map(_.asInstanceOf[Long]).getOrElse(0L))
        converged = prev.contains(witness)
        prev = Some(witness)
        e = next
        i += 1
        println(f"[profile] F rep$rep round$i%2d  wall=${(System.nanoTime() - t0) / 1e9}%6.2f s" +
          f"  stages=$stageCount%3d  taskTime=${taskTimeMs / 1e3}%7.2f s  rows=${witness._1}")
      }
      println(f"[profile] F rep$rep TOTAL ${(System.nanoTime() - tAll) / 1e9}%6.2f s  rounds=$i")
    }

    runA(1); runF(1); runA(2); runF(2)
    spark.stop()
  }
}
