package graft.queries

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.SparseSim

/** Dev-only harness for the round-11 SparseSim fast path: wall time and
  * total shuffle-write bytes of the IDF-cosine join at x1/x2/x4
  * documents for
  *   (a) the plain-sum fast path (exactFold = false — partial
  *       aggregation, production), and
  *   (b) the ordered-fold oracle path (exactFold = true — what q120
  *       ships for hash parity with DuckDB's list_reduce).
  * The claim being verified: the fold is PURE oracle tax — the fast
  * path returns the same pair set measurably cheaper, and the gap
  * widens with scale (per-group arrays grow with posting length).
  * Scaled inputs reuse ProfileScaling's copy-unique-vocabulary
  * documents (built on demand).
  */
object ProfileSparseSim {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    val dirs = Seq(1 -> src, 2 -> "/tmp/graft_scale_x2", 4 -> "/tmp/graft_scale_x4")
    dirs.drop(1).foreach { case (m, d) =>
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$d/documents.parquet"))) {
        println(s"[sparsesim] building x$m documents at $d")
        ProfileScaling.buildScaledDocs(spark, src, d, m)
      }
    }

    import Retrieval.{SimGramN, SimMaxDf, SimMinSim}
    for ((mult, dir) <- dirs) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      for ((label, fold) <- Seq("fast" -> false, "fold" -> true)) {
        def once(): (Double, Long, Long) = {
          spark.catalog.clearCache()
          Thread.sleep(1000) // settle async stage-completion events
          shuffleBytes.set(0L)
          val t0 = System.nanoTime()
          val n = SparseSim.idfCosineJoin(docs, "doc_id", "text",
            SimGramN, SimMaxDf, SimMinSim, exactFold = fold).count()
          val t = (System.nanoTime() - t0) / 1e9
          Thread.sleep(1000)
          (t, shuffleBytes.get(), n)
        }
        val (t1, b1, n1) = once()
        val (t2, b2, n2) = once()
        require(n1 == n2, s"pair counts differ across runs: $n1 vs $n2")
        println(f"[sparsesim] x$mult%-2d $label%-5s pairs=$n1%-7d " +
          f"shuffleMB=${math.min(b1, b2) / 1e6}%9.1f  sec=${math.min(t1, t2)}%6.2f")
      }
    }
    spark.stop()
  }
}
