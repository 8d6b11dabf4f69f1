package graft.queries

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.{SetSimJoin, TextOps}

/** Dev-only harness for the round-10 xxhash64-exchange change in the
  * exact set-similarity family: measures TOTAL SHUFFLE BYTES (write
  * side, summed over stages) and wall time of the q139 prefix-filter
  * join at x1/x2/x4 documents, for
  *   (a) the shipped 8-byte hashed-element exchange
  *       ([[SetSimJoin.prefixFilterJoin]]), and
  *   (b) an inline replica of the pre-round-10 raw-string exchange
  *       (the old prefixFilterJoin body, kept here as the baseline).
  * Bytes-on-the-wire is the claim being verified, so the listener sums
  * `shuffleWriteMetrics.bytesWritten` — runtime is reported for
  * context but the exchange volume is the gated number.
  */
object ProfileSetSim {

  /** Pre-round-10 body: identical pipeline, raw string elements. */
  def stringPathJoin(sets: DataFrame, idCol: String, setCol: String,
                     tau: Double): DataFrame = {
    val distinctSets = sets
      .select(col(idCol), array_distinct(col(setCol)).as("__s"))
      .filter(size(col("__s")) > 0)
    val ex = distinctSets.select(col(idCol), explode(col("__s")).as("__g"))
    val dfreq = ex.groupBy("__g").agg(count(lit(1)).as("__df"))
    val ordered = ex.join(dfreq, "__g")
      .groupBy(idCol)
      .agg(array_sort(collect_list(struct(col("__df"), col("__g")))).as("__sw"))
      .select(col(idCol),
        transform(col("__sw"), x => x.getField("__g")).as("__s"),
        size(col("__sw")).as("__n"))
    val prefLen = (col("__n") - ceil(col("__n") * lit(tau)).cast("int") + 1)
    val pref = ordered.select(col(idCol),
      explode(slice(col("__s"), lit(1), prefLen)).as("__g"))
    val candA = pref.select(col(idCol).as("a_doc"), col("__g"))
    val candB = pref.select(col(idCol).as("b_doc"), col("__g"))
    val cand = candA.join(candB, Seq("__g"))
      .filter(col("a_doc") < col("b_doc"))
      .select("a_doc", "b_doc").distinct()
    val aSets = ordered.select(col(idCol).as("a_doc"), col("__s").as("__sa"))
    val bSets = ordered.select(col(idCol).as("b_doc"), col("__s").as("__sb"))
    val inter = size(array_intersect(col("__sa"), col("__sb")))
    val union = size(array_union(col("__sa"), col("__sb")))
    cand.join(aSets, Seq("a_doc")).join(bSets, Seq("b_doc"))
      .select(col("a_doc"), col("b_doc"),
        (inter.cast("double") / union).as("jaccard"))
      .filter(col("jaccard") >= tau)
  }

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
      .filter { case (m, d) =>
        m == 1 || java.nio.file.Files.exists(java.nio.file.Paths.get(s"$d/documents.parquet"))
      }
    for ((mult, dir) <- dirs) {
      val sets = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"),
        TextOps.ngramsAll(TextOps.tokenize(col("text")), 3).as("s"))
      for ((label, fn) <- Seq(
          "hashed" -> (() => SetSimJoin.prefixFilterJoin(sets, "doc_id", "s", 0.5)),
          "string" -> (() => stringPathJoin(sets, "doc_id", "s", 0.5)))) {
        def once(): (Double, Long, Long) = {
          spark.catalog.clearCache()
          // settle async stage-completion events from the previous run
          // (the listener bus drains asynchronously; dev-only harness)
          Thread.sleep(1000)
          shuffleBytes.set(0L)
          val t0 = System.nanoTime()
          val n = fn().count()
          val t = (System.nanoTime() - t0) / 1e9
          Thread.sleep(1000)
          (t, shuffleBytes.get(), n)
        }
        val (t1, b1, n1) = once()
        val (t2, b2, n2) = once()
        require(n1 == n2, s"pair counts differ across runs: $n1 vs $n2")
        println(f"[setsim] x$mult%-2d $label%-7s pairs=$n1%-6d " +
          f"shuffleMB=${math.min(b1, b2) / 1e6}%9.1f  sec=${math.min(t1, t2)}%6.2f")
      }
    }
    spark.stop()
  }
}
