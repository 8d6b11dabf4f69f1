package graft.queries

import org.apache.spark.ml.feature.Imputer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{functions => F}
import graft.engine.expressions.DotProduct
import graft.ops.{Dedup, Indexing, Scale, TopK}

/** Dev-only phase profiler for the peer-search flow (q44). */
object ProfileQ44 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = (if (sys.env.contains("NO_COALESCE"))
      b.config("spark.sql.adaptive.coalescePartitions.enabled", "false")
    else if (sys.env.contains("MIN_PART"))
      b.config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env("MIN_PART"))
    else b).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val m = i.taskMetrics
        println(f"[stage] id=${i.stageId}%3d tasks=${i.numTasks}%3d " +
          f"time=${m.executorRunTime / 1000.0}%7.1fs cpu=${m.executorCpuTime / 1e9}%7.1fs " +
          f"gc=${m.jvmGCTime / 1000.0}%5.1fs " +
          f"sRead=${m.shuffleReadMetrics.totalBytesRead / 1e6}%7.1fMB " +
          f"sWrite=${m.shuffleWriteMetrics.bytesWritten / 1e6}%7.1fMB " +
          f"spill=${m.diskBytesSpilled / 1e6}%7.1fMB  ${i.name}")
      }
    })
    spark.read.parquet(s"$dir/customer.parquet").count()
    DotProduct.register(spark)
    def time(name: String)(df: => DataFrame): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[profile] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }
    def geo = {
      val raw = T(spark, dir, "customer")
        .filter(col("c_name").isNotNull && col("c_acctbal").isNotNull)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          col("c_acctbal").cast("double").as("acctbal"), col("c_mktsegment"))
      val prospect = spark.range(1).select(
        lit(-1L).as("c_custkey"), lit("PROSPECT CO").as("c_name"),
        lit(0).cast("int").as("c_nationkey"),
        lit(null).cast("double").as("acctbal"), lit("BUILDING").as("c_mktsegment"))
      val unioned = raw.unionByName(prospect)
      val imputed = new Imputer().setStrategy("median")
        .setInputCols(Array("acctbal")).setOutputCols(Array("acctbal_imp"))
        .fit(unioned).transform(unioned)
      val deduped = Dedup.firstPerKey(imputed, Seq("c_custkey"), Seq(col("c_name").asc))
      val indexed = Indexing.withRowIndex(deduped, "idx", Seq(col("c_custkey").asc))
        .repartition(32)
        .withColumn("batch", pmod(hash(col("c_custkey"), lit(100L)), lit(2)))
      val scaled = Scale.minmax(
        Scale.minmax(indexed, "acctbal_imp", "f_bal"), "c_nationkey", "f_nat")
        .withColumn("features", array(col("f_bal") * 0.8, col("f_nat") * 0.2))
      scaled
        .withColumn("lat", when(col("c_custkey") % 23 === 0, lit(null).cast("double"))
          .otherwise(((col("c_custkey") * 13) % 160 - 80 + lit(0.25)).cast("double")))
        .withColumn("lon", ((col("c_custkey") * 31) % 340 - 170 + lit(0.5)).cast("double"))
        .withColumn("naics", concat(substring(md5(col("c_mktsegment")), 1, 3),
          substring(md5(col("c_nationkey").cast("string")), 1, 3)))
        .withColumn("naics_num", F.hopsCode(col("naics")))
        .withColumn("nrm", sqrt(DotProduct.dot(col("features"), col("features"))))
        .withColumn("unit", when(col("nrm") === 0.0, col("features"))
          .otherwise(transform(col("features"), x => x / col("nrm"))))
    }
    time("geo")(geo)
    def pairs = {
      val g = geo
      val tgt = g.select(g.columns.toSeq.map(c => col(c).as(s"t_$c")): _*)
      val src = g.select(g.columns.toSeq.map(c => col(c).as(s"s_$c")): _*)
      tgt.join(src, col("t_c_nationkey") === col("s_c_nationkey") &&
          col("t_idx") =!= col("s_idx"))
        .select(col("t_c_custkey").as("tgt_custkey"), col("s_c_custkey").as("src_custkey"),
          round(F.blendedScore(
            DotProduct.dot(col("t_unit"), col("s_unit")),
            F.hopsScoreHex(col("t_naics_num"), col("s_naics_num")),
            F.haversineScore(col("t_lat"), col("t_lon"), col("s_lat"), col("s_lon")),
            0.399, 0.001), 6).as("score"))
    }
    time("pairs")(pairs)
    time("pairs+topk(pre)")(TopK.exactPerKey(pairs, Seq("tgt_custkey"),
      Seq(col("score").desc, col("src_custkey").asc), 15, "peer_rank",
      prepartition = true))
    time("pairs+topk(nopre)")(TopK.exactPerKey(pairs, Seq("tgt_custkey"),
      Seq(col("score").desc, col("src_custkey").asc), 15, "peer_rank",
      prepartition = false))
    time("pairs+repart only")(pairs.repartition(col("tgt_custkey")))
    def aggTop = pairs
      .groupBy("tgt_custkey")
      .agg(slice(sort_array(collect_list(struct((col("score") * -1).as("ns"),
        col("src_custkey").as("src")))), 1, 15).as("top"))
      .select(col("tgt_custkey"), posexplode(col("top")).as(Seq("rk", "s")))
      .select(col("tgt_custkey"), (col("s.ns") * -1).as("score"),
        col("s.src").as("src_custkey"), (col("rk") + 1).as("peer_rank"))
    time("pairs+aggTop")(aggTop)
    time("pairs+aggTop #2")(aggTop)
    TopK.exactPerKey(pairs, Seq("tgt_custkey"),
      Seq(col("score").desc, col("src_custkey").asc), 15, "peer_rank",
      prepartition = true).explain("formatted")
    time("q44 full")(graft.flows.PeerSearchFlow.run(spark, dir,
      graft.flows.PeerSearchFlow.Config(minBatch = 2)))
    spark.stop()
  }
}
