package graft.queries

import org.apache.spark.ml.feature.Imputer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{functions => F}
import graft.engine.expressions.DotProduct
import graft.ops.{Dedup, Indexing, Scale, TopK}

/** Dev-only: stagewise timing of the PeerSearchFlow internals. */
object Profile3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$dir/lineitem.parquet").groupBy("l_returnflag").count().collect()
    DotProduct.register(spark)

    def time[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[profile] $name%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val minBatch = 2
    val seed = 100L
    val raw = T(spark, dir, "customer")
      .filter(col("c_name").isNotNull && col("c_acctbal").isNotNull)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal").cast("double").as("acctbal"), col("c_mktsegment"))
    val prospect = spark.range(1).select(
      lit(-1L).as("c_custkey"), lit("PROSPECT CO").as("c_name"),
      lit(0).cast("int").as("c_nationkey"),
      lit(null).cast("double").as("acctbal"), lit("BUILDING").as("c_mktsegment"))
    val unioned = raw.unionByName(prospect)

    val imputed = time("imputer fit+transform") {
      val m = new Imputer().setStrategy("median")
        .setInputCols(Array("acctbal")).setOutputCols(Array("acctbal_imp")).fit(unioned)
      m.transform(unioned)
    }
    val deduped = Dedup.firstPerKey(imputed, Seq("c_custkey"), Seq(col("c_name").asc))
    val n = spark.sessionState.conf.numShufflePartitions
    val indexed = Indexing.withRowIndex(deduped, "idx", Seq(col("c_custkey").asc))
      .repartition(n)
      .withColumn("batch", pmod(hash(col("c_custkey"), lit(seed)), lit(minBatch)))
    time("indexed count")(indexed.count())

    val scaled = Scale.minmax(
      Scale.minmax(indexed, "acctbal_imp", "f_bal"), "c_nationkey", "f_nat")
      .withColumn("features", array(col("f_bal") * 0.8, col("f_nat") * 0.2))
    val geo = scaled
      .withColumn("lat", when(col("c_custkey") % 23 === 0, lit(null).cast("double"))
        .otherwise(((col("c_custkey") * 13) % 160 - 80 + lit(0.25)).cast("double")))
      .withColumn("lon", ((col("c_custkey") * 31) % 340 - 170 + lit(0.5)).cast("double"))
      .withColumn("naics", concat(substring(md5(col("c_mktsegment")), 1, 3),
        substring(md5(col("c_nationkey").cast("string")), 1, 3)))
      .withColumn("nrm", sqrt(DotProduct.dot(col("features"), col("features"))))
      .withColumn("unit", when(col("nrm") === 0.0, col("features"))
        .otherwise(transform(col("features"), x => x / col("nrm"))))
    time("geo count")(geo.count())

    val tgt = geo.select(geo.columns.toSeq.map(c => col(c).as(s"t_$c")): _*)
    val src = geo.select(geo.columns.toSeq.map(c => col(c).as(s"s_$c")): _*)
    def pairs(b: Int) = tgt.filter(col("t_batch") === b)
      .join(src, col("t_c_nationkey") === col("s_c_nationkey") &&
        col("t_idx") =!= col("s_idx"))
      .select(col("t_c_custkey").as("tgt_custkey"), col("s_c_custkey").as("src_custkey"),
        round(F.blendedScore(
          DotProduct.dot(col("t_unit"), col("s_unit")),
          F.hopsScore(col("t_naics"), col("s_naics")),
          F.haversineScore(col("t_lat"), col("t_lon"), col("s_lat"), col("s_lon")),
          0.399, 0.001), 6).as("score"))
      .filter(col("score") >= 0.0)
    time("pairs(0) sum(score)")(pairs(0).agg(sum("score")).collect())
    val top0 = TopK.exactPerKey(pairs(0), Seq("tgt_custkey"),
      Seq(col("score").desc, col("src_custkey").asc), 15, "peer_rank", prepartition = true)
    time("top15(0) count")(top0.count())
    time("full flow count")(graft.flows.PeerSearchFlow.run(spark, dir,
      graft.flows.PeerSearchFlow.Config(minBatch = 2)).count())
    spark.stop()
  }
}
