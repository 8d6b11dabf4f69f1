package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{functions => F}
import graft.engine.expressions.DotProduct
import graft.ops.{Dedup, Indexing, Scale}

/** Dev-only: isolate the expensive term in the flow's pair scoring. */
object Profile4 {
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
      println(f"[profile] $name%-38s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    import org.apache.spark.ml.feature.Imputer
    val raw = T(spark, dir, "customer")
      .filter(col("c_name").isNotNull && col("c_acctbal").isNotNull)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal").cast("double").as("acctbal"), col("c_mktsegment"))
    val imputed = new Imputer().setStrategy("median")
      .setInputCols(Array("acctbal")).setOutputCols(Array("acctbal_imp"))
      .fit(raw).transform(raw)
    val deduped = Dedup.firstPerKey(imputed, Seq("c_custkey"), Seq(col("c_name").asc))
    val n = spark.sessionState.conf.numShufflePartitions
    val indexed = Indexing.withRowIndex(deduped, "idx", Seq(col("c_custkey").asc))
      .repartition(n)
      .withColumn("batch", pmod(hash(col("c_custkey"), lit(100L)), lit(2)))
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

    val tgt = geo.select(geo.columns.toSeq.map(c => col(c).as(s"t_$c")): _*)
    val src = geo.select(geo.columns.toSeq.map(c => col(c).as(s"s_$c")): _*)
    def base = tgt.filter(col("t_batch") === 0)
      .join(src, col("t_c_nationkey") === col("s_c_nationkey") &&
        col("t_idx") =!= col("s_idx"))

    time("count pairs only")(base.count())
    time("dot only")(base.select(DotProduct.dot(col("t_unit"), col("s_unit")).as("x"))
      .agg(sum("x")).collect())
    time("dot scalar (f0*f0+f1*f1)")(base.select(
      (col("t_unit")(0) * col("s_unit")(0) + col("t_unit")(1) * col("s_unit")(1)).as("x"))
      .agg(sum("x")).collect())
    time("hops only")(base.select(F.hopsScore(col("t_naics"), col("s_naics")).as("x"))
      .agg(sum("x")).collect())
    time("havs only")(base.select(
      F.haversineScore(col("t_lat"), col("t_lon"), col("s_lat"), col("s_lon")).as("x"))
      .agg(sum("x")).collect())
    time("blend no filter")(base.select(round(F.blendedScore(
      DotProduct.dot(col("t_unit"), col("s_unit")),
      F.hopsScore(col("t_naics"), col("s_naics")),
      F.haversineScore(col("t_lat"), col("t_lon"), col("s_lat"), col("s_lon")),
      0.399, 0.001), 6).as("score")).agg(sum("score")).collect())
    time("blend + >=0 filter")(base.select(round(F.blendedScore(
      DotProduct.dot(col("t_unit"), col("s_unit")),
      F.hopsScore(col("t_naics"), col("s_naics")),
      F.haversineScore(col("t_lat"), col("t_lon"), col("s_lat"), col("s_lon")),
      0.399, 0.001), 6).as("score")).filter(col("score") >= 0.0)
      .agg(sum("score")).collect())
    spark.stop()
  }
}
