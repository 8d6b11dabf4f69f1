package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.{DedupOps, TextOps}

/** Dev-only phase profiler for the MinHash-LSH dedup query. */
object ProfileQ26 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$dir/documents.parquet").count()
    def time(name: String)(df: => DataFrame): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }
    def shingled = T(spark, dir, "documents").select(col("doc_id"),
      TextOps.shingles(TextOps.tokenize(col("text")), 2).as("sh"))
    time("shingled only")(shingled)
    time("shingled forced")(shingled.select(sum(size(col("sh"))).as("n")))
    time("tokenize forced")(T(spark, dir, "documents")
      .select(sum(size(TextOps.tokenize(col("text")))).as("n")))
    graft.engine.expressions.MinHashSignatures.register(spark)
    time("shingled+minhash8")(shingled.select(col("doc_id"),
      graft.engine.expressions.MinHashSignatures.minhashes(col("sh"), 8).as("mh")))
    graft.engine.expressions.MinHashBands.register(spark)
    def banded = shingled.select(col("doc_id"),
      posexplode(graft.engine.expressions.MinHashBands
        .bandSignatures(col("sh"), 4, 2)).as(Seq("band", "sig")))
    time("banded")(banded)
    time("cand") {
      val bd = banded.cache()
      bd.select(col("band"), col("sig"), col("doc_id").as("id_a"))
        .join(bd.select(col("band"), col("sig"), col("doc_id").as("id_b")),
          Seq("band", "sig"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
    }
    time("full lsh #1")(DedupOps.lshCandidates(shingled, "doc_id", "sh", 4, 2))
    time("full lsh #2")(DedupOps.lshCandidates(shingled, "doc_id", "sh", 4, 2))
    spark.stop()
  }
}
