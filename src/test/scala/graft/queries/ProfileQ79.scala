package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.{DedupOps, TextOps}
import graft.ops.Dedup

/** Dev-only phase profiler for the corpus pipeline (q79). */
object ProfileQ79 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$dir/documents.parquet").count()
    def time(name: String)(df: => DataFrame): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[profile] $name%-16s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }
    val docs = T(spark, dir, "documents")
    val toks = TextOps.tokenize(col("text"))
    def scored = docs.select(col("doc_id"), col("lang"), col("text"),
      size(toks).as("n_tokens"), TextOps.qualityScore(toks, Text.Stop).as("quality"))
    def kept1 = scored.filter(col("quality") >= 0.8)
    def kept2 = Dedup.firstPerKey(kept1.withColumn("__fp", md5(col("text"))),
      Seq("__fp"), Seq(col("doc_id").asc)).drop("__fp")
    def shingled = kept2.select(col("doc_id"),
      TextOps.shingles(TextOps.tokenize(col("text")), 2).as("sh"))
    def strong = DedupOps.lshCandidates(shingled, "doc_id", "sh")
      .filter(col("jaccard") >= 0.5)
    time("kept1")(kept1)
    time("kept2")(kept2)
    time("strong")(strong)
    time("cc") {
      graft.ops.ConnectedComponents.labelPropagation(strong, "id_a", "id_b")
    }
    time("q79 full")(graft.flows.CorpusPipeline.run(docs,
      graft.flows.CorpusPipeline.Config(stop = Text.Stop)))
    spark.stop()
  }
}
