package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.SimSearch

/** Dev-only stage profiler for q43 (ivfTopKLloyd): times the query at
  * iters = 0/1/2 plus the bare assignment pass, min-of-2 each, to
  * locate where the learned-centroid cost actually sits.
  */
object ProfileQ43 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def queries = emb.filter(col("vec_id") % 50 === 0)

    def time(label: String)(f: => Long): Unit = {
      def once(): Double = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[q43prof] $label%-18s ${math.min(once(), once())}%7.2f s")
    }

    // warm-up
    emb.groupBy("label").count().collect()

    time("iters=0 (ivfTopK)") {
      SimSearch.ivfTopK(emb, queries, "vec_id", "embedding", 10, 16, 4).count()
    }
    time("iters=1") {
      SimSearch.ivfTopKLloyd(emb, queries, "vec_id", "embedding", 10, 16, 4, iters = 1).count()
    }
    time("iters=2") {
      SimSearch.ivfTopKLloyd(emb, queries, "vec_id", "embedding", 10, 16, 4, iters = 2).count()
    }
    spark.stop()
  }
}
