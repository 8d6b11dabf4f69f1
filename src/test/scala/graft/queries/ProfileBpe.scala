package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only A/B for the r16 BPE merge batching: classic one-merge-per-
  * round (batch=1) vs the creation-ceiling batched loop (batch=64) on
  * the sf0.1 corpus vocabulary, at a vocab-scale step count. Both runs
  * produce bit-identical rules (spec-pinned); this measures the
  * job-count dividend and the realized mean batch size.
  */
object ProfileBpe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val steps = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val words = T(spark, dir, "documents")
      .select(explode(graft.llm.TextOps.tokenize(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt")).cache()
    println(s"[bpe] vocab=${words.count()}")
    for (batch <- Seq(1, 64, 1, 64)) { // alternate to cancel warm-up bias
      val t0 = System.nanoTime()
      val rules = graft.llm.Bpe.learnMerges(words, "w", "cnt", steps, batch)
        .collect()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[bpe] batch=$batch%-3d steps=${rules.length} $dt%7.2f s")
    }
    spark.stop()
  }
}
