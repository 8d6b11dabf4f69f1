package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: BPE batching dividend at a TOKENIZER-REAL vocabulary.
  * The sf corpus has only ~31 distinct words, which bounds the mean
  * batch size; this builds a deterministic 20k-word Zipf vocabulary
  * (multi-"alphabet" words so rounds carry many symbol-disjoint
  * families) and measures batch=1 vs batch=64 at a training-scale
  * step count — the realized mean batch size IS the job-count
  * dividend a 32k-merge run would see.
  */
object ProfileBpeVocab {
  def main(args: Array[String]): Unit = {
    val steps = args.headOption.map(_.toInt).getOrElse(256)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // deterministic pseudo-words: md5-derived letters, Zipf counts
    val words = spark.range(20000).select(
      concat_ws("", (0 until 8).map(j =>
        substring(md5(concat(col("id"), lit(s":$j"))), 1 + (j % 3), 1)): _*)
        .as("w"),
      (lit(200000L) / (col("id") + 1) + 1L).cast("long").as("cnt"))
      .groupBy("w").agg(sum("cnt").as("cnt")).cache()
    println(s"[bpev] vocab=${words.count()}")
    for (batch <- Seq(64, 1)) {
      val t0 = System.nanoTime()
      val n = graft.llm.Bpe.learnMerges(words, "w", "cnt", steps, batch).count()
      val rounds = graft.llm.Bpe.lastRounds.get()
      println(f"[bpev] batch=$batch%-3d rules=$n rounds=$rounds " +
        f"meanWidth=${n.toDouble / rounds}%.2f ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    spark.stop()
  }
}
