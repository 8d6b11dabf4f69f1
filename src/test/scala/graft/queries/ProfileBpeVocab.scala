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
    val sf = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // vocabulary A — adversarial shared-alphabet: md5-derived hex
    // letters (16-symbol alphabet, 3 positional sub-alphabets), Zipf
    // counts. Dense symbol sharing keeps realized batches NARROW —
    // this is the lower-bound measurement.
    val hexWords = spark.range(20000).select(
      concat_ws("", (0 until 8).map(j =>
        substring(md5(concat(col("id"), lit(s":$j"))), 1 + (j % 3), 1)): _*)
        .as("w"),
      (lit(200000L) / (col("id") + 1) + 1L).cast("long").as("cnt"))
      .groupBy("w").agg(sum("cnt").as("cnt"))
    // vocabulary B — documents-table-derived (r17 verdict item 5): the
    // corpus's real words compounded 3-at-a-time by deterministic md5
    // draws, so the character distribution IS the corpus's (a-z
    // letters, English digraph structure, 9-18 char compounds — the
    // shape a real pre-split tokenizer trains on), Zipf counts. Richer
    // alphabets carry more symbol-disjoint merge families per round,
    // so this measures the REALISTIC batch width.
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("w")).collect().map(_.getString(0))
    val wArr = array(corpus.map(lit): _*)
    def pick(salt: String) = element_at(wArr,
      (pmod(conv(substring(md5(concat(col("id"), lit(salt))), 1, 7), 16, 10)
        .cast("long"), lit(corpus.length.toLong)) + 1).cast("int"))
    val docWords = spark.range(20000).select(
      concat(pick(":a"), pick(":b"), pick(":c")).as("w"),
      (lit(200000L) / (col("id") + 1) + 1L).cast("long").as("cnt"))
      .groupBy("w").agg(sum("cnt").as("cnt"))
    for ((tag, words0) <- Seq("hex-adversarial" -> hexWords,
                              "docs-compound" -> docWords)) {
      val words = words0.cache()
      println(s"[bpev] $tag vocab=${words.count()}")
      for (batch <- Seq(64, 1)) {
        val t0 = System.nanoTime()
        val n = graft.llm.Bpe.learnMerges(words, "w", "cnt", steps, batch).count()
        val rounds = graft.llm.Bpe.lastRounds.get()
        println(f"[bpev] $tag batch=$batch%-3d rules=$n rounds=$rounds " +
          f"meanWidth=${n.toDouble / rounds}%.2f ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
      words.unpersist()
    }
    spark.stop()
  }
}
