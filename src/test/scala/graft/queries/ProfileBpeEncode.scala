package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only BPE ENCODE-path octaves (r18 verdict item 6): learnMerges
  * is honestly bounded (SCALE.md's 32k-merge single-node negative);
  * what a pipeline runs daily is `encodeWords` — tokenize the corpus,
  * aggregate to the word grain, run the learned merges over the VOCAB
  * and read the per-word token strings back. This measures that whole
  * daily path at x1 → x4 → x16 copy-unique-vocabulary corpora
  * (ProfileScaling.buildScaledDocs: each copy prefixes its tokens, so
  * vocabulary grows ×copies — the worst case for encode, whose loop
  * cost rides the vocab, not the raw token count).
  *
  * Cost model to verify: corpus tokenize+count is one linear scan
  * (input-linear); the merge loop is rounds × vocab-linear passes with
  * counts irrelevant — so x16 docs with x16 vocab should scale the
  * whole path ~linearly, and the per-occurrence cost FALLS as corpus
  * grows denser per word.
  */
object ProfileBpeEncode {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val steps = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (copies <- Seq(1, 4, 16)) {
      val dst = s"/tmp/bpe_scaled_x$copies"
      ProfileScaling.buildScaledDocs(spark, src, dst, copies)
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val words = T(spark, dst, "documents")
        .select(explode(graft.llm.TextOps.tokenize(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("cnt"))
      val enc = graft.llm.Bpe.encodeWords(words, "w", "cnt", steps)
      val row = enc.agg(count(lit(1)).as("vocab"),
        sum(col("cnt") * col("n_bpe_tokens")).as("occ_tokens")).head()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[bpe-encode] x$copies%-3d steps=$steps vocab=${row.getLong(0)}%-8d " +
        f"occTokens=${row.getLong(1)}%-10d $dt%7.2f s")
    }
    spark.stop()
  }
}
