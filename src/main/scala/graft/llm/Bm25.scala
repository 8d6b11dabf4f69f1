package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval over a tokenized document corpus.
  *
  * Scale design: one narrow aggregation computes the corpus statistics
  * (N, avgdl, per-term document frequencies) into a SINGLE tiny row that
  * broadcast-crossJoins back onto the scoring scan — the 100 TB corpus
  * is read in two column-pruned passes and never shuffled; the final
  * top-k is a `TakeOrderedAndProject` (per-partition heap + driver
  * merge), not a global sort.
  *
  * Floating-point contract for oracle parity: per-term contributions are
  * summed in the caller-given term order, the length norm is computed
  * once as `k1 * (1 - b + b * dl/avgdl)`, and only the final score is
  * rounded — the whole chain is IEEE-identical when replayed in SQL.
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75

  /** Per-document BM25 score for `terms`, plus the tf/dl columns the
    * score derives from. Input must provide `idCol` and an array-of-
    * string `tokensCol`.
    */
  def score(docs: DataFrame, idCol: String, tokensCol: String,
            terms: Seq[String], k1: Double = K1, b: Double = B): DataFrame = {
    val base = docs.select(col(idCol), col(tokensCol).as("__toks"))
      .withColumn("__dl", size(col("__toks")))
    val withTf = terms.zipWithIndex.foldLeft(base) { case (df, (t, i)) =>
      df.withColumn(s"__tf$i", size(filter(col("__toks"), x => x === t)))
    }.drop("__toks")
    // Corpus stats: one row — N, avgdl, df per term. Broadcast, not
    // collected: the stats stay a plan subtree (reusable, AQE-visible).
    val statAggs = count(lit(1)).as("__n") +: avg(col("__dl")).as("__avgdl") +:
      terms.indices.map(i =>
        sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).as(s"__df$i"))
    val stats = withTf.agg(statAggs.head, statAggs.tail: _*)
    val scored = withTf.crossJoin(broadcast(stats))
    val norm = lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("__dl") / col("__avgdl"))
    val contribs = terms.indices.map { i =>
      val tf = col(s"__tf$i")
      val idf = log(lit(1.0) + (col("__n") - col(s"__df$i") + lit(0.5)) / (col(s"__df$i") + lit(0.5)))
      idf * (tf * lit(k1 + 1.0)) / (tf + norm)
    }
    scored.withColumn("__score", contribs.reduce(_ + _))
      .select(col(idCol), col("__dl").as("dl"), col("__score").as("score"))
  }

  /** Top-k retrieval: BM25-score and keep the k best (rounded-score
    * order, id tiebreak). The limit plans as TakeOrderedAndProject —
    * no global sort of the corpus.
    */
  def topK(docs: DataFrame, idCol: String, tokensCol: String,
           terms: Seq[String], k: Int): DataFrame = {
    val s = score(docs, idCol, tokensCol, terms)
      .withColumn("score", round(col("score"), 6))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
    import org.apache.spark.sql.expressions.Window
    // The unpartitioned window here ranks the ALREADY-limited k rows
    // (k ≈ 10s), not the corpus — bounded by k, not data size, so the
    // single-partition WindowExec is harmless at any scale.
    s.withColumn("rnk",
      row_number().over(Window.orderBy(col("score").desc, col(idCol).asc)).cast("int"))
  }
}
