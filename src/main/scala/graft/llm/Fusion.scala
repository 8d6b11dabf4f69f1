package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval: combine the ranked lists of
  * heterogeneous scorers (BM25, TF-IDF, ANN cosine, …) without score
  * calibration — only RANKS cross the fusion boundary, so scorers with
  * incomparable score scales compose safely.
  */
object Fusion {

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009):
    * `rrf(d) = Σ_lists 1 / (c + rank_list(d))`, a document absent from
    * a list contributing 0. Each input is a ranked list
    * `(idCol, rankCol)`; lists are full-outer-joined on the id — the
    * join input is bounded by the lists' sizes (top-k per scorer),
    * never the corpus — and the fused top-k is a bounded sort.
    *
    * Float contract: per-list terms are summed in the caller-given list
    * order and only the fused score is rounded, so the result replays
    * bit-identically in a SQL twin (q134).
    */
  def rrf(rankings: Seq[DataFrame], idCol: String, rankCol: String,
          c: Int = 60, k: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrf needs at least one ranking")
    val renamed = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col(idCol), col(rankCol).as(s"__r$i"))
    }
    val joined = renamed.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score = rankings.indices
      .map(i => coalesce(lit(1.0) / (lit(c) + col(s"__r$i")), lit(0.0)))
      .reduce(_ + _)
    // the unpartitioned window ranks the ALREADY-limited k rows (the
    // Bm25.topK pattern) — bounded by k, not data
    joined.withColumn("rrf_score", round(score, 6))
      .orderBy(col("rrf_score").desc, col(idCol).asc).limit(k)
      .withColumn("rnk", row_number()
        .over(Window.orderBy(col("rrf_score").desc, col(idCol).asc)).cast("int"))
      .select(col(idCol), col("rrf_score"), col("rnk"))
  }
}
