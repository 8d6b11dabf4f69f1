package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interpolated Kneser–Ney bigram language model — the n-gram smoothing
  * production corpora are actually filtered with (KenLM's default; the
  * CCNet perplexity gate): absolute discounting of seen bigrams plus a
  * CONTINUATION-probability backoff, which scores a word by how many
  * distinct contexts it follows rather than how often it occurs — the
  * fix for add-k's overestimate of frequent-but-context-bound words
  * ("Francisco" is frequent yet only ever follows "San").
  *
  *   P(w2|w1) = max(c(w1 w2) − d, 0) / c(w1·)
  *              + d · N1+(w1 ·)/c(w1·) · Pcont(w2)
  *   Pcont(w2) = (N1+(· w2) + ε) / (N1+(· ·) + ε·V)
  *
  * with d = 0.75, ε = 0.5 (the ε floor keeps held-out words finite —
  * pure KN assigns zero to a word never seen in training; the same
  * add-constant discipline as the q123 add-k model). An UNSEEN history
  * falls back to Pcont alone. Every input to the formula is an integer
  * count, so an external engine replays the exact doubles (q221).
  *
  * Scale shape: three gram-keyed aggregations over the TRAIN corpus
  * (bigram counts, per-history totals, per-continuation type counts —
  * all partial-aggregated 8-byte-ish keys), two scalar broadcasts
  * (type total, vocabulary), then one join of the EVAL bigrams against
  * those vocabulary-scale stats. No all-pairs, no driver data path;
  * per-doc NLL sums are ordered folds (the q120/q123 float contract).
  */
object LanguageModel {

  val Discount = 0.75
  val Eps = 0.5

  /** Per-document held-out average negative log-likelihood of `score`
    * under a KN bigram model trained on `train`:
    * (doc_id, n_bigrams, avg_nll). Documents with < 2 tokens have no
    * bigrams and are absent. Lower avg_nll = more in-distribution —
    * threshold or ntile it for the CCNet-style head/middle/tail split.
    */
  def knBigramNll(train: DataFrame, score: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    def bigrams(df: DataFrame, withId: Boolean): DataFrame = {
      val base = df.select(
        (if (withId) Seq(col(idCol).as("doc_id")) else Seq.empty) :+
          explode(TextOps.ngramsAll(TextOps.tokenize(col(textCol)), 2)).as("g"): _*)
      base.withColumn("w1", substring_index(col("g"), " ", 1))
        .withColumn("w2", substring_index(col("g"), " ", -1))
    }
    val trb = bigrams(train, withId = false)
    val c2 = trb.groupBy("w1", "w2").agg(count(lit(1)).as("c")).cache()
    val hist = c2.groupBy("w1")
      .agg(sum(col("c")).as("ch"), count(lit(1)).as("n1f"))
    val cont = c2.groupBy("w2").agg(count(lit(1)).as("n1b"))
    val tot = c2.agg(count(lit(1)).as("tt"))
    val voc = train.select(explode(TextOps.tokenize(col(textCol))).as("w"))
      .agg(countDistinct(col("w")).as("v"))

    val evb = bigrams(score, withId = true)
    val pcont = (coalesce(col("n1b"), lit(0L)) + lit(Eps)) /
      (col("tt") + lit(Eps) * col("v"))
    val seen = greatest(coalesce(col("c"), lit(0L)) - lit(Discount), lit(0.0)) / col("ch") +
      lit(Discount) * col("n1f") / col("ch") * pcont
    val lp = evb
      .join(c2, Seq("w1", "w2"), "left")
      .join(hist, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(tot)).crossJoin(broadcast(voc))
      .select(col("doc_id"), col("g"),
        log(when(col("ch").isNull, pcont).otherwise(seen)).as("logp"))
    lp.select(col("doc_id"), struct(col("g"), col("logp").as("v")).as("e"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        array_sort(collect_list(col("e"))).as("__s"))
      .select(col("doc_id"), col("n_bigrams"),
        round(-orderedSum(col("__s"), "v") / col("n_bigrams"), 6).as("avg_nll"))
  }

  /** Sequential left fold of `structs[i].field` (the shared ordered-sum
    * shape; addition order fixed by the array order).
    */
  private def orderedSum(structs: Column, field: String): Column =
    aggregate(slice(structs, lit(2), size(structs) - 1),
      element_at(structs, 1).getField(field),
      (acc, v) => acc + v.getField(field))
}
