package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dense-retrieval baseline in HASHED-BAG space (the hashing trick,
  * Weinberger, Dasgupta, Langford, Smola & Attenberg, ICML 2009):
  * documents and the query embed as `dims`-bucket token-count vectors
  * via the engine's md5 recipe, ranked by cosine to the query vector.
  * Deliberately a different retrieval family than [[Bm25]] (geometry
  * over a fixed-dimension embedding — the shape an ANN index serves —
  * vs per-term probabilistic weighting) so the two lists genuinely
  * disagree and reciprocal-rank fusion ([[Fusion.rrf]]) has something
  * to reconcile.
  *
  * EXACT integer fixed-point ranking, no float anywhere: count vectors
  * have dot ≥ 0, so cos² = dot²/(‖a‖²·‖q‖²) is monotone in cosine and
  * `score = (dot²·10⁶) div (‖a‖²·‖q‖²)` ranks identically to cosine at
  * 1e-6 resolution with pure integer ops — the ranked list replays in
  * SQL verbatim (q274), the property float cosines cannot give.
  *
  * Scale shape: one explode+groupBy builds the per-doc bucket counts
  * (map-side combined), the query vector is a ≤ dims-row broadcast,
  * norms and dots are per-doc aggregates — the corpus is never
  * shuffled wider than (id, bucket), and the top-k is a bounded
  * TakeOrderedAndProject + k-row window (the [[Bm25.topK]] pattern).
  */
object HashedCosine {

  /** md5 bucket of a token — `('0x' || substr(md5(t),1,15))::BIGINT %
    * dims` in the SQL twin.
    */
  private def bucket(t: Column, dims: Int): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long") % dims

  /** Top-k docs by hashed-bag cosine to the `terms` query: (idCol,
    * score, rnk) with score the integer fixed-point cos²·10⁶.
    */
  def topK(docs: DataFrame, idCol: String, tokensCol: String,
           terms: Seq[String], dims: Int, k: Int): DataFrame = {
    require(terms.nonEmpty, "hashed-cosine query needs at least one term")
    val hb = docs.select(col(idCol), explode(col(tokensCol)).as("__t"))
      .select(col(idCol), bucket(col("__t"), dims).as("__b"))
      .groupBy(col(idCol), col("__b")).agg(count(lit(1)).as("__a"))
    val qb = docs.sparkSession.range(1)
      .select(explode(array(terms.map(lit): _*)).as("__t"))
      .select(bucket(col("__t"), dims).as("__b"))
      .groupBy("__b").agg(count(lit(1)).as("__q"))
    val nq = qb.agg(sum(col("__q") * col("__q")).as("__nq"))
    val na = hb.groupBy(col(idCol)).agg(sum(col("__a") * col("__a")).as("__na"))
    val dp = hb.join(broadcast(qb), Seq("__b")).groupBy(col(idCol))
      .agg(sum(col("__a") * col("__q")).as("__dot"))
    // dot²·10⁶ and ‖a‖²·‖q‖² are carried in decimal(38,0): as BIGINT
    // products they wrap silently past 2⁶³ (a doc with ~3e6 query-term
    // hits), where DuckDB BIGINT errors — the q270/ops.Eval idiom.
    // Spark's decimal `div` is exact integral division (spot-proven
    // past 2^53); the SQL twin must use HUGEINT `//`, NOT decimal —
    // DuckDB degrades decimal `//` to double floor-division.
    val scored = na.join(dp, Seq(idCol), "left").crossJoin(broadcast(nq))
      .select(col(idCol),
        expr("""(cast(coalesce(__dot, 0) as decimal(38,0)) * coalesce(__dot, 0)
                 * 1000000) div (cast(__na as decimal(38,0)) * __nq)""")
          .as("score"))
    import org.apache.spark.sql.expressions.Window
    scored.orderBy(col("score").desc, col(idCol).asc).limit(k)
      .withColumn("rnk", row_number()
        .over(Window.orderBy(col("score").desc, col(idCol).asc)).cast("int"))
  }
}
