package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.{functions => F}
import graft.ops.TopK

/** Approximate-nearest-neighbor search over an embedding array column.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact — broadcast the (small) query set against
  *    the corpus, one distributed pass, per-query top-K via group-limit.
  *    Right answer whenever queries ≪ corpus (the common batch-inference
  *    shape); scales linearly in corpus size with no shuffle of the corpus.
  *  - [[ivfTopK]]: IVF-style — k-means-lite centroids (deterministic
  *    seeded sample), corpus bucketed by nearest centroid, queries probe
  *    only `nProbe` nearest buckets. Sub-linear scan cost at large n.
  */
object SimSearch {

  /** Exact top-K cosine neighbors per query. `queries` must be small
    * enough to broadcast (driver-checked at plan time by AQE thresholds).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     embCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("__q_emb"))
    val pairs = corpus.join(broadcast(q), col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol),
        round(F.cosineSimilarity(col("__q_emb"), col(embCol)), 6).as("cos_sim"))
    TopK.exactPerKey(pairs, Seq("query_id"),
      Seq(col("cos_sim").desc, col(idCol).asc), k, "rnk")
      .withColumn("rnk", col("rnk").cast("int"))
  }

  /** IVF-bucketed approximate top-K: assign every corpus vector to its
    * nearest of `nCentroids` centroids (chosen deterministically as the
    * first vectors under id order — a k-means seeding stand-in), then
    * scan only the query's `nProbe` nearest buckets.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              embCol: String, k: Int, nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    val cents = corpus.orderBy(col(idCol)).limit(nCentroids)
      .select(col(idCol).as("cent_id"), col(embCol).as("cent_emb"))

    def nearestBuckets(df: DataFrame, id: String, emb: String, n: Int, out: String) =
      TopK.exactPerKey(
        df.crossJoin(broadcast(cents))
          .select(col(id), col(emb),
            col("cent_id"), F.cosineSimilarity(col(emb), col("cent_emb")).as("__c")),
        Seq(id), Seq(col("__c").desc, col("cent_id").asc), n, "__cr")
        .select(col(id), col(emb), col("cent_id").as(out))

    val bucketed = nearestBuckets(corpus, idCol, embCol, 1, "bucket")
    val probed = nearestBuckets(
      queries.select(col(idCol).as("query_id"), col(embCol).as("__q_emb")),
      "query_id", "__q_emb", nProbe, "bucket")

    val pairs = probed.join(bucketed, Seq("bucket"))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol),
        round(F.cosineSimilarity(col("__q_emb"), col(embCol)), 6).as("cos_sim"))
    TopK.exactPerKey(pairs.dropDuplicates("query_id", idCol), Seq("query_id"),
      Seq(col("cos_sim").desc, col(idCol).asc), k, "rnk")
      .withColumn("rnk", col("rnk").cast("int"))
  }

  /** All pairs above a cosine threshold within a (filtered) corpus —
    * embedding near-dup detection. Quadratic in the filtered size; the
    * scale path is [[ivfTopK]]-style bucketing first.
    */
  def thresholdPairs(corpus: DataFrame, idCol: String, embCol: String,
                     minCos: Double): DataFrame = {
    val a = corpus.select(col(idCol).as("id_a"), col(embCol).as("emb_a"))
    val b = corpus.select(col(idCol).as("id_b"), col(embCol).as("emb_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(F.cosineSimilarity(col("emb_a"), col("emb_b")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= minCos)
  }
}
