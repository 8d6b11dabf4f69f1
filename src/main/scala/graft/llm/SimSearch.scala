package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.expressions.DotProduct.dot
import graft.ops.TopK

/** Approximate-nearest-neighbor search over an embedding array column.
  *
  * Kernel design: embeddings are unit-normalized ONCE per side (O(n·d)),
  * then every pair costs a single codegen'd dot product
  * (`engine.expressions.DotProduct` — compiled loop, not interpreted
  * higher-order lambdas; measured ~10× on the pair stage). Cosine of
  * unit vectors == dot product.
  *
  * Two search paths:
  *  - [[bruteForceTopK]]: exact — broadcast the (small) query set against
  *    the corpus, one distributed pass, per-query top-K via group-limit.
  *    Right shape whenever queries ≪ corpus; linear in corpus size, no
  *    corpus shuffle.
  *  - [[ivfTopK]]: IVF-style — deterministic centroids, corpus bucketed
  *    by nearest centroid, queries probe only `nProbe` buckets.
  *    Sub-linear scan cost at large n.
  */
object SimSearch {

  /** Project `idOut` + unit-normalized double embedding `embOut`. */
  private def unitized(df: DataFrame, idCol: String, embCol: String,
                       idOut: String, embOut: String): DataFrame = {
    graft.engine.expressions.DotProduct.register(df.sparkSession)
    df.withColumn("__d", col(embCol).cast("array<double>"))
      .withColumn("__n", sqrt(dot(col("__d"), col("__d"))))
      .select(col(idCol).as(idOut),
        when(col("__n") === 0.0, col("__d"))
          .otherwise(transform(col("__d"), x => x / col("__n"))).as(embOut))
  }

  /** Exact top-K cosine neighbors per query. `queries` must be small
    * enough to broadcast.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     embCol: String, k: Int): DataFrame = {
    val c = unitized(corpus, idCol, embCol, idCol, "__ne")
    val q = unitized(queries, idCol, embCol, "query_id", "__qe")
    val pairs = c.join(broadcast(q), col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol),
        round(dot(col("__qe"), col("__ne")), 6).as("cos_sim"))
    TopK.exactPerKey(pairs, Seq("query_id"),
      Seq(col("cos_sim").desc, col(idCol).asc), k, "rnk")
      .withColumn("rnk", col("rnk").cast("int"))
  }

  /** IVF-bucketed approximate top-K: assign every corpus vector to its
    * nearest of `nCentroids` centroids (deterministically the first
    * vectors under id order — a k-means seeding stand-in), then scan
    * only the query's `nProbe` nearest buckets.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              embCol: String, k: Int, nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    val c = unitized(corpus, idCol, embCol, idCol, "__ne")
    val q = unitized(queries, idCol, embCol, "query_id", "__qe")
    val cents = c.orderBy(col(idCol)).limit(nCentroids)
      .select(col(idCol).as("cent_id"), col("__ne").as("cent_emb"))

    def nearestBuckets(df: DataFrame, id: String, emb: String, n: Int) =
      TopK.exactPerKey(
        df.crossJoin(broadcast(cents))
          .select(col(id), col(emb), col("cent_id"),
            dot(col(emb), col("cent_emb")).as("__c")),
        Seq(id), Seq(col("__c").desc, col("cent_id").asc), n, "__cr")
        .select(col(id), col(emb), col("cent_id").as("bucket"))

    val bucketed = nearestBuckets(c, idCol, "__ne", 1)
    val probed = nearestBuckets(q, "query_id", "__qe", nProbe)

    val pairs = probed.join(bucketed, Seq("bucket"))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol),
        round(dot(col("__qe"), col("__ne")), 6).as("cos_sim"))
    TopK.exactPerKey(pairs.dropDuplicates("query_id", idCol), Seq("query_id"),
      Seq(col("cos_sim").desc, col(idCol).asc), k, "rnk")
      .withColumn("rnk", col("rnk").cast("int"))
  }

  /** All pairs above a cosine threshold within a (filtered) corpus —
    * embedding near-dup detection. Quadratic in the filtered size; the
    * scale path buckets first ([[ivfTopK]]-style or LSH).
    */
  def thresholdPairs(corpus: DataFrame, idCol: String, embCol: String,
                     minCos: Double): DataFrame = {
    val a = unitized(corpus, idCol, embCol, "id_a", "__ea")
    val b = unitized(corpus, idCol, embCol, "id_b", "__eb")
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("__ea"), col("__eb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= minCos)
  }
}
