package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.engine.expressions.KmvDistinct

/** Pre-join cardinality estimation from KMV sketches — "how big is this
  * join?" answered WITHOUT running the join, the number a planner (or an
  * engineer sizing a 100 TB shuffle) needs before committing to a
  * strategy. Each side is reduced to its k smallest distinct key hashes
  * (one aggregation pass, k·8 bytes out); the θ-sketch combine then
  * estimates |A∪B|, |A∩B| and the key Jaccard from the two sketches
  * alone:
  *
  *   M     = k smallest of (Sa ∪ Sb)        (the union's own KMV sketch)
  *   U_est = (k−1) / (max(M)/2^60)          (|M| < k ⇒ exact count)
  *   J_est = |M ∩ Sa ∩ Sb| / |M|            (fraction of union sample in both)
  *   I_est = J_est · U_est
  *
  * Everything is a pure function of the data (md5-derived hashes, no
  * seeds), so the estimate is reproducible anywhere — including the SQL
  * oracle. The combine runs on two 1-row broadcast frames: cost beyond
  * the two side scans is nil, and the side scans are the same partial
  * aggregates a countDistinct would do, minus the exact shuffle.
  */
object JoinEstimate {

  /** One-row estimate frame for the key overlap of `a.aKey` vs `b.bKey`.
    * Output: k, union_est, inter_est, jaccard_est (6 dp).
    */
  def keyOverlap(a: DataFrame, aKey: Column, b: DataFrame, bKey: Column,
                 k: Int): DataFrame = {
    val spark = a.sparkSession
    KmvDistinct.register(spark)
    val sa = a.agg(KmvDistinct.sketch(KmvDistinct.hash60(aKey), k).as("s"))
      .select(col("s.values").as("va"))
    val sb = b.agg(KmvDistinct.sketch(KmvDistinct.hash60(bKey), k).as("s"))
      .select(col("s.values").as("vb"))
    sa.crossJoin(broadcast(sb))
      .withColumn("m", slice(array_sort(array_union(col("va"), col("vb"))), 1, k))
      .withColumn("msz", size(col("m")))
      .withColumn("c",
        size(array_intersect(array_intersect(col("m"), col("va")), col("vb"))))
      .withColumn("union_est",
        when(col("msz") < k, col("msz").cast("double"))
          .otherwise(lit((k - 1).toDouble)
            / (element_at(col("m"), k).cast("double") / KmvDistinct.Norm)))
      // msz = 0 ⇔ both inputs empty: report clean zero estimates, not
      // the null a 0/0 division would hand a consuming planner
      .withColumn("jaccard_est",
        when(col("msz") === 0, lit(0.0))
          .otherwise(col("c").cast("double") / col("msz")))
      .select(lit(k).as("k"),
        round(col("union_est"), 6).as("union_est"),
        round(col("jaccard_est") * col("union_est"), 6).as("inter_est"),
        round(col("jaccard_est"), 6).as("jaccard_est"))
  }
}
