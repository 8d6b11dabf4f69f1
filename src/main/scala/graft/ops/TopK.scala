package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Per-group top-K (SURVEY.md §2.6 O3/O4).
  *
  * The reference does this two ways: a driver-grade quickselect inside an
  * RDD flatMap (`src/search_ranking_peers.py:276-316`) and a rank-window
  * filter (`src/inference_postprocess.py:85-86`). The engine standardizes
  * on the window form: Spark ≥3.5 plans `rank()<=k` filters as
  * `WindowGroupLimit` (a per-partition top-K heap before the shuffle), so
  * this is the scalable formulation — no full sort per key, map-side
  * partial limits, one shuffle.
  */
object TopK {

  /** Rows ranked `<= k` per `keys` under `order` (ties kept by `rank`).
    * Pass a total order for deterministic output.
    */
  def perKey(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int,
             rankCol: String = "rank"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, rank().over(w)).filter(col(rankCol) <= k)
  }

  /** row_number variant — exactly k rows per key, ties broken by `order`.
    *
    * `prepartition = true` hash-repartitions on `keys` before the window
    * instead of letting EnsureRequirements insert the exchange. That
    * suppresses the partial WindowGroupLimit pass, which pays for itself
    * only when each map partition holds many more than k rows per key —
    * when groups are spread thin across partitions (k=30 over 32
    * partitions of ~600-candidate groups) the partial pass is a full
    * local sort that eliminates nothing (measured 4× slower at sf0.1).
    * Leave it false when map-side groups are large and skewed.
    */
  def exactPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int,
                  rankCol: String = "rn", prepartition: Boolean = false): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val in = if (prepartition) df.repartition(keys.map(col): _*) else df
    in.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }
}
