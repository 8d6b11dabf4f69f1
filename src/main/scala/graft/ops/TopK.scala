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

  /** row_number variant — exactly k rows per key, ties broken by `order`. */
  def exactPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int,
                  rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }
}
