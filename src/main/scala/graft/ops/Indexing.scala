package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Contiguous 0-based surrogate keys (SURVEY.md §2 / §7.4-6).
  *
  * The reference builds these with `rdd.zipWithIndex()`
  * (`src/search_ranking_peers.py:203-204`, `src/recommender_prod_rec.py:189-190`)
  * — partition-order dependent, hence nondeterministic across runs.
  * The engine assigns ids under an explicit total order.
  */
object Indexing {

  /** Deterministic surrogate ids: `idxCol = row_number() - 1` over `order`.
    *
    * Note the unpartitioned window is a single-task sort — fine for the
    * entity/dimension tables it is meant for (ALS user/item universes),
    * wrong for fact tables; use [[zipWithIndexOrdered]] (or
    * [[GlobalRank.withRowNumber]], its 1-based DataFrame wrapper) there.
    */
  def withRowIndex(df: DataFrame, idxCol: String, order: Seq[Column]): DataFrame = {
    val w = Window.orderBy(order: _*)
    df.withColumn(idxCol, (row_number().over(w) - 1).cast("int"))
  }

  /** Scalable variant: sort by `order`, then assign contiguous ids with
    * `zipWithIndex` (one extra count job, no single-task bottleneck).
    * Deterministic because the input is range-partitioned by the sort.
    *
    * Ids are LongType: this is the fact-table path, and an Int id wraps
    * negative past ~2.1B rows — precisely the scale this variant exists
    * for. Callers that need Int (the MLlib ALS boundary) should
    * range-check and fail fast rather than truncate.
    */
  def zipWithIndexOrdered(df: DataFrame, idxCol: String, order: Seq[Column]): DataFrame = {
    val sorted = df.orderBy(order: _*)
    val spark = df.sparkSession
    val indexed = sorted.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(i +: row.toSeq)
    }
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField(idxCol,
        org.apache.spark.sql.types.LongType, nullable = false) +: sorted.schema.fields)
    spark.createDataFrame(indexed, schema)
  }
}
