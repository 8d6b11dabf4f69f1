package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scalable GLOBAL ranks — row_number / ntile over a total order without
  * an unpartitioned window (SURVEY.md §2.5 W-ops; the `WindowExec: No
  * Partition Defined` single-task funnel the bench tail warns about).
  *
  * Two passes, both distributed:
  *   1. `repartitionByRange(order)` bins rows so bin i sorts entirely
  *      before bin i+1 (`spark_partition_id()` is the bin id); a B-row
  *      count aggregate + cumulative sum yields each bin's global offset.
  *   2. a window PARTITIONED by bin computes local row_number; global
  *      rank = bin offset + local rank.
  *
  * The only unpartitioned window runs over the B ≈ shuffle-partition
  * bin-count rows — bounded by cluster width, not data size. Ties cannot
  * straddle bins when `order` is a total order (equal keys hash to one
  * range partition), which is also what makes the result deterministic.
  *
  * ops.Indexing.zipWithIndexOrdered is the RDD twin of pass 2; this
  * stays in DataFrame land so the ranked frame keeps codegen and column
  * pruning.
  */
object GlobalRank {

  /** Append 1-based global `row_number() OVER (ORDER BY order)` as
    * `outCol` (LongType), computed with the two-pass plan above.
    */
  def withRowNumber(df: DataFrame, outCol: String, order: Seq[Column]): DataFrame = {
    val binned = df.repartitionByRange(order: _*)
      .withColumn("__bin", spark_partition_id())
    // B rows: per-bin counts + exclusive prefix sum = bin start offsets.
    val offsets = binned.groupBy("__bin").count()
      .withColumn("__off", coalesce(
        sum(col("count")).over(
          Window.orderBy(col("__bin"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("count")
    binned.join(broadcast(offsets), "__bin")
      .withColumn(outCol,
        row_number().over(Window.partitionBy(col("__bin")).orderBy(order: _*))
          + col("__off"))
      .drop("__bin", "__off")
  }

  /** Append global `ntile(k) OVER (ORDER BY order)` as `outCol`
    * (IntegerType): ntile's bucket algebra — the first `n % k` buckets
    * take `n/k + 1` rows, the rest `n/k` — applied to the two-pass
    * global row number, so results are row-identical to the window form
    * (RelationalSpec pins parity).
    */
  def withNtile(df: DataFrame, outCol: String, k: Int, order: Seq[Column]): DataFrame = {
    val rn = withRowNumber(df, "__rn", order)
    val n = rn.agg(count(lit(1)).as("__n"))
    val size = (col("__n") / k).cast("long") // n/k, floored (counts ≥ 0)
    val rem = col("__n") % k                 // first rem buckets get +1
    val r0 = col("__rn") - 1                 // 0-based index
    rn.crossJoin(broadcast(n))
      .withColumn(outCol,
        when(r0 < rem * (size + 1), r0 / (size + 1) + 1)
          .otherwise(rem + (r0 - rem * (size + 1)) / size + 1)
          .cast("int"))
      .drop("__rn", "__n")
  }
}
