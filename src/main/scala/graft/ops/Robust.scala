package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group statistics via EXACT order statistics —
  * winsorization (Tukey's trimming-by-clamping): values below the
  * pLo-th / above the pHi-th order statistic clamp to those bounds
  * before aggregating, the standard outlier-hardening pass for price /
  * latency / length features ahead of scaling (the [[Scale]] ops are
  * mean/extreme-based and an single corrupt row drags them; the
  * winsorized mean moves by at most the clamp width).
  *
  * EXACT, not sketched: the bound is the value AT rank
  * max(1, ceil(p·n)) of the group's sort order — approx_percentile
  * trades that for mergeability, but a correctness-gated feature
  * pipeline wants reproducible bounds (and a DuckDB twin can replay
  * ranks bit-for-bit, q230). Feed INTEGER-grained values (cents,
  * token counts, ms) and everything downstream — bounds, clip, sum —
  * stays in long arithmetic with zero float discipline; the caller
  * divides the grain back out at the end.
  *
  * Scale shape: one per-group window sort + one clip-and-aggregate
  * pass, shuffles keyed on the group column. Parallelism equals the
  * group count — right for feature groups (brands, sources,
  * languages: tens to thousands); for a HANDFUL of groups or a global
  * winsorize, route the rank through [[GlobalRank.withRowNumber]]
  * (distributed range sort) instead of a window — same ranks, no
  * single-task funnel (the q151 caveat).
  *
  * Ties: equal values get arbitrary row_number order, but the
  * SELECTED bound is a value, so ties at the cut change nothing.
  *
  * @return one row per group: n, lo, hi (the clamp bounds as values
  *         of `valCol`'s type), n_clipped, sum_winsor (sum of clamped
  *         values, exact for integral inputs)
  */
object Robust {

  def winsorizedStats(df: DataFrame, groupCol: String, valCol: String,
                      pLo: Double, pHi: Double): DataFrame = {
    require(0.0 <= pLo && pLo <= pHi && pHi <= 1.0,
      s"need 0 <= pLo <= pHi <= 1, got ($pLo, $pHi)")
    val v = df.select(col(groupCol), col(valCol))
    val ranked = v
      .withColumn("__r", row_number()
        .over(Window.partitionBy(groupCol).orderBy(col(valCol))))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(groupCol)))
    def atRank(rank: Column): Column =
      max(when(col("__r") === rank, col(valCol)))
    val bounds = ranked.groupBy(groupCol).agg(
      atRank(greatest(lit(1L), ceil(lit(pLo) * col("__n")))).as("__lo"),
      atRank(least(col("__n"), ceil(lit(pHi) * col("__n")))).as("__hi"))
    val clipped = least(greatest(col(valCol), col("__lo")), col("__hi"))
    v.join(bounds, Seq(groupCol))
      .groupBy(groupCol)
      .agg(
        count(lit(1)).cast("int").as("n"),
        first(col("__lo")).as("lo"),
        first(col("__hi")).as("hi"),
        sum(when(col(valCol) < col("__lo") || col(valCol) > col("__hi"), 1L)
          .otherwise(0L)).cast("int").as("n_clipped"),
        sum(clipped).as("sum_winsor"))
  }
}
