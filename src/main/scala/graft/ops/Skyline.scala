package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): the rows not dominated under
  * (minimize `xCol`, maximize `yCol`) — q dominates p when q.x <= p.x
  * and q.y >= p.y with at least one strict. Börzsönyi et al. (ICDE'01)
  * introduced the operator for exactly the reference's report shapes
  * ("cheapest parts per capability tier"); the naive formulation is an
  * all-pairs NOT EXISTS anti-join, Θ(n²) comparisons.
  *
  * Distributed shape — three bounded steps, no pair blow-up:
  *  1. per-x reduction: `max(y) group by x` (one hash shuffle on x —
  *     a row can only be on the frontier if it carries its price
  *     point's best y);
  *  2. EXCLUSIVE running max of best-y over x ascending on the
  *     DISTINCT-x frame via [[PrefixSum.withRunningMax]] (two-phase
  *     scan — per-partition maxima to the driver, seeded rescan — so
  *     the sort never funnels through a single window task);
  *  3. frontier x-points are those whose best y strictly beats every
  *     smaller x's best (prefix max NULL or < best); surviving rows
  *     join back on (x, y = best).
  *
  * Ties: equal (x, y) rows dominate each other only non-strictly, so
  * ALL of them are on the frontier — step 3's equality join keeps
  * every such row, matching the NOT-EXISTS definition row-for-row.
  *
  * 100 TB: step 1 is a partial-agg-friendly groupBy; step 2 runs on
  * |distinct x| rows (bounded by the value domain, not the table); the
  * final join broadcasts the frontier point set when small. The full
  * table is scanned twice (steps 1 and 3) and never pairwise-joined.
  */
object Skyline {

  /** Rows of `df` on the (min xCol, max yCol) Pareto frontier. `yCol`
    * must be integral (the prefix-max monoid runs in Long).
    */
  def frontier2d(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val best = df.groupBy(col(xCol).as("__x"))
      .agg(max(col(yCol).cast("long")).as("__besty"))
    val scanned = PrefixSum.withRunningMax(
      best, "__besty", "__pm", Seq(col("__x").asc))
    val frontier = scanned
      .filter(col("__pm").isNull || col("__pm") < col("__besty"))
      .select(col("__x"), col("__besty"))
    df.join(frontier,
      col(xCol) === col("__x") && col(yCol).cast("long") === col("__besty"))
      .drop("__x", "__besty")
  }

  /** Per-group skyline: [[frontier2d]] within each `groupCol` value.
    * Here a plain partitioned window IS the scale-safe plan — the
    * running max shuffles on the group key and orders within the
    * partition, so no task sees more than one group's x-domain. (The
    * unpartitioned variant above is the one that needs the two-phase
    * scan.)
    */
  def frontier2dByGroup(df: DataFrame, groupCol: String, xCol: String,
                        yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val best = df.groupBy(col(groupCol).as("__g"), col(xCol).as("__x"))
      .agg(max(col(yCol).cast("long")).as("__besty"))
    val w = Window.partitionBy("__g").orderBy(col("__x").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = best.withColumn("__pm", max(col("__besty")).over(w))
      .filter(col("__pm").isNull || col("__pm") < col("__besty"))
      .select(col("__g"), col("__x"), col("__besty"))
    df.join(frontier,
      col(groupCol) === col("__g") && col(xCol) === col("__x") &&
        col(yCol).cast("long") === col("__besty"))
      .drop("__g", "__x", "__besty")
  }
}
