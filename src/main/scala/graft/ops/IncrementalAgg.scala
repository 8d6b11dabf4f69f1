package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: re-aggregating PARTIAL aggregates
  * equals aggregating the full input, for decomposable measures
  * (sum/count via sum, min, max). The rolling-aggregate pattern at
  * 100 TB: aggregate only the newly-arrived partition and fold it into
  * yesterday's aggregate table — never rescan history.
  */
object IncrementalAgg {

  /** Merge partial-aggregate frames sharing (keys ++ measures) schemas.
    *
    * @param partials partial aggregates (e.g. yesterday's table + the
    *                 delta partition's aggregate)
    * @param keys     grouping columns
    * @param sumCols  measures merged by sum (counts and sums both)
    * @param minCols  measures merged by min
    * @param maxCols  measures merged by max
    */
  def merge(partials: Seq[DataFrame], keys: Seq[String],
            sumCols: Seq[String], minCols: Seq[String] = Nil,
            maxCols: Seq[String] = Nil): DataFrame = {
    require(partials.nonEmpty, "need at least one partial")
    val unioned = partials.reduce(_ unionByName _)
    val aggs = sumCols.map(c => sum(col(c)).as(c)) ++
      minCols.map(c => min(col(c)).as(c)) ++
      maxCols.map(c => max(col(c)).as(c))
    unioned.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
