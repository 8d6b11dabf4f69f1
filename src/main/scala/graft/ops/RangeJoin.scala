package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed point-in-interval (range) join.
  *
  * Spark plans a bare `p BETWEEN lo AND hi` join as
  * BroadcastNestedLoopJoin — O(|points| · |intervals|) compares, driver
  * OOM when neither side broadcasts. Binning makes it a shuffle join:
  * each interval explodes to the integer bins it overlaps, each point
  * maps to one bin, the equi-join on the bin key shuffles both sides by
  * bin, and a residual BETWEEN filter removes same-bin near-misses.
  * Work scales with genuine overlap (× interval/bin span ratio), not
  * with the cross product; pick `binWidth` near the typical interval
  * width so intervals explode to O(1) bins each.
  */
object RangeJoin {

  /** Inner-join `points` rows to every `intervals` row whose
    * [loCol, hiCol] contains pointCol (closed bounds, matching SQL
    * BETWEEN). Column sets must be collision-free.
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val pb = points.withColumn("__bin",
      floor(col(pointCol).cast("double") / binWidth).cast("long"))
    val ib = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol).cast("double") / binWidth).cast("long"),
        floor(col(hiCol).cast("double") / binWidth).cast("long"))))
    pb.join(ib, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
