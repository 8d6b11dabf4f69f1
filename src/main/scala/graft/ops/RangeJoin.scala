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

  /** Interval-OVERLAP join: every (left, right) pair of intervals with
    * [loL, hiL] ∩ [loR, hiR] ≠ ∅ (closed bounds), equi-keyed on `keys`
    * — the temporal-overlap primitive (concurrent sessions, shipping
    * windows in flight together, co-resident spans) that the
    * point-in-interval form can't express.
    *
    * Same binning discipline as [[pointInInterval]], with the standard
    * duplicate-free trick: BOTH sides explode to their covered bins,
    * pairs meet on the (keys, bin) equi-join, and a pair is emitted
    * ONLY in the bin containing the overlap's left edge
    * (max(loL, loR)) — each overlapping pair has exactly one such bin,
    * so no post-join distinct (a distinct would shuffle the full pair
    * output; this filter is free). The shuffle carries (keys, bin,
    * payload) rows replicated ×(span/binWidth); pick `binWidth` near
    * the typical interval width for O(1) replication. Work scales with
    * genuine same-key bin co-residency, never the cross product — and
    * the equi-key bounds the pair space exactly like a join key
    * (keyless universes should pre-bucket or block first).
    */
  def intervalOverlap(left: DataFrame, loL: String, hiL: String,
                      right: DataFrame, loR: String, hiR: String,
                      keys: Seq[String], binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binned(df: DataFrame, lo: String, hi: String): DataFrame =
      df.withColumn("__bin",
        explode(sequence(floor(col(lo).cast("double") / binWidth).cast("long"),
          floor(col(hi).cast("double") / binWidth).cast("long"))))
    binned(left, loL, hiL)
      .join(binned(right, loR, hiR), keys :+ "__bin")
      .filter(col(loL) <= col(hiR) && col(loR) <= col(hiL))
      .filter(col("__bin") ===
        floor(greatest(col(loL), col(loR)).cast("double") / binWidth).cast("long"))
      .drop("__bin")
  }
}
