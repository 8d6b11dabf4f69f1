package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed prefix sum — a running total over a global order WITHOUT
  * the unpartitioned-window single-task funnel (`sum(x) OVER (ORDER BY
  * …)` moves the whole table through one task; see GlobalRank for the
  * same hazard on ranks).
  *
  * Two-phase scan over the range-sorted table: per-partition partial
  * sums (tiny — one row per partition — collected to the driver), then
  * a per-partition pass that seeds each partition with the sum of all
  * preceding partitions. Both jobs run over the SAME sorted RDD lineage,
  * outside AQE re-planning, so partition indices agree between phases —
  * the [[Indexing.zipWithIndexOrdered]] recipe, generalized from
  * row-counting to value accumulation.
  */
object PrefixSum {

  /** Append the EXCLUSIVE running sum of `valueCol` (an integral column)
    * over `order` as `outCol` (LongType): each row receives the sum of
    * all strictly-preceding rows' values. `order` must be a total order
    * (unique tiebreaker) for the result to be well-defined. Null values
    * in `valueCol` contribute 0 to the running total (SQL SUM
    * semantics), so the appended column is always non-null.
    */
  def withRunningSum(df: DataFrame, valueCol: String, outCol: String,
                     order: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(order: _*)
    val idx = sorted.schema.fieldIndex(valueCol)
    val rdd = sorted.rdd
    // Function value (not a local def) so the RDD closures capture only
    // `idx`, never the enclosing module.
    val valueAt: Row => Long = r => r.get(idx) match {
      case null => 0L
      case n: Number => n.longValue()
    }
    val partSums = rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L
      it.foreach(r => s += valueAt(r))
      Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    // offsets(i) = total of partitions 0..i-1 (scanLeft drops the last)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = bc.value(i)
      it.map { r =>
        val before = acc
        acc += valueAt(r)
        Row.fromSeq(r.toSeq :+ before)
      }
    }
    spark.createDataFrame(out, StructType(
      sorted.schema.fields :+ StructField(outCol, LongType, nullable = false)))
  }

  /** Append the EXCLUSIVE running MAX of `valueCol` (an integral
    * column) over `order` as `outCol` (LongType, nullable): each row
    * receives the max of all strictly-preceding rows' values, or NULL
    * when no preceding row has a non-null value. Same two-phase scan as
    * [[withRunningSum]] — per-partition maxima (one row per partition,
    * bounded driver pull), then a seeded per-partition pass — so the
    * global order never funnels through one task. This is the monoid
    * the 2-D skyline ([[Skyline]]) needs: "best y seen at any strictly
    * smaller x".
    */
  def withRunningMax(df: DataFrame, valueCol: String, outCol: String,
                     order: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(order: _*)
    val idx = sorted.schema.fieldIndex(valueCol)
    val rdd = sorted.rdd
    val valueAt: Row => Option[Long] = r => r.get(idx) match {
      case null => None
      case n: Number => Some(n.longValue())
    }
    val combine: (Option[Long], Option[Long]) => Option[Long] = {
      case (Some(a), Some(b)) => Some(math.max(a, b))
      case (a, None) => a
      case (None, b) => b
    }
    val partMaxes = rdd.mapPartitionsWithIndex { (i, it) =>
      var m: Option[Long] = None
      it.foreach(r => m = combine(m, valueAt(r)))
      Iterator((i, m))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partMaxes.scanLeft(Option.empty[Long])(combine)
    val bc = spark.sparkContext.broadcast(offsets)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = bc.value(i)
      it.map { r =>
        val before = acc
        acc = combine(acc, valueAt(r))
        Row.fromSeq(r.toSeq :+ before.map(Long.box).orNull)
      }
    }
    spark.createDataFrame(out, StructType(
      sorted.schema.fields :+ StructField(outCol, LongType, nullable = true)))
  }
}
