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
                     order: Seq[Column]): DataFrame =
    withRunningSums(df, Seq(valueCol), Seq(outCol), order)

  /** [[withRunningSum]] over SEVERAL integral columns at once — one
    * range sort, one per-partition pass, k accumulators: a caller
    * needing two running totals over the same order (the two-arm ECDF
    * pair in Robust.ksTest) must not pay two sorts. `outCols(j)` is the
    * exclusive running sum of `valueCols(j)`.
    */
  def withRunningSums(df: DataFrame, valueCols: Seq[String],
                      outCols: Seq[String], order: Seq[Column]): DataFrame = {
    require(valueCols.nonEmpty && valueCols.size == outCols.size,
      s"need matching non-empty column lists, got $valueCols -> $outCols")
    val spark = df.sparkSession
    val sorted = df.orderBy(order: _*)
    val idxs = valueCols.map(sorted.schema.fieldIndex).toArray
    val k = idxs.length
    val rdd = sorted.rdd
    // Function value (not a local def) so the RDD closures capture only
    // `idxs`/`k`, never the enclosing module.
    val valuesAt: (Row, Array[Long]) => Unit = (r, into) => {
      var j = 0
      while (j < k) {
        into(j) = r.get(idxs(j)) match {
          case null => 0L
          case n: Number => n.longValue()
        }
        j += 1
      }
    }
    val partSums = rdd.mapPartitionsWithIndex { (i, it) =>
      val s = new Array[Long](k)
      val v = new Array[Long](k)
      it.foreach { r =>
        valuesAt(r, v)
        var j = 0; while (j < k) { s(j) += v(j); j += 1 }
      }
      Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    // offsets(i) = total of partitions 0..i-1 (scanLeft drops the last)
    val offsets = partSums.scanLeft(new Array[Long](k)) { (a, b) =>
      Array.tabulate(k)(j => a(j) + b(j))
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      val acc = bc.value(i).clone()
      val v = new Array[Long](k)
      it.map { r =>
        val before = java.util.Arrays.copyOf(acc, k)
        valuesAt(r, v)
        var j = 0; while (j < k) { acc(j) += v(j); j += 1 }
        Row.fromSeq(r.toSeq ++ before)
      }
    }
    spark.createDataFrame(out, StructType(
      sorted.schema.fields ++ outCols.map(c =>
        StructField(c, LongType, nullable = false))))
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
