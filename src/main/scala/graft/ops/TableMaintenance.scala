package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lakehouse file-layout maintenance: the small-files report + rewrite
  * plan a table keeper runs on schedule. Micro-batch writers and wide
  * shuffles fragment partitions into many sub-row-group files; every
  * later scan then pays per-file open/footer/seek cost, and at 100 TB
  * a 10⁶-file table can spend longer planning splits than reading
  * bytes. This op reads ONLY filesystem metadata (one recursive
  * listing — no data touched) and emits, per hive-partition directory:
  * file count, total bytes, small-file count, and the file count a
  * rewrite should target (ceil(bytes / targetBytes), the parquet
  * row-group sweet spot).
  *
  * The listing is driver-side and bounded by the FILE COUNT, not data
  * size — exactly the quantity being audited; a table fragmented
  * enough to strain the listing is the table that most needs the
  * report. Pair with [[graft.streaming.GenStore.autoCompact]] (the
  * streaming stores' fold trigger) and `Sinks.parquetPartitioned` for
  * the rewrite itself.
  */
object TableMaintenance {

  /** Per-partition layout report. `small` = files under targetBytes/2
    * (a file at or above half target merges into at most one neighbor —
    * below it, rewrites keep paying).
    *
    * @return (partition, n_files, bytes, n_small, target_files,
    *         needs_rewrite) — partition is the hive-relative dir ("" for
    *         an unpartitioned table), needs_rewrite when a rewrite would
    *         shrink the file count.
    */
  def smallFiles(spark: SparkSession, dir: String,
                 targetBytes: Long = 128L << 20): DataFrame = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootStr = fs.makeQualified(root).toString
    val it = fs.listFiles(root, true)
    val perPart = scala.collection.mutable.Map.empty[String, (Int, Long, Int)]
    while (it.hasNext) {
      val st = it.next()
      val parent = fs.makeQualified(st.getPath.getParent).toString
      val rel = parent.stripPrefix(rootStr).stripPrefix("/")
      // bookkeeping is invisible at ANY depth: a file is data only if
      // neither its name nor any ancestor directory segment under the
      // root is underscore/dot-prefixed — otherwise _spark_metadata/,
      // _delta_log/, .hive-staging*/ and _temporary/ contents would
      // surface as phantom partitions and a maintenance job acting on
      // the report would rewrite a sink's commit log
      def visible(seg: String) = !seg.startsWith("_") && !seg.startsWith(".")
      if (st.isFile && visible(st.getPath.getName)
          && rel.split("/").filter(_.nonEmpty).forall(visible)) {
        val (n, b, s) = perPart.getOrElse(rel, (0, 0L, 0))
        perPart(rel) = (n + 1, b + st.getLen,
          s + (if (st.getLen < targetBytes / 2) 1 else 0))
      }
    }
    val rows = perPart.toSeq.sortBy(_._1).map { case (part, (n, bytes, small)) =>
      val target = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      (part, n, bytes, small, target, n > target)
    }
    import spark.implicits._
    rows.toDF("partition", "n_files", "bytes", "n_small", "target_files",
      "needs_rewrite")
  }
}
