package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The shared generation-compaction protocol of the streaming stores
  * ([[IncrementalIvf]], [[IncrementalDedup]]): append-only `batch=N`
  * dirs are periodically folded into `_compacted/v=G` generations whose
  * MANIFEST RENAME is the atomic read-switch point, then superseded
  * inputs are deleted idempotently. Store-specific layout (what is
  * inside a generation, how it partitions) stays with each store; this
  * object owns only the protocol: manifest commit/resolve, live-batch
  * listing, and post-commit cleanup.
  *
  * Crash windows (spec-pinned per store):
  *  - before the manifest rename: the old generation stays visible, a
  *    re-run overwrites the partial `v=G` data;
  *  - after the rename, before/inside cleanup: cleanup is idempotent
  *    and re-runs on the next compact() call.
  */
private[streaming] object GenStore {

  def fsOf(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def compactedRoot(storeDir: String) = s"$storeDir/_compacted"
  def genDir(storeDir: String, gen: Long) = s"${compactedRoot(storeDir)}/v=$gen"
  def manifestPath(storeDir: String, gen: Long) =
    s"${compactedRoot(storeDir)}/v=$gen.manifest.json"

  /** The newest generation with a COMMITTED manifest, as
    * (gen, maxBatchFolded) — uncommitted generations are invisible.
    */
  def latestCompaction(spark: SparkSession, storeDir: String): Option[(Long, Long)] = {
    val fs = fsOf(spark, storeDir)
    val root = new Path(compactedRoot(storeDir))
    if (!fs.exists(root)) return None
    val gens = fs.listStatus(root).map(_.getPath.getName)
      .collect { case name if name.startsWith("v=") && name.endsWith(".manifest.json") =>
        name.stripPrefix("v=").stripSuffix(".manifest.json").toLong }
    gens.sorted.reverse.headOption.map { g =>
      val in = fs.open(new Path(manifestPath(storeDir, g)))
      val body = try scala.io.Source.fromInputStream(in).mkString finally in.close()
      val mb = "\"max_batch\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(body)
        .getOrElse(sys.error(s"malformed manifest for gen $g: $body")).group(1).toLong
      (g, mb)
    }
  }

  /** `batch=N` ids above `aboveBatch`, ascending. */
  def liveBatchIds(spark: SparkSession, storeDir: String,
                   aboveBatch: Long): Seq[Long] = {
    val fs = fsOf(spark, storeDir)
    val root = new Path(storeDir)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).map(_.getPath.getName)
      .collect { case name if name.startsWith("batch=") =>
        name.stripPrefix("batch=").toLong }
      .filter(_ > aboveBatch).sorted.toSeq
  }

  /** Of `paths`, those that exist and contain at least one
    * non-underscore entry (a file-less root fails parquet inference).
    */
  def nonEmptyPaths(spark: SparkSession, storeDir: String,
                    paths: Seq[String]): Seq[String] = {
    val fs = fsOf(spark, storeDir)
    paths.filter { p =>
      val hp = new Path(p)
      fs.exists(hp) && fs.listStatus(hp)
        .exists(st => !st.getPath.getName.startsWith("_"))
    }
  }

  /** Size-triggered compaction for foreachBatch drivers: run
    * `compactFn` when the live `batch=N` count has reached
    * `minLiveBatches` (each micro-batch adds ≤1 file per bucket, so
    * thresholding live batches IS thresholding per-bucket file count —
    * a reader opens ≤ minLiveBatches + 1 files per bucket between
    * triggers). Called at the TOP of a foreachBatch body, before the
    * current batch's data is written.
    *
    * Replay safety: batches < batchId are durably committed by
    * Structured Streaming (batch N starts only after N−1's checkpoint
    * commit), so folding them can never race a replay. A batch dir
    * whose id == batchId means THIS invocation is a crash replay of an
    * uncommitted batch — folding it would double-count it when
    * processBatch rewrites the dir, so the trigger skips this cycle
    * and fires after the batch commits instead.
    */
  def autoCompact(spark: SparkSession, storeDir: String, batchId: Long,
                  minLiveBatches: Int)(compactFn: => Unit): Unit = {
    if (minLiveBatches <= 0) return
    val prevMax = latestCompaction(spark, storeDir).map(_._2).getOrElse(-1L)
    val live = liveBatchIds(spark, storeDir, prevMax)
    if (live.size >= minLiveBatches && live.forall(_ < batchId)) compactFn
  }

  /** Commit point: write `v=G.manifest.json` beside the generation data
    * via create-then-rename.
    */
  def commitManifest(spark: SparkSession, storeDir: String, gen: Long,
                     maxBatch: Long): Unit = {
    val fs = fsOf(spark, storeDir)
    val tmp = new Path(manifestPath(storeDir, gen) + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(s"""{"gen":$gen,"max_batch":$maxBatch}""".getBytes("UTF-8"))
    finally out.close()
    fs.rename(tmp, new Path(manifestPath(storeDir, gen)))
  }

  /** Idempotent post-commit cleanup: delete folded `batch=N` dirs (ids
    * ≤ the committed high-water mark) and superseded generations.
    */
  def cleanup(spark: SparkSession, storeDir: String): Unit =
    latestCompaction(spark, storeDir).foreach { case (gen, maxBatch) =>
      val fs = fsOf(spark, storeDir)
      liveBatchIds(spark, storeDir, -1L).filter(_ <= maxBatch).foreach { b =>
        fs.delete(new Path(s"$storeDir/batch=$b"), true)
      }
      val root = new Path(compactedRoot(storeDir))
      if (fs.exists(root)) fs.listStatus(root).map(_.getPath).foreach { p =>
        val n = p.getName
        val g = n.stripPrefix("v=").stripSuffix(".tmp")
          .stripSuffix(".manifest.json").stripSuffix(".centroids")
        if (n.startsWith("v=") && g.forall(_.isDigit) && g.nonEmpty && g.toLong < gen)
          fs.delete(p, true)
      }
    }
}
