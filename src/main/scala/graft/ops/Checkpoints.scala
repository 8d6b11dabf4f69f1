package graft.ops

import org.apache.spark.sql.DataFrame

/** Engine-wide lineage-truncation knob for the iterative family
  * (CC/SCC/HITS/label-prop/k-core/truss/MIS/PageRank/BFS/walks…).
  *
  * Every iterative op truncates loop-carried lineage so per-round plan
  * analysis stays O(1) instead of O(round). `localCheckpoint` does that
  * with EXECUTOR-LOCAL blocks — fast, no configuration, but not
  * fault-tolerant: on a real cluster, losing one executor mid-run kills
  * the job unrecoverably (the truncated lineage cannot recompute the
  * lost blocks). That trade is right for short interactive runs and for
  * local mode; it is wrong for a multi-hour 100 TB iteration where
  * executor churn is routine.
  *
  * The knob (one engine-wide switch, no per-op plumbing):
  *  - `spark.sparkContext.setCheckpointDir(dir)` set → `truncated`
  *    uses RELIABLE `Dataset.checkpoint` (files under `dir`, typically
  *    HDFS/S3): an executor loss recovers by re-reading the checkpoint
  *    files. Cost: each truncation point writes its frame to the dir
  *    (one extra compute + I/O per checkpoint — size the cadence
  *    accordingly; see PageRank.checkpointEvery).
  *  - no checkpoint dir (the default everywhere in tests/bench) →
  *    exactly the old `localCheckpoint` behavior, bit-for-bit.
  *  - `spark.graft.checkpoint.mode` overrides: `local` forces local
  *    blocks even with a dir set (a dir configured for some OTHER
  *    consumer must not tax every graph op); `reliable` asserts the
  *    dir is set and fails fast if not (protects a job that MUST be
  *    loss-tolerant from silently running local); `auto` (default) is
  *    the dir-presence rule above.
  *
  * Orthogonal invariant: mode changes WHERE truncated blocks live,
  * never WHAT the op computes — CheckpointModeSpec pins identical
  * output on both paths. Checkpoint files are reclaimed by Spark's
  * ContextCleaner when `spark.cleaner.referenceTracking.cleanCheckpoints`
  * is true, else they persist for post-mortem restart.
  */
object Checkpoints {

  private[graft] def useReliable(df: DataFrame): Boolean = {
    val spark = df.sparkSession
    val dirSet = spark.sparkContext.getCheckpointDir.isDefined
    spark.conf.getOption("spark.graft.checkpoint.mode")
      .getOrElse("auto") match {
      case "local" => false
      case "reliable" =>
        require(dirSet, "spark.graft.checkpoint.mode=reliable needs " +
          "SparkContext.setCheckpointDir — refusing to run loss-intolerant")
        true
      case _ => dirSet
    }
  }

  implicit class TruncateOps(private val df: DataFrame) extends AnyVal {
    /** Lazy lineage truncation under the engine checkpoint mode. */
    def truncated: DataFrame = truncated(eager = false)

    /** Lineage truncation under the engine checkpoint mode. */
    def truncated(eager: Boolean): DataFrame =
      if (useReliable(df)) df.checkpoint(eager)
      else df.localCheckpoint(eager)
  }
}
