package graft

import org.apache.spark.sql.SparkSession

/** The engine's session entry point: a SparkSession.Builder preloaded
  * with the configuration the library is designed around. Library users
  * call `GraftSession.builder(...)` instead of rebuilding the config
  * story by hand; every knob remains overridable on the returned builder.
  *
  * What it sets and why:
  *  - `spark.sql.extensions = GraftExtensions` — SQL-callable custom
  *    expressions (dot product, minhash) and the range-join rewrite rule;
  *  - `spark.sql.shuffle.partitions = cores` for local mode (the 200
  *    default over-partitions a single machine; clusters pass their own);
  *  - AQE `coalescePartitions.minPartitionSize = 16k` — keeps
  *    tiny-but-exploding map stages wide (see SCALE.md, "Optimizer
  *    interactions");
  *  - UTC session timezone — deterministic date math across deployments.
  */
object GraftSession {

  def builder(cores: Int = Runtime.getRuntime.availableProcessors(),
              local: Boolean = true): SparkSession.Builder = {
    val b = SparkSession.builder()
      .config("spark.sql.extensions", classOf[graft.engine.GraftExtensions].getName)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
    if (local) b.master(s"local[$cores]").config("spark.sql.shuffle.partitions", cores)
    else b
  }
}
