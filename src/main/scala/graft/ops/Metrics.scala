package graft.ops

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Job-time metrics without extra passes.
  *
  * The reference keeps a driver-side metrics dict of stage row counts
  * (`recommender_prod_rec.py:58-61,178` — each entry is a separate
  * `df.count()`, i.e. a full re-execution per metric). The Spark-native
  * equivalent is the Observation API: named aggregates are accumulated
  * DURING the action that runs the query anyway, so instrumentation
  * costs zero additional jobs — the only form that survives at 100 TB.
  */
object Metrics {

  /** Attach a named observation computing `exprs` (default: row count)
    * to `df`. After any action on the returned frame,
    * `observation.get` yields the metric map.
    */
  def observe(df: DataFrame, name: String): (DataFrame, Observation) = {
    val obs = Observation(name)
    (df.observe(obs, count(lit(1)).as("rows")), obs)
  }

  /** Multi-metric variant: rows + per-column null counts — the data
    * quality counters a pipeline stage reports.
    */
  def observeQuality(df: DataFrame, name: String, cols: Seq[String]): (DataFrame, Observation) = {
    val obs = Observation(name)
    val metrics = count(lit(1)).as("rows") +:
      cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
