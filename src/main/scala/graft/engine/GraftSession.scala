package graft.engine

import org.apache.spark.sql.SparkSession

/** Session-lifetime helpers for library (non-batch) callers.
  *
  * Several query builders cache a multi-consumed intermediate — LSH
  * signature tables (`llm/SimSearch.scala`), fingerprint relations
  * (`queries/Media.scala`), min-max'd usage (`queries/Reports.scala`),
  * SimHash signatures (`llm/DedupOps.scala`) — and hand back a LAZY
  * frame, so the builder cannot unpersist before the caller's action
  * without defeating the cache. In a one-query-per-JVM batch run (the
  * bench, the Verify dump) that's fine: the session dies with the query.
  * A resident service composing many queries in one session would
  * accumulate pinned storage instead.
  *
  * [[withQueryCaches]] is that service's contract: wrap each query's
  * CONSUMING action (write, collect, count) in the scope, and every RDD
  * persisted during the block — including by MLlib internals — is
  * released when it exits. Do not reuse frames built inside the scope
  * after it exits: plain caches recompute correctly (just slower), but a
  * `localCheckpoint` truncates lineage and cannot.
  */
object GraftSession {

  /** Run `f`, then unpersist every RDD that was persisted during it.
    * Release is storage-level (blocks freed, entries removed from the
    * persistent-RDD registry); `blocking = false` so scope exit never
    * stalls on executor round-trips.
    */
  def withQueryCaches[T](spark: SparkSession)(f: => T): T = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    try f
    finally sc.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!before.contains(id)) rdd.unpersist(blocking = false)
    }
  }
}
