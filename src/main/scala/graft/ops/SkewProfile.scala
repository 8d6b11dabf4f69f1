package graft.ops

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** Process-wide cache of per-(relation, key) hub profiles — the skew
  * routing asset behind the co-occurrence family ([[Cooccur]], q157/
  * q166/q196/q203/q215).
  *
  * Why it exists: the hub guard needs the set of group keys whose
  * cardinality exceeds the fragment-replicate threshold. That is a
  * property of the INPUT RELATION and the KEY — not of the query — yet
  * before this cache every `groupPairs` call paid its own eager
  * groupBy-count + bounded collect over the full input (and paid it
  * AGAIN whenever the plan was re-constructed, e.g. through the
  * `graft_group_pairs` SQL table function's analyzer resolution). Five
  * family queries over the same `lineitem` projection = five identical
  * full scans. At 100 TB a redundant pre-scan per query is real money;
  * here it is computed once per (relation, key, threshold) and shared
  * by every subsequent construction in the process.
  *
  * Keying: the ANALYZED, CANONICALIZED logical plan's structure plus
  * the root paths of every file-backed leaf. Canonicalization
  * normalizes expression ids, so two independently-constructed reads
  * of the same parquet path with the same projection produce the same
  * key; the leaf paths keep distinct tables with identical shapes
  * apart (`LogicalRelation` equality is object identity per FileIndex,
  * which is why the raw plan cannot be the key). Literal/local
  * relations key by their data-bearing hashCode.
  *
  * Safety: the profile is ADVISORY — [[Cooccur]] emits row-identical
  * output on both routing paths, so a stale or colliding entry can
  * only cost performance, never correctness (CooccurSpec pins path
  * equality). Callers whose underlying files changed in-process call
  * [[invalidate]]. The cache is bounded (clear-all past
  * [[MaxEntries]]) and each entry is at most [[MaxHubs]] group keys —
  * hubs are pathological outliers by definition, so entries are tiny.
  */
object SkewProfile {

  /** Hard cap on hub keys per profile: if more than this many groups
    * exceed the threshold, the threshold is wrong, not the data.
    */
  val MaxHubs = 10000

  /** Cache-size bound; overflow clears the whole map (profiles are
    * cheap to recompute and this path should never be hit in practice).
    */
  val MaxEntries = 256

  private val cache = new ConcurrentHashMap[String, Seq[Any]]()

  /** Profile computations actually executed (spec observability: a
    * cache hit leaves this untouched).
    */
  private[graft] val computes = new AtomicLong(0)

  /** The group keys of `df` whose group size exceeds `hubThreshold`,
    * computed once per (relation-structure, key, threshold) and cached
    * for the life of the process.
    */
  def hubIds(df: DataFrame, groupCol: String, hubThreshold: Int): Seq[Any] = {
    val key = fingerprint(df) + "|g=" + groupCol + "|t=" + hubThreshold
    if (cache.size > MaxEntries) cache.clear()
    // NOT computeIfAbsent: compute() runs a full Spark job, and
    // computeIfAbsent would hold the map's bin lock for its whole
    // duration, serializing unrelated callers that hash to the same
    // bin. get → compute → putIfAbsent tolerates the rare duplicate
    // pass (profiles are pure; first writer wins) and never blocks
    // anyone on a collect.
    val hit = cache.get(key)
    if (hit != null) hit
    else {
      val computed = compute(df, groupCol, hubThreshold)
      val prev = cache.putIfAbsent(key, computed)
      if (prev != null) prev else computed
    }
  }

  /** Drop every cached profile (tests; in-process file mutation). */
  def invalidate(): Unit = cache.clear()

  private def compute(df: DataFrame, groupCol: String,
                      hubThreshold: Int): Seq[Any] = {
    computes.incrementAndGet()
    // one partial-aggregated pass; the pull is bounded and tiny — hubs
    // are outliers, and the require enforces that they stay outliers
    val ids = df.groupBy(groupCol).agg(count(lit(1)).as("__gsz"))
      .filter(col("__gsz") > hubThreshold).select(groupCol)
      .limit(MaxHubs + 1).collect().map(_.get(0)).toSeq
    require(ids.size <= MaxHubs,
      s"more than $MaxHubs groups exceed hubThreshold=$hubThreshold — raise the threshold")
    ids
  }

  /** Structural identity of a frame's analyzed plan: canonicalized
    * tree (expression ids normalized) + file-leaf root paths + local-
    * relation data hashes. Structure alone would alias distinct tables
    * with identical shapes; paths alone would alias distinct
    * projections of one table.
    */
  private def fingerprint(df: DataFrame): String = {
    val plan = df.queryExecution.analyzed.canonicalized
    val leaves = plan.collectLeaves().map {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => "fs:" + fs.location.rootPaths.mkString(",")
        case other => "rel:" + other.toString
      }
      // LocalRelation is a case class over its rows: hashCode is
      // data-bearing, so two literal tables collide only when equal
      case l: LocalRelation => "local:" + l.hashCode
      case other => other.nodeName + ":" + other.hashCode
    }
    // Untruncated tree: the no-arg treeString elides node fields past
    // spark.sql.debug.maxToStringFields (default 25), so two distinct
    // wide projections of one file could alias a profile — harmless for
    // routing (output is path-identical) but it could aim the MaxHubs
    // fail-fast at the wrong relation. maxFields = MaxValue keys on the
    // full canonical structure.
    plan.treeString(verbose = true, addSuffix = false,
      maxFields = Int.MaxValue, printOperatorId = false) +
      "|" + leaves.mkString(";")
  }
}
