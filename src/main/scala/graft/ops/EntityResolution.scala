package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.engine.expressions.JaroWinkler

/** Fuzzy entity resolution: blocked Jaro-Winkler record linkage +
  * canonicalization over the resulting match graph.
  *
  * The reference's entity-matching surface is exact after trim/upper
  * normalization (prod-recommendation-pyspark utils/transforms.py —
  * the J7 trim-normalized join, q38); this is the graded upgrade every
  * production catalog eventually needs: "Jon's Pizza" vs "Jons Pizza"
  * never string-equal. The shape is the record-linkage standard —
  * block, band, verify:
  *
  *  - '''block''': candidates must share a cheap deterministic block key
  *    (first character, phonetic code, …). The self-join shuffles each
  *    block's slice only — never the entity table against itself.
  *  - '''band''': a length filter inside the block (|len(a) − len(b)| ≤
  *    maxLenDiff) — a JW score ≥ t implies near-equal lengths, so the
  *    band only discards pairs that could not pass.
  *  - '''verify''': the codegen'd [[JaroWinkler]] expression scores the
  *    surviving candidates; only pairs ≥ threshold ship.
  *
  * 100 TB shape: the join is a shuffle on the block key, so block-key
  * cardinality is the parallelism and the largest block is the skew
  * bound (profile with q140, salt with [[Salt]] if one block dominates).
  * Entity VOCABULARIES (distinct names) are orders of magnitude smaller
  * than fact tables — resolve the vocabulary, then broadcast-map facts
  * to canonical ids.
  */
object EntityResolution {

  /** Fuzzy self-pairs over `entities` (one row per distinct entity
    * name): pairs with the same `blockKey`, length within `maxLenDiff`,
    * and Jaro-Winkler(nameA, nameB) ≥ `threshold`. Output columns:
    * `name_a < name_b` (each pair once) and `jw_sim`, the raw score.
    */
  def blockedFuzzyPairs(entities: DataFrame, nameCol: String,
                        blockKey: Column, threshold: Double,
                        maxLenDiff: Int = 3): DataFrame = {
    JaroWinkler.register(entities.sparkSession)
    val a = entities.select(col(nameCol).as("name_a"),
      blockKey.as("__blk"), length(col(nameCol)).as("__la"))
    val b = entities.select(col(nameCol).as("name_b"),
      blockKey.as("__blk"), length(col(nameCol)).as("__lb"))
    a.join(b, Seq("__blk"))
      .filter(col("name_a") < col("name_b") &&
        abs(col("__la") - col("__lb")) <= maxLenDiff)
      .withColumn("jw_sim", JaroWinkler.jaroWinkler(col("name_a"), col("name_b")))
      .filter(col("jw_sim") >= threshold)
      .select(col("name_a"), col("name_b"), col("jw_sim"))
  }

  /** Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD'95) —
    * the classic complement to [[blockedFuzzyPairs]]' key blocking:
    * entities sort globally by `sortKey` and every pair within a
    * sliding window of `window` consecutive ranks becomes a candidate.
    * Where an equality block key misses any pair that disagrees on the
    * key (a FIRST-character typo escapes first-letter blocking
    * entirely), the sort brings near-misses adjacent — run it with a
    * key that sorts the error's locus last (e.g. `reverse(name)` for
    * prefix typos) or multi-pass with several keys and union.
    *
    * Scale shape: the global rank is the distributed two-pass
    * zipWithIndex ([[GlobalRank.withRowNumber]] — range-partitioned
    * sort, no single-task window); candidates replicate each row
    * window−1 times and meet on RANK EQUALITY (8-byte keys,
    * collision-only shuffle) — total candidate count is exactly
    * (n − window/2)·(window − 1), linear in n, never quadratic. Each
    * unordered pair is generated once (ranks are unique), then scored
    * with the codegen Jaro-Winkler.
    *
    * @return (name_a < name_b, jw_sim ≥ threshold)
    */
  def sortedNeighborhoodPairs(entities: DataFrame, nameCol: String,
                              sortKey: Column, window: Int,
                              threshold: Double): DataFrame = {
    require(window >= 2, s"window must be at least 2, got $window")
    JaroWinkler.register(entities.sparkSession)
    val ranked = GlobalRank.withRowNumber(
      entities.select(col(nameCol), sortKey.as("__sk")), "__rn",
      Seq(col("__sk"), col(nameCol)))
    val a = ranked.select(col(nameCol).as("__na"),
      explode(sequence(col("__rn") + 1, col("__rn") + (window - 1))).as("__rb"))
    val b = ranked.select(col(nameCol).as("__nb"), col("__rn").as("__rb"))
    a.join(b, "__rb")
      .select(least(col("__na"), col("__nb")).as("name_a"),
        greatest(col("__na"), col("__nb")).as("name_b"))
      // strict: duplicate input names would otherwise emit (x, x)
      // self-pairs at jw 1.0 (the blockedFuzzyPairs contract)
      .filter(col("name_a") < col("name_b"))
      .withColumn("jw_sim", JaroWinkler.jaroWinkler(col("name_a"), col("name_b")))
      .filter(col("jw_sim") >= threshold)
  }

  /** Cross-table fuzzy LOOKUP — the other half of record linkage: a
    * dirty probe feed (misspellings, OCR output, user input) matched
    * against a clean canonical directory, each probe resolved to its
    * single best directory entry (highest Jaro-Winkler, ties to the
    * lexicographically smallest name). Same block+band candidate
    * generation as [[blockedFuzzyPairs]]; probes whose block key has no
    * directory counterpart simply don't match (the recall cost
    * [[blockingQuality]] measures). Top-1 plans as WindowGroupLimit via
    * [[TopK.exactPerKey]] — no full sort of the candidate set.
    */
  def fuzzyLookup(probes: DataFrame, probeCol: String,
                  directory: DataFrame, dirCol: String,
                  blockOf: Column => Column, threshold: Double,
                  maxLenDiff: Int = 3): DataFrame = {
    JaroWinkler.register(probes.sparkSession)
    val p = probes.select(col(probeCol)).distinct()
      .select(col(probeCol), blockOf(col(probeCol)).as("__blk"),
        length(col(probeCol)).as("__lp"))
    val d = directory.select(col(dirCol)).distinct()
      .select(col(dirCol).as("__dn"), blockOf(col(dirCol)).as("__blk"),
        length(col(dirCol)).as("__ld"))
    val cand = p.join(d, Seq("__blk"))
      .filter(abs(col("__lp") - col("__ld")) <= maxLenDiff)
      .withColumn("jw_sim", JaroWinkler.jaroWinkler(col(probeCol), col("__dn")))
      .filter(col("jw_sim") >= threshold)
    TopK.exactPerKey(cand, Seq(probeCol),
        Seq(col("jw_sim").desc, col("__dn").asc), 1, "__r")
      .select(col(probeCol), col("__dn").as("matched"), col("jw_sim"))
  }

  /** Blocking-quality metrics — the two numbers that justify (or
    * condemn) a blocking scheme before it runs at scale:
    *
    *  - '''pair completeness''' (blocking recall): the fraction of TRUE
    *    match pairs (JW ≥ threshold, no blocking) that the block+band
    *    candidate generation retains. Lost pairs are unrecoverable —
    *    verify never sees them.
    *  - '''reduction ratio''': 1 − candidates/allPairs — how much of
    *    the quadratic comparison space the scheme discards.
    *
    * Ground truth needs the unblocked quadratic join, so this runs on
    * the ENTITY VOCABULARY (or a sample of it) — the standard ER
    * evaluation protocol; never point it at a fact table. One row out.
    *
    * That contract is ENFORCED, not advisory: the distinct-name count
    * is gated by `maxEntities` before the quadratic stage is built, so
    * pointing this at a fact table fails fast with the pair count it
    * would have attempted instead of silently launching n² comparisons.
    * The pre-flight count is one narrow extra job — the right trade
    * for an evaluation-protocol operator whose body is quadratic.
    * Raise the cap deliberately, or pre-sample the vocabulary, when a
    * larger ground-truth set is the point.
    */
  def blockingQuality(entities: DataFrame, nameCol: String,
                      blockKey: Column, threshold: Double,
                      maxLenDiff: Int = 3,
                      maxEntities: Long = 100000L): DataFrame = {
    JaroWinkler.register(entities.sparkSession)
    // cached: the pre-flight count fills it, and both cross-join sides
    // read it — without the cache the distinct aggregation would run
    // three times per call. Released below once the one-row result is
    // materialized (the canonicalize lazy-return-cache idiom).
    val e = entities.select(col(nameCol)).distinct().cache()
    val n = e.count()
    if (n > maxEntities) {
      e.unpersist()
      throw new IllegalArgumentException(
        s"requirement failed: blockingQuality is an all-pairs ground-truth" +
          s" evaluation: $n distinct names would mean ~${n * (n - 1) / 2}" +
          s" JW comparisons (cap $maxEntities). Sample the entity" +
          s" vocabulary first, or raise maxEntities deliberately.")
    }
    val a = e.select(col(nameCol).as("name_a"), blockKey.as("__ba"),
      length(col(nameCol)).as("__la"))
    val b = e.select(col(nameCol).as("name_b"), blockKey.as("__bb"),
      length(col(nameCol)).as("__lb"))
    val all = a.crossJoin(b).filter(col("name_a") < col("name_b"))
      .withColumn("cand", col("__ba") === col("__bb") &&
        abs(col("__la") - col("__lb")) <= maxLenDiff)
      .withColumn("isTrue",
        JaroWinkler.jaroWinkler(col("name_a"), col("name_b")) >= threshold)
    val out = all.agg(
      count(lit(1)).as("n_all_pairs"),
      sum(when(col("cand"), 1L).otherwise(0L)).as("n_candidates"),
      sum(when(col("isTrue"), 1L).otherwise(0L)).as("n_true_pairs"),
      sum(when(col("cand") && col("isTrue"), 1L).otherwise(0L)).as("n_blocked_true"))
      .select(col("n_all_pairs"), col("n_candidates"), col("n_true_pairs"),
        col("n_blocked_true"),
        round(col("n_blocked_true").cast("double")
          / greatest(col("n_true_pairs"), lit(1L)), 6).as("pair_completeness"),
        round(lit(1.0) - col("n_candidates").cast("double")
          / col("n_all_pairs"), 6).as("reduction_ratio"))
      // one row out: cache + eager fill while `e` is still cached, so
      // the vocabulary cache can be released HERE (the canonicalize
      // lazy-return-cache idiom) instead of leaking per call
      .cache()
    out.count()
    e.unpersist()
    out
  }

  /** Canonical-name mapping from a fuzzy pair graph: connected
    * components over the match pairs, canonical = the lexicographically
    * smallest name in each component (singletons map to themselves).
    *
    * Names are keyed by a global row number in name order
    * ([[GlobalRank.withRowNumber]] — distributed, no unpartitioned
    * window), so component roots (min id) ARE min names and the
    * propagation runs on 8-byte ids, not strings — the same
    * hash-the-exchange discipline as the set-sim joins.
    */
  def canonicalize(entities: DataFrame, nameCol: String,
                   pairs: DataFrame): DataFrame = {
    val ids = GlobalRank.withRowNumber(
      entities.select(col(nameCol)).distinct(), "__id", Seq(col(nameCol)))
      .cache()
    val edges = pairs
      .join(ids.select(col(nameCol).as("name_a"), col("__id").as("id_a")), "name_a")
      .join(ids.select(col(nameCol).as("name_b"), col("__id").as("id_b")), "name_b")
      .select(col("id_a"), col("id_b"))
    val comps = ConnectedComponents.labelPropagation(edges, "id_a", "id_b")
    val out = ids
      .join(comps.withColumnRenamed("node", "__id"), Seq("__id"), "left")
      .join(ids.select(col("__id").as("component"), col(nameCol).as("canonical")),
        Seq("component"), "left")
      .select(col(nameCol),
        coalesce(col("canonical"), col(nameCol)).as("canonical"))
      // lazy-return cache, eagerly filled while `ids` is still cached,
      // so `ids` can be released HERE instead of pinning one RDD per
      // micro-batch for a stream's lifetime. Plain cache, NOT a
      // localCheckpoint: lineage stays intact, so a lost block (or a
      // withQueryCaches sweep) recomputes instead of failing, at the
      // cost of re-running the id ranking in that rare path.
      .cache()
    out.count()
    ids.unpersist(blocking = false)
    out
  }
}
