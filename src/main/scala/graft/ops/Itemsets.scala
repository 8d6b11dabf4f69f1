package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A-priori frequent-itemset mining, level-wise to size 3 (Agrawal &
  * Srikant, VLDB'94). q157/q196 stop at frequent PAIRS (the bought-
  * together surface); this climbs one level with the pruning that
  * makes level 3 feasible at scale: a triple can only be frequent if
  * ALL THREE of its sub-pairs are, so candidates are generated from
  * the (small) frequent-pair set — never enumerated per basket, where
  * a 10k-item hub basket alone would emit C(10k,3) ≈ 10^11 rows.
  *
  * The pruning is EXACT (downward closure), so the output is identical
  * to brute-force enumeration and the DuckDB oracle replays the same
  * level-wise CTEs — a full hash gate, not an approximation bound.
  *
  * Scale shape: level 1 is a partial-agg'd item count; level 2 rides
  * [[Cooccur.groupPairs]] (hub-salted, collision-only pair space);
  * level 3 joins candidates back to the filtered basket rows with
  * three (basket, item) equi-joins — work scales with |candidates| ×
  * avg support, not with basket sizes cubed. Every shuffle is keyed on
  * item or basket ids (8-byte keys).
  */
object Itemsets {

  /** Frequent (pa < pb < pc) triples with support >= minSupport.
    * `baskets` rows are (basketCol, itemCol); duplicates within a
    * basket are collapsed.
    */
  def frequentTriples(baskets: DataFrame, basketCol: String,
                      itemCol: String, minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val b = baskets.select(col(basketCol).as("c"), col(itemCol).as("p"))
      .distinct()
    val f1 = b.groupBy("p").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minSupport).select("p")
    // left_semi keeps bf lean; infrequent items can never contribute.
    // bf feeds FIVE consumers (both sides of the pair self-join and the
    // three support joins) and f2 three (prefix join twice + closure
    // check) — cache both or each reuse re-runs the whole basket build.
    // Plain cache(), not localCheckpoint: recompute-safe after the
    // caller's withQueryCaches scope releases the blocks.
    val bf = b.join(f1, Seq("p"), "left_semi").cache()

    val f2 = Cooccur.groupPairs(bf, "c", "p")
      .groupBy("pa", "pb").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minSupport)
      .select("pa", "pb")
      .cache()

    // Candidate triples: prefix-join two frequent pairs sharing the
    // middle item, then the downward-closure check on the third pair.
    val cand = f2.select(col("pa"), col("pb"))
      .join(f2.select(col("pa").as("pb"), col("pb").as("pc")), Seq("pb"))
      .join(f2.select(col("pa"), col("pb").as("pc")), Seq("pa", "pc"),
        "left_semi")
      .select("pa", "pb", "pc")
      .cache() // feeds the item-set prefilter AND the anchor join

    // Support count: anchor each candidate at its first item's basket
    // rows, then require the other two items in the same basket.
    // The basket frame is first semi-joined down to CANDIDATE items:
    // the candidate item set is ≤ 3·|cand| — small by the very point
    // of level-wise pruning — while bf spans every frequent item, so
    // without the prefilter the two (item, basket) semi-joins below
    // shuffled the ENTIRE basket frame twice to probe a handful of
    // candidate rows (measured at sf0.1: 2 full 600k-row exchanges for
    // 219 anchored rows / 7 candidates). Work now scales with
    // candidate-relevant basket rows, not |bf| (guide-style semi-join
    // pre-filter; AQE broadcasts the item set at runtime).
    // one reference to cand (explode, not a 3-way union of selects):
    // keeps the analyzed plan linear — the union form nested the
    // candidate subtree 3x into every bfc consumer below
    val candItems = cand
      .select(explode(array(col("pa"), col("pb"), col("pc"))).as("p"))
      .distinct()
    // cached: three consumers below (anchor + two semi probes), each a
    // scan of this candidate-items-only sliver
    val bfc = bf.join(candItems, Seq("p"), "left_semi").cache()
    cand
      .join(bfc.select(col("p").as("pa"), col("c")), Seq("pa"))
      .join(bfc.select(col("p").as("pb"), col("c")), Seq("pb", "c"),
        "left_semi")
      .join(bfc.select(col("p").as("pc"), col("c")), Seq("pc", "c"),
        "left_semi")
      .groupBy("pa", "pb", "pc").agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .select(col("pa"), col("pb"), col("pc"),
        col("support").cast("int").as("support"))
  }
}
