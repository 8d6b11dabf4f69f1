package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Threshold-free binary-classifier evaluation: AUC-ROC via the
  * Mann–Whitney rank-sum identity and the Kolmogorov–Smirnov statistic
  * — the two standard "is this score any good" gates a training-data
  * pipeline runs before a scorer ships (the reference ranks peers by a
  * blended score, search_ranking_peers.py:198-226; these are the
  * metrics such a scorer is graded with).
  *
  * Exactness: the textbook computation sorts all n rows and averages
  * tied ranks — an unpartitioned window at scale. Instead, rows
  * collapse to one row PER DISTINCT SCORE (count, positives), ranks
  * come from exclusive prefix sums over that grouped frame
  * ([[PrefixSum.withRunningSum]], two-phase — no single-task sort),
  * and both statistics reduce to INTEGER arithmetic:
  *
  *   2·rank_avg(g) = 2·prefix_n(g) + n(g) + 1          (ties exact)
  *   2U            = Σ_g np(g)·(2·prefix_n(g)+n(g)+1) − P(P+1)
  *   AUC           = 2U / (2PN)
  *   KS            = max_g |cumpos(g)·N − cumneg(g)·P| / (PN)
  *
  * so the only floats are two final divisions — order-independent and
  * bit-reproducible in any engine (the DuckDB oracle replays the same
  * integers). The O(n²) products are taken in decimal(38,0), not Long:
  * Long wraps silently past ~3e9 rows while decimal stays exact to
  * 1e38, matching DuckDB's HUGEINT at any realistic scale. AUC is P(score⁺ > score⁻) + ½·P(score⁺ = score⁻), the
  * tie-corrected Mann–Whitney form; KS is the max CDF gap taken at
  * group boundaries, where it is always attained.
  *
  * 100 TB: one partial-agg'd groupBy(score); everything after runs on
  * |distinct scores| rows; one row crosses the driver per partition in
  * each prefix pass.
  */
object Eval {

  /** One-row frame (n_pos, n_neg, auc, ks) for `labelCol` (boolean —
    * true = positive) scored by `scoreCol` (any orderable numeric).
    * Requires at least one positive and one negative row.
    */
  def aucKs(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val grouped = df
      .select(col(scoreCol).as("__s"),
        col(labelCol).cast("boolean").as("__y"))
      .groupBy("__s")
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__np"))
    // Two exclusive prefix sums over the same score order: total count
    // (for average ranks) and positive count (for the KS cumulatives).
    val p1 = PrefixSum.withRunningSum(
      grouped, "__n", "__pn", Seq(col("__s").asc))
    // cache(): p2 feeds both the totals aggregate and the main select,
    // and each prefix pass collects per-partition subtotals at
    // construction — without the cache the grouped scan and both passes
    // re-execute per downstream action. Released by the caller's
    // withQueryCaches scope (the Itemsets/LinkPrediction idiom).
    val p2 = PrefixSum.withRunningSum(
      p1, "__np", "__pp", Seq(col("__s").asc)).cache()
    // The rank-sum and KS terms are O(n²) integer products; summed as
    // Long they would wrap silently past ~3e9 rows, so every product is
    // taken in decimal(38,0) (exact to 1e38 — far beyond any real row
    // count; DuckDB's HUGEINT oracle agrees term-for-term).
    val dec = "decimal(38,0)"
    val totals = p2.agg(
      sum(col("__np")).as("pos"),
      sum(col("__n") - col("__np")).as("neg"),
      sum(col("__np").cast(dec) *
          (lit(2L) * col("__pn") + col("__n") + lit(1L)))
        .cast(dec).as("two_u_plus"))
    p2
      .select(col("__n"), col("__np"), col("__pn"), col("__pp"))
      .crossJoin(broadcast(totals)) // one-row broadcast, the Hits/Scale idiom
      .select(col("pos"), col("neg"), col("two_u_plus"),
        abs((col("__pp") + col("__np")).cast(dec) * col("neg") -
          (col("__pn") + col("__n") - col("__pp") - col("__np")).cast(dec) *
            col("pos"))
          .as("__ksnum"))
      .groupBy("pos", "neg", "two_u_plus")
      .agg(max(col("__ksnum")).as("ks_num"))
      .select(
        col("pos").as("n_pos"), col("neg").as("n_neg"),
        round((col("two_u_plus") - col("pos").cast(dec) * (col("pos") + 1))
          .cast("double") / (lit(2.0) * col("pos") * col("neg")), 6)
          .as("auc"),
        round(col("ks_num").cast("double") /
          (col("pos").cast("double") * col("neg")), 6)
          .as("ks"))
  }
}
