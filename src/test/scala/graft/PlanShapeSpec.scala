package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

/** Plan-shape regression guards for the engine's load-bearing physical
  * choices. The oracle gate proves VALUES; these prove the PLANS — a
  * lost broadcast hint, a WindowGroupLimit that stops firing, or a
  * filter that no longer reaches the scan all stay value-correct while
  * silently reintroducing the scale pathologies the round notes document
  * (single-task pair stages, full-corpus shuffles, unpruned scans).
  */
class PlanShapeSpec extends SparkSuite with AdaptiveSparkPlanHelper {

  private def planOf(df: DataFrame): String = {
    df.count() // materialize so AQE finalizes the adaptive plan
    df.queryExecution.executedPlan.toString
  }

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)

  test("q01 scan carries pushed filters and a pruned schema") {
    val p = q("q01_pricing_summary").queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(2000))
    assert(!p.contains("l_comment"), "scan reads columns the query never uses")
  }

  test("per-group top-K plans as WindowGroupLimit (no full-group sort-rank)") {
    Seq("q12_topk_customers", "q13_confidence", "q22_peer_search").foreach { name =>
      val p = planOf(q(name))
      assert(p.contains("WindowGroupLimit"), s"$name lost its group-limit:\n${p.take(2000)}")
    }
  }

  test("pair-scoring joins broadcast the candidate side and spread the probe") {
    Seq("q76_media_fingerprint", "q20_haversine", "q31_token_jaccard").foreach { name =>
      val p = planOf(q(name))
      assert(p.contains("BroadcastHashJoin"), s"$name lost its broadcast:\n${p.take(2000)}")
      // the probe-side round-robin exchange must survive AQE coalescing —
      // without it the O(pairs) stage inherits the filtered scan's 1-2
      // partitions (the round-7 q76 pathology)
      assert(p.contains("RoundRobinPartitioning"),
        s"$name lost its probe-side repartition:\n${p.take(2000)}")
    }
  }

  test("bloom-pruned join filters the fact scan below the join") {
    // the resolved expression renders as might_contain(<sketch literal>)
    val p = planOf(q("q95_bloom_join"))
    assert(p.contains("might_contain("),
      s"bloom filter missing from the plan:\n${p.take(2000)}")
  }

  test("bm25 top-k is a TakeOrdered, not a global sort") {
    val p = planOf(q("q93_bm25"))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }
}
