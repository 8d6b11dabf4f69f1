package graft.queries

import org.apache.spark.sql.functions._
import graft.feature.FeaturePipeline
import graft.rec.AlsPipeline

/** ML-pipeline queries. Not DuckDB-expressible (iterative MLlib fits) —
  * registered without oracles (driver records a rows-only check);
  * statistical correctness lives in the ScalaTest specs (SURVEY.md §5.4).
  */
object ML {

  val defs: Seq[QueryDef] = Seq(

    // ALS end-to-end: usage triples (customer × part-brand intensity) →
    // surrogate ids → implicit ALS → top-5 recs per user, joined back to
    // the entity maps.
    QueryDef("q40_als_recommend", None, (spark, dir) => {
      // Item universe is brand-level (FIXTURES.md: products ≈ part ⋈
      // lineitem), matching the reference's SKU-scale item space.
      val usage = T(spark, dir, "orders")
        .join(T(spark, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(T(spark, dir, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy(col("o_custkey").as("cust"), col("p_brand").as("item"))
        .agg(sum(col("l_quantity")).as("intensity"))
      val rated = AlsPipeline.accumulate(usage, "cust", "item", "intensity")
      val triples = AlsPipeline.indexedTriples(rated, "cust", "item")
      val model = AlsPipeline.train(triples, AlsPipeline.Config())
      // Direct path: the brand item space fits a broadcast, so blockified
      // recommendForAllUsers is pure overhead (see recommendationsDirect;
      // MlSpec pins score parity between the two paths).
      AlsPipeline.recommendationsDirect(model, 5)
        .select(col("userId"), col("itemId"), round(col("score"), 3).as("score"),
          col("rec_rank"))
    }),

    // Reference flagship §3.1 end-to-end: clean → literal prospect →
    // impute → dedup → index/batch → weighted features → blended
    // similarity → top-K → report. Imputer's approx-median makes it
    // non-oracle-able; determinism is ScalaTest-checked.
    QueryDef("q44_peer_search_flow", None, (spark, dir) =>
      graft.flows.PeerSearchFlow.run(spark, dir,
        graft.flows.PeerSearchFlow.Config(minBatch = 2))),

    // Feature pipeline end-to-end: nulls injected → median impute →
    // string-index + OHE → min-max scale → weighted assembly.
    QueryDef("q41_feature_pipeline", None, (spark, dir) => {
      val withNulls = T(spark, dir, "customer")
        .withColumn("acctbal",
          when(col("c_custkey") % 37 === 0, lit(null).cast("double"))
            .otherwise(col("c_acctbal")))
        .withColumn("nation_d", col("c_nationkey").cast("double"))
      val out = FeaturePipeline.build(withNulls,
        numCols = Seq("acctbal", "nation_d"), catCol = "c_mktsegment",
        weights = Map("acctbal" -> 0.8, "nation_d" -> 0.2), wCat = 0.05)
      // Canonical string form: the driver's rows-only check sorts the
      // result in pandas, which can't order raw array columns.
      out.select(col("c_custkey"),
        // nullReplacement keeps a (never-expected) null element visible
        // instead of silently shifting positions in the canonical string.
        array_join(transform(col("features_arr"), v => round(v, 6)), ",", "null")
          .as("features"))
    })
  )
}
