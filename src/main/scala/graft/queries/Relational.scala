package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.{Dedup, Indexing, TopK}

/** Relational operator coverage (SURVEY.md §2.1-2.6): scans, projections,
  * filters, casts, conditionals, joins of every flavor the reference uses,
  * aggregations, windows, dedup, top-K, unions, sorts, surrogate indexing,
  * min-max scaling. Each query has a DuckDB oracle.
  */
object Relational {

  val defs: Seq[QueryDef] = Seq(

    // A2/A3/A8 + P6: grouped pricing summary (sum/avg/count per flag+status).
    QueryDef("q01_pricing_summary", Some("""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 4) AS sum_qty,
             round(sum(l_extendedprice), 4) AS sum_base_price,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
             round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
             round(avg(l_quantity), 4) AS avg_qty,
             round(avg(l_extendedprice), 4) AS avg_price,
             round(avg(l_discount), 6) AS avg_disc,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-06-30 00:00:00'
      GROUP BY l_returnflag, l_linestatus"""),
      (spark, dir) => {
        T(spark, dir, "lineitem")
          .filter(col("l_shipdate") <= to_timestamp(lit("2000-06-30 00:00:00")))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            round(sum(col("l_quantity")), 4).as("sum_qty"),
            round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 4).as("sum_charge"),
            round(avg(col("l_quantity")), 4).as("avg_qty"),
            round(avg(col("l_extendedprice")), 4).as("avg_price"),
            round(avg(col("l_discount")), 6).as("avg_disc"),
            count(lit(1)).as("count_order"))
      }),

    // P1/P2/P4: filter + projection + casts (predicate/projection pushed to scan).
    QueryDef("q02_filter_project", Some("""
      SELECT l_orderkey, l_linenumber,
             CAST(floor(l_quantity) AS INTEGER) AS qty_int,
             round(l_extendedprice * (1 + l_tax), 4) AS gross
      FROM lineitem
      WHERE l_quantity > 30 AND l_returnflag = 'R'"""),
      (spark, dir) =>
        T(spark, dir, "lineitem")
          .filter(col("l_quantity") > 30 && col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_linenumber"),
            floor(col("l_quantity")).cast("int").as("qty_int"),
            round(col("l_extendedprice") * (lit(1) + col("l_tax")), 4).as("gross"))),

    // P7/F1: null/negative-guarded log10 (reference revenue compression,
    // `search_ranking_peers.py:419-422`) + CASE banding.
    QueryDef("q03_conditional_log10", Some("""
      SELECT c_custkey,
             round(log10(CASE WHEN c_acctbal <= 0 OR c_acctbal IS NULL THEN 1.0 ELSE c_acctbal END), 6) AS log_bal,
             CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS bal_band
      FROM customer"""),
      (spark, dir) =>
        T(spark, dir, "customer").select(col("c_custkey"),
          round(log10(when(col("c_acctbal") <= 0 || col("c_acctbal").isNull, lit(1.0))
            .otherwise(col("c_acctbal"))), 6).as("log_bal"),
          when(col("c_acctbal") < 0, "neg")
            .when(col("c_acctbal") < 5000, "mid")
            .otherwise("high").as("bal_band"))),

    // A1: deterministic keyed dedup — first order per customer under a
    // total order (reference `groupBy.first` dedup with the row choice
    // made explicit; SURVEY.md §2.4 A1).
    QueryDef("q04_dedup_first", Some("""
      SELECT o_custkey, o_orderkey AS first_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS first_date,
             round(o_totalprice, 4) AS first_total
      FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
            FROM orders)
      WHERE rn = 1"""),
      (spark, dir) =>
        Dedup.firstPerKey(T(spark, dir, "orders"), Seq("o_custkey"),
            Seq(col("o_orderdate").asc, col("o_orderkey").asc))
          .select(col("o_custkey"), col("o_orderkey").as("first_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("first_date"),
            round(col("o_totalprice"), 4).as("first_total"))),

    // J3 + A2: two inner joins + grouped revenue per nation.
    QueryDef("q05_revenue_by_nation", Some("""
      SELECT n_name, round(sum(o_totalprice), 4) AS revenue, count(*) AS n_orders
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name"""),
      (spark, dir) =>
        T(spark, dir, "orders")
          .join(T(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(T(spark, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(round(sum(col("o_totalprice")), 4).as("revenue"),
            count(lit(1)).as("n_orders"))),

    // J2: broadcast-side dimension join (`search_ranking_peers.py:337`);
    // oracle is the plain join. The hint itself lives on the BOUNDED
    // brand dimension in Reports.scala (brandMeta, ≤25 rows at any SF);
    // here `part` grows with scale factor, so the side choice is left
    // to AQE — it broadcasts `part` while small and degrades to a
    // shuffle join past the threshold instead of hard-failing at 100 TB.
    QueryDef("q06_broadcast_join", Some("""
      SELECT p_brand, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
             count(*) AS n_items
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand"""),
      (spark, dir) =>
        T(spark, dir, "lineitem")
          .join(T(spark, dir, "part"), col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
            count(lit(1)).as("n_items"))),

    // J6: right outer join + null coalesce (reference
    // `inference_postprocess.py:73-76`): customers vs their big orders.
    QueryDef("q07_right_join", Some("""
      SELECT c_custkey, c_name,
             CAST(coalesce(n, 0) AS BIGINT) AS n_big_orders,
             round(coalesce(total, 0.0), 4) AS big_total
      FROM (SELECT o_custkey, count(*) AS n, sum(o_totalprice) AS total
            FROM orders WHERE o_totalprice > 300000 GROUP BY o_custkey) big
      RIGHT JOIN customer ON big.o_custkey = c_custkey"""),
      (spark, dir) => {
        val big = T(spark, dir, "orders")
          .filter(col("o_totalprice") > 300000)
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("total"))
        big.join(T(spark, dir, "customer"), col("o_custkey") === col("c_custkey"), "right")
          .select(col("c_custkey"), col("c_name"),
            coalesce(col("n"), lit(0L)).cast("long").as("n_big_orders"),
            round(coalesce(col("total"), lit(0.0)), 4).as("big_total"))
      }),

    // Left-semi join (EXISTS): customers with at least one 400k+ order.
    QueryDef("q08_semi_join", Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)"""),
      (spark, dir) => {
        val big = T(spark, dir, "orders").filter(col("o_totalprice") > 400000)
        T(spark, dir, "customer")
          .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
      }),

    // Left-anti join (NOT EXISTS): customers with no urgent orders.
    QueryDef("q09_anti_join", Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')"""),
      (spark, dir) => {
        val urgent = T(spark, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        T(spark, dir, "customer")
          .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
      }),

    // O5: union-by-name of two tagged projections
    // (`search_ranking_peers.py:469,559`).
    QueryDef("q10_union_bands", Some("""
      SELECT o_orderkey, 'high' AS band, round(o_totalprice, 4) AS total
      FROM orders WHERE o_totalprice > 350000
      UNION ALL
      SELECT o_orderkey, 'low' AS band, round(o_totalprice, 4) AS total
      FROM orders WHERE o_totalprice < 50000"""),
      (spark, dir) => {
        val o = T(spark, dir, "orders")
        val hi = o.filter(col("o_totalprice") > 350000)
          .select(col("o_orderkey"), lit("high").as("band"),
            round(col("o_totalprice"), 4).as("total"))
        val lo = o.filter(col("o_totalprice") < 50000)
          .select(col("o_orderkey"), lit("low").as("band"),
            round(col("o_totalprice"), 4).as("total"))
        hi.unionByName(lo)
      }),

    // W1: percent_rank usage preprocessing (`recommender_prod_rec.py:171-176`)
    // — rating = percent_rank within (user, event_type) + epsilon.
    QueryDef("q11_percent_rank", Some("""
      SELECT user_id, event_type, event_id,
             round(percent_rank() OVER (PARTITION BY user_id, event_type ORDER BY value, event_id) + 1e-6, 6) AS rating
      FROM events"""),
      (spark, dir) => {
        val w = Window.partitionBy("user_id", "event_type")
          .orderBy(col("value"), col("event_id"))
        T(spark, dir, "events").select(col("user_id"), col("event_type"), col("event_id"),
          round(percent_rank().over(w) + lit(1e-6), 6).as("rating"))
      }),

    // W2/O4: rank-gated top-K per group (`inference_postprocess.py:85-86`);
    // Spark ≥3.5 plans this as WindowGroupLimit (per-partition top-K heap).
    QueryDef("q12_topk_customers", Some("""
      SELECT c_mktsegment, c_custkey, round(c_acctbal, 4) AS acctbal,
             CAST(rnk AS INTEGER) AS rnk
      FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
                   rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rnk
            FROM customer)
      WHERE rnk <= 5"""),
      (spark, dir) =>
        TopK.perKey(T(spark, dir, "customer"), Seq("c_mktsegment"),
            Seq(col("c_acctbal").desc, col("c_custkey").asc), 5, "rnk")
          .select(col("c_mktsegment"), col("c_custkey"),
            round(col("c_acctbal"), 4).as("acctbal"), col("rnk").cast("int").as("rnk"))),

    // A6/A7: distinct projection.
    QueryDef("q16_distinct", Some("""
      SELECT DISTINCT c_mktsegment, c_nationkey FROM customer"""),
      (spark, dir) => T(spark, dir, "customer").select("c_mktsegment", "c_nationkey").distinct()),

    // A5/A8: scalar metrics pull (max/min/count/countDistinct in one row).
    QueryDef("q17_scalar_metrics", Some("""
      SELECT count(*) AS n_li,
             round(max(l_extendedprice), 4) AS max_price,
             round(min(l_extendedprice), 4) AS min_price,
             count(DISTINCT l_partkey) AS n_parts,
             round(avg(l_quantity), 6) AS avg_qty
      FROM lineitem"""),
      (spark, dir) =>
        T(spark, dir, "lineitem").agg(
          count(lit(1)).as("n_li"),
          round(max(col("l_extendedprice")), 4).as("max_price"),
          round(min(col("l_extendedprice")), 4).as("min_price"),
          countDistinct(col("l_partkey")).as("n_parts"),
          round(avg(col("l_quantity")), 6).as("avg_qty"))),

    // Surrogate ids (§7.4-6): contiguous 0-based ints under a total order
    // (replaces the reference's nondeterministic rdd.zipWithIndex).
    QueryDef("q18_surrogate_index", Some("""
      SELECT CAST(row_number() OVER (ORDER BY c_custkey) - 1 AS INTEGER) AS idx, c_custkey
      FROM customer"""),
      (spark, dir) =>
        Indexing.withRowIndex(T(spark, dir, "customer"), "idx", Seq(col("c_custkey").asc))
          .select("idx", "c_custkey")),

    // A9: describe()-equivalent summary statistics (count/mean/stddev/
    // min/max), computed explicitly so types and rounding are pinned.
    QueryDef("q15_summary_stats", Some("""
      SELECT 'o_totalprice' AS col_name,
             count(o_totalprice) AS n,
             round(avg(o_totalprice), 4) AS mean,
             round(stddev_samp(o_totalprice), 4) AS std,
             round(min(o_totalprice), 4) AS min_v,
             round(max(o_totalprice), 4) AS max_v
      FROM orders
      UNION ALL
      SELECT 'c_acctbal' AS col_name,
             count(c_acctbal) AS n,
             round(avg(c_acctbal), 4) AS mean,
             round(stddev_samp(c_acctbal), 4) AS std,
             round(min(c_acctbal), 4) AS min_v,
             round(max(c_acctbal), 4) AS max_v
      FROM customer"""),
      (spark, dir) => {
        def stats(t: String, c: String) =
          T(spark, dir, t).agg(
            count(col(c)).as("n"),
            round(avg(col(c)), 4).as("mean"),
            round(stddev_samp(col(c)), 4).as("std"),
            round(min(col(c)), 4).as("min_v"),
            round(max(col(c)), 4).as("max_v"))
            .select(lit(c).as("col_name"), col("n"), col("mean"),
              col("std"), col("min_v"), col("max_v"))
        stats("orders", "o_totalprice").unionByName(stats("customer", "c_acctbal"))
      }),

    // J7 + F2/F3: join on trim-normalized keys (reference normalizes
    // pup_measure_name with trim before the itemMap join,
    // `inference_postprocess.py:88-90`) + upper projection.
    QueryDef("q38_trim_join", Some("""
      WITH padded AS (
        SELECT DISTINCT '  ' || p_type || ' ' AS padded_type FROM part),
      agg AS (
        SELECT p_type, count(*) AS n_parts, round(avg(p_retailprice), 4) AS avg_price
        FROM part GROUP BY p_type)
      SELECT p.padded_type, upper(a.p_type) AS type_upper, a.n_parts, a.avg_price
      FROM padded p JOIN agg a ON trim(p.padded_type) = a.p_type"""),
      (spark, dir) => {
        val p = T(spark, dir, "part")
        val padded = p.select(concat(lit("  "), col("p_type"), lit(" ")).as("padded_type")).distinct()
        val agg = p.groupBy("p_type")
          .agg(count(lit(1)).as("n_parts"), round(avg(col("p_retailprice")), 4).as("avg_price"))
        padded.join(agg, trim(col("padded_type")) === col("p_type"))
          .select(col("padded_type"), upper(col("p_type")).as("type_upper"),
            col("n_parts"), col("avg_price"))
      }),

    // M6-equivalent min-max scaling as pure SQL ((x-min)/(max-min) over the
    // whole frame) — the ML-parity MinMaxScaler path is tested in ScalaTest.
    QueryDef("q19_minmax_scale", Some("""
      SELECT c_custkey,
             round((c_acctbal - min(c_acctbal) OVER ()) / (max(c_acctbal) OVER () - min(c_acctbal) OVER ()), 6) AS acctbal_scaled
      FROM customer"""),
      (spark, dir) =>
        graft.ops.Scale.minmax(T(spark, dir, "customer"), "c_acctbal", "__scaled")
          .select(col("c_custkey"), round(col("__scaled"), 6).as("acctbal_scaled")))
  )
}
