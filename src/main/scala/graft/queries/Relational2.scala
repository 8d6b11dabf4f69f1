package graft.queries

import org.apache.spark.sql.functions._

/** Beyond-the-reference relational breadth: multi-dimensional aggregates,
  * set operations, pivots, date/string scalar surfaces, and a shared-SQL
  * query (identical text runs on Spark SQL and the DuckDB oracle).
  */
object Relational2 {

  /** One SQL text, two engines (Spark `spark.sql` + DuckDB oracle). */
  private val sharedSql: String = """
      SELECT r_name, count(*) AS n_orders, round(sum(o_totalprice), 4) AS revenue
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name"""

  val defs: Seq[QueryDef] = Seq(

    // ROLLUP: hierarchical subtotals (nation ⊂ segment), NULL markers
    // normalized to a sentinel so both engines hash identically.
    QueryDef("q45_rollup", Some("""
      SELECT coalesce(c_mktsegment, 'ALL') AS segment,
             CAST(coalesce(c_nationkey, -1) AS INTEGER) AS nationkey,
             count(*) AS n, round(sum(c_acctbal), 4) AS total_bal
      FROM customer
      GROUP BY ROLLUP (c_mktsegment, c_nationkey)"""),
      (spark, dir) =>
        T(spark, dir, "customer")
          .rollup(col("c_mktsegment"), col("c_nationkey"))
          .agg(count(lit(1)).as("n"), round(sum(col("c_acctbal")), 4).as("total_bal"))
          .select(coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
            coalesce(col("c_nationkey"), lit(-1)).cast("int").as("nationkey"),
            col("n"), col("total_bal"))),

    // Explicit GROUPING SETS: per-segment, per-nation, and grand-total
    // aggregates in one pass.
    QueryDef("q57_grouping_sets", Some("""
      SELECT coalesce(c_mktsegment, 'ALL') AS segment,
             CAST(coalesce(c_nationkey, -1) AS INTEGER) AS nationkey,
             count(*) AS n, round(avg(c_acctbal), 4) AS avg_bal
      FROM customer
      GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())"""),
      (spark, dir) => {
        T(spark, dir, "customer").createOrReplaceTempView("customer")
        spark.sql("""
          SELECT coalesce(c_mktsegment, 'ALL') AS segment,
                 CAST(coalesce(c_nationkey, -1) AS INT) AS nationkey,
                 count(*) AS n, round(avg(c_acctbal), 4) AS avg_bal
          FROM customer
          GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())""")
      }),

    // INTERSECT / EXCEPT set operations on key sets.
    QueryDef("q46_set_ops", Some("""
      SELECT 'both' AS tag, c_custkey FROM (
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        INTERSECT
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      UNION ALL
      SELECT 'only_rich' AS tag, c_custkey FROM (
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        EXCEPT
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')"""),
      (spark, dir) => {
        val c = T(spark, dir, "customer")
        val rich = c.filter(col("c_acctbal") > 5000).select("c_custkey")
        val building = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        rich.intersect(building).select(lit("both").as("tag"), col("c_custkey"))
          .unionByName(rich.except(building)
            .select(lit("only_rich").as("tag"), col("c_custkey")))
      }),

    // Pivot: per-user event counts by type (Spark .pivot with pinned
    // values; oracle uses conditional aggregation).
    QueryDef("q47_pivot", Some("""
      SELECT user_id,
             count(*) FILTER (WHERE event_type = 'click') AS click,
             count(*) FILTER (WHERE event_type = 'view') AS view,
             count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
             count(*) FILTER (WHERE event_type = 'signup') AS signup,
             count(*) FILTER (WHERE event_type = 'error') AS error
      FROM events GROUP BY user_id"""),
      (spark, dir) =>
        T(spark, dir, "events")
          .groupBy("user_id")
          .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
          .agg(count(lit(1)))
          .na.fill(0L)),

    // Date/time scalar surface: extraction + interval arithmetic.
    QueryDef("q48_date_math", Some("""
      SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
             CAST(month(o_orderdate) AS INTEGER) AS mo,
             count(*) AS n,
             strftime(min(o_orderdate + INTERVAL 30 DAY), '%Y-%m-%d') AS first_due
      FROM orders GROUP BY 1, 2"""),
      (spark, dir) =>
        T(spark, dir, "orders")
          .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
          .agg(count(lit(1)).as("n"),
            date_format(min(col("o_orderdate") + expr("INTERVAL 30 DAYS")),
              "yyyy-MM-dd").as("first_due"))),

    // String scalar surface: lpad/substr/replace/length/reverse.
    QueryDef("q49_string_ops", Some("""
      SELECT c_custkey,
             lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
             substr(c_name, 1, 8) AS name_prefix,
             replace(c_mktsegment, 'A', '@') AS seg_masked,
             CAST(length(c_name) AS INTEGER) AS name_len,
             reverse(c_mktsegment) AS seg_rev
      FROM customer"""),
      (spark, dir) =>
        T(spark, dir, "customer").select(col("c_custkey"),
          lpad(col("c_custkey").cast("string"), 10, "0").as("padded_key"),
          substring(col("c_name"), 1, 8).as("name_prefix"),
          regexp_replace(col("c_mktsegment"), "A", "@").as("seg_masked"),
          length(col("c_name")).as("name_len"),
          reverse(col("c_mktsegment")).as("seg_rev"))),

    // O6: seeded randomSplit — per-partition Bernoulli sampling, no
    // shuffle. The sampler's row assignment is not SQL-reproducible,
    // but its ALGEBRAIC INVARIANTS are, exactly: the splits partition
    // the table (total_n = |orders| AND distinct_keys = total_n since
    // o_orderkey is unique — together: exhaustive, disjoint, no row
    // duplicated), both splits are non-empty at the fixed seed
    // (n_splits = 2), and value is conserved (sum_price in
    // decimal(18,2) — exact integer-cents arithmetic, so the sum is
    // order-independent and engine-independent, unlike a double fold).
    // Seeded reproducibility of the assignment itself is spec-checked.
    QueryDef("q51_random_split", Some("""
      SELECT CAST(count(*) AS BIGINT) AS total_n,
             CAST(count(DISTINCT o_orderkey) AS BIGINT) AS distinct_keys,
             2 AS n_splits,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS sum_price
      FROM orders"""),
      (spark, dir) => {
        val splits = T(spark, dir, "orders").randomSplit(Array(0.9, 0.1), seed = 100L)
        val u = splits.zipWithIndex
          .map { case (s, i) => s.withColumn("split_id", lit(i)) }
          .reduce(_ unionByName _)
        u.agg(
          count(lit(1)).as("total_n"),
          countDistinct(col("o_orderkey")).as("distinct_keys"),
          countDistinct(col("split_id")).cast("int").as("n_splits"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("sum_price"))
      }),

    // Classic OLAP composite: shipping-priority shape (TPC-H Q3) —
    // 3-way join, date predicates on both sides, grouped revenue, top-N
    // by rounded revenue with key tiebreak.
    QueryDef("q54_shipping_priority", Some("""
      SELECT o_orderkey, revenue, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
             o_orderpriority
      FROM (
        SELECT o_orderkey, o_orderdate, o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
               row_number() OVER (ORDER BY round(sum(l_extendedprice * (1 - l_discount)), 4) DESC, o_orderkey) AS rn
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority)
      WHERE rn <= 50"""),
      (spark, dir) => {
        val grouped = T(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
          .join(T(spark, dir, "orders"), col("c_custkey") === col("o_custkey"))
          .filter(col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
          .join(T(spark, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") > to_timestamp(lit("1996-01-01 00:00:00")))
          .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
        graft.ops.TopK.exactPerKey(grouped, Seq.empty,
            Seq(col("revenue").desc, col("o_orderkey").asc), 50)
          .select(col("o_orderkey"), col("revenue"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
            col("o_orderpriority"))
      }),

    // Local-supplier-volume shape (TPC-H Q5): 5-way snowflake join,
    // revenue per nation within one region.
    QueryDef("q55_supplier_volume", Some("""
      SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = (SELECT min(r_name) FROM region)
      GROUP BY n_name"""),
      (spark, dir) => {
        // Dimension-first join order: resolve region -> nations once
        // (tiny broadcast), prune CUSTOMERS to the selected region
        // before any fact join — without CBO Catalyst keeps the declared
        // order, and joining the facts first would carry 5x the rows
        // through the two big joins just to filter them at the end.
        val minRegion = T(spark, dir, "region").agg(min(col("r_name")).as("r_min"))
        val nations = T(spark, dir, "nation")
          .join(broadcast(T(spark, dir, "region")
            .join(broadcast(minRegion), col("r_name") === col("r_min"))),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))
        T(spark, dir, "customer")
          .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
          .join(T(spark, dir, "orders"), col("c_custkey") === col("o_custkey"))
          .join(T(spark, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
          .join(T(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey") &&
            col("s_nationkey") === col("c_nationkey"))
          .groupBy("n_name")
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
      }),

    // Returned-items shape (TPC-H Q10): per-customer revenue of returned
    // line items, top-20.
    QueryDef("q56_returned_items", Some("""
      SELECT c_custkey, c_name, revenue, c_mktsegment
      FROM (
        SELECT c_custkey, c_name, c_mktsegment,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
               row_number() OVER (ORDER BY round(sum(l_extendedprice * (1 - l_discount)), 4) DESC, c_custkey) AS rn
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_mktsegment)
      WHERE rn <= 20"""),
      (spark, dir) => {
        val grouped = T(spark, dir, "customer")
          .join(T(spark, dir, "orders"), col("c_custkey") === col("o_custkey"))
          .join(T(spark, dir, "lineitem").filter(col("l_returnflag") === "R"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("c_custkey", "c_name", "c_mktsegment")
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
        graft.ops.TopK.exactPerKey(grouped, Seq.empty,
            Seq(col("revenue").desc, col("c_custkey").asc), 20)
          .select("c_custkey", "c_name", "revenue", "c_mktsegment")
      }),

    // Shared-SQL surface: the identical ANSI text runs through
    // spark.sql(...) over temp views AND as the DuckDB oracle.
    QueryDef("q50_sql_surface", Some(sharedSql),
      (spark, dir) => {
        Seq("orders", "customer", "nation", "region").foreach { t =>
          T(spark, dir, t).createOrReplaceTempView(t)
        }
        spark.sql(sharedSql)
      })
  )
}
