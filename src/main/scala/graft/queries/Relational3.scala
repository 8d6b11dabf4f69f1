package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Correctness-sensitive surfaces where engine defaults genuinely differ
  * and must be pinned: exact quantiles, window navigation frames, and
  * null ordering/filter semantics.
  */
object Relational3 {

  val defs: Seq[QueryDef] = Seq(

    // Exact (interpolating) quantiles per group — Spark `percentile` ==
    // DuckDB `quantile_cont`. (Spark's own percentile_approx is NOT
    // oracle-able — its sketch state is merge-order-dependent; the
    // engine's mergeable quantile sketch, q271's LINEAR dyadic grid,
    // IS, and carries the full hash gate.)
    QueryDef("q58_quantiles", Some("""
      SELECT c_mktsegment,
             round(median(c_acctbal), 4) AS med_bal,
             round(quantile_cont(c_acctbal, 0.25), 4) AS q25,
             round(quantile_cont(c_acctbal, 0.75), 4) AS q75,
             count(*) AS n
      FROM customer GROUP BY c_mktsegment"""),
      (spark, dir) =>
        T(spark, dir, "customer")
          .groupBy("c_mktsegment")
          .agg(round(expr("percentile(c_acctbal, 0.5)"), 4).as("med_bal"),
            round(expr("percentile(c_acctbal, 0.25)"), 4).as("q25"),
            round(expr("percentile(c_acctbal, 0.75)"), 4).as("q75"),
            count(lit(1)).as("n"))),

    // Window navigation: lag/lead/first_value/last_value with explicit
    // frames and a total order (frame defaults differ between engines for
    // last_value — RANGE UNBOUNDED PRECEDING..CURRENT ROW — so the frame
    // is spelled out).
    QueryDef("q59_window_nav", Some("""
      SELECT user_id, event_id,
             lag(event_id) OVER w AS prev_event,
             lead(event_id) OVER w AS next_event,
             first_value(event_id) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_event,
             last_value(event_id) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_event
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)"""),
      (spark, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ms"), col("event_id"))
        val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        T(spark, dir, "events")
          .withColumn("ms", unix_millis(col("ts")))
          .select(col("user_id"), col("event_id"),
            lag(col("event_id"), 1).over(w).as("prev_event"),
            lead(col("event_id"), 1).over(w).as("next_event"),
            first(col("event_id")).over(full).as("first_event"),
            last(col("event_id")).over(full).as("last_event"))
      }),

    // Unpivot (wide -> long): Spark `stack`; oracle via UNION ALL.
    QueryDef("q61_unpivot", Some("""
      SELECT s_suppkey, 'acctbal' AS metric, round(s_acctbal, 4) AS value FROM supplier
      UNION ALL
      SELECT s_suppkey, 'nationkey' AS metric, CAST(s_nationkey AS DOUBLE) AS value FROM supplier"""),
      (spark, dir) =>
        T(spark, dir, "supplier").select(col("s_suppkey"),
          expr("stack(2, 'acctbal', round(s_acctbal, 4), 'nationkey', CAST(s_nationkey AS DOUBLE))")
            .as(Seq("metric", "value")))),

    // Array aggregation surfaced as a canonical string (sorted,
    // comma-joined) — list-typed outputs are deliberately avoided in
    // oracled results (engine list stringification differs).
    QueryDef("q62_array_agg", Some("""
      SELECT c_mktsegment,
             array_to_string(list_sort(list(DISTINCT c_nationkey)), ',') AS nations,
             CAST(len(list(DISTINCT c_nationkey)) AS INTEGER) AS n_nations
      FROM customer GROUP BY c_mktsegment"""),
      (spark, dir) =>
        T(spark, dir, "customer")
          .groupBy("c_mktsegment")
          .agg(array_join(sort_array(collect_set(col("c_nationkey"))), ",").as("nations"),
            size(collect_set(col("c_nationkey"))).as("n_nations"))),

    // Null semantics pinned explicitly: injected nulls, coalesce/nullif,
    // count(col) vs count(*), and rank ordering with NULLS LAST spelled
    // out on BOTH engines (Spark's asc default is NULLS FIRST, DuckDB's
    // is NULLS LAST — never rely on either).
    QueryDef("q60_null_semantics", Some("""
      WITH v AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_acctbal END AS bal,
               nullif(c_mktsegment, 'MACHINERY') AS seg
        FROM customer)
      SELECT coalesce(seg, 'OTHER') AS seg_grp,
             count(*) AS n_rows, count(bal) AS n_bal,
             round(sum(coalesce(bal, 0.0)), 4) AS total,
             CAST(min(rnk) AS INTEGER) AS best_rank
      FROM (SELECT *, row_number() OVER (ORDER BY bal DESC NULLS LAST, c_custkey) AS rnk FROM v)
      GROUP BY coalesce(seg, 'OTHER')"""),
      (spark, dir) => {
        val v = T(spark, dir, "customer").select(col("c_custkey"),
          when(col("c_custkey") % 11 === 0, lit(null).cast("double"))
            .otherwise(col("c_acctbal")).as("bal"),
          nullif(col("c_mktsegment"), lit("MACHINERY")).as("seg"))
        // Global row_number without the single-partition window — the
        // two-pass range-binned form (ops.GlobalRank); NULLS LAST ordering
        // carries through range partitioning like any other sort key.
        val ranked = graft.ops.GlobalRank.withRowNumber(v, "rnk",
          Seq(col("bal").desc_nulls_last, col("c_custkey")))
        ranked.groupBy(coalesce(col("seg"), lit("OTHER")).as("seg_grp"))
          .agg(count(lit(1)).as("n_rows"), count(col("bal")).as("n_bal"),
            round(sum(coalesce(col("bal"), lit(0.0))), 4).as("total"),
            min(col("rnk")).cast("int").as("best_rank"))
      })
  )
}
