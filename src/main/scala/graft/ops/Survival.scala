package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival / retention curve (Kaplan & Meier, JASA 1958)
  * — THE product-analytics readout for "how long do users stay":
  * right-censored lifetimes (users still active at the observation
  * edge are censored, not churned — treating them as churn biases
  * retention down, the classic dashboard mistake), with
  * S(t) = Π_{s ≤ t} (1 − d_s/n_s) over the at-risk sets.
  *
  * Exactness discipline: lifetimes are integer time grains; the per-t
  * death/censor counts and suffix-sum risk sets are exact integer
  * window arithmetic; each day's factor (n−d)/n freezes as a 10⁹
  * fixed-point integer via floor division, and the survival curve is
  * an ORDERED fold of those integers (acc·f div 10⁹) over a sorted
  * array — both the fold order and every intermediate are defined, so
  * a SQL twin (list_reduce) replays the curve bit for bit. The
  * per-step floor loses < 1e-9 per time point against the real-valued
  * product — invisible at the 6-dp display, and a DEFINED estimator
  * rather than a float whose value depends on multiplication order.
  *
  * Scale shape: ONE aggregate over subjects (map-side combined) down
  * to ≤ (distinct lifetime) rows; the fold is O(T²) over that tiny
  * frame (a month = 31 rows → ≤ 961 multiplies), broadcast as a
  * one-row array. Subjects never shuffle anywhere but their one
  * groupBy key.
  */
object Survival {

  /** KM curve from one row per subject: integer survival time
    * (`tCol` ≥ 0) and a boolean censoring flag (`censoredCol` true =
    * still alive at observation end). Deaths precede censorings within
    * a time point (the standard convention: a subject censored at t
    * was at risk for the deaths at t).
    *
    * @return one row per distinct time: t, n_at_risk, churned,
    *         censored, survival_fp (10⁹ fixed point), survival (6 dp)
    */
  def kaplanMeier(subjects: DataFrame, tCol: String,
                  censoredCol: String): DataFrame =
    kmCurve(subjects, tCol, censoredCol)
      .select(col("t"), col("n_at_risk"), col("churned"), col("censored"),
        col("survival_fp"),
        round(col("survival_fp").cast("double") / 1000000000.0, 6)
          .as("survival"))
      .orderBy("t")

  /** [[kaplanMeier]] with the Greenwood confidence band (Greenwood
    * 1926) — a retention curve without its uncertainty is half the
    * dashboard: var(S(t)) = S(t)² · Σ_{s≤t} d/(n(n−d)), the plug-in
    * variance every survival package reports. The cumulative sum rides
    * 10¹⁸ fixed-point floor-division terms (exact integers over the
    * same ≤T rows; decimal(38,0) holds n ≤ 10⁹ subjects), so both
    * engines replay the fold bit for bit; the se and the plain-normal
    * 95% band (S ± 1.96·S·√Σ, clamped to [0,1]) are the one
    * double-valued readout at the end. At the degenerate final point
    * where everyone at risk churns (n = d, S = 0) the Greenwood term
    * is undefined — it freezes to 0 there (the se is 0 anyway since
    * S = 0 multiplies it; documented convention, engine-identical).
    *
    * @return one row per distinct time: t, n_at_risk, churned,
    *         censored, survival (6 dp), se (6 dp), lo95, hi95 (6 dp)
    */
  def kaplanMeierGreenwood(subjects: DataFrame, tCol: String,
                           censoredCol: String): DataFrame =
    kmCurve(subjects, tCol, censoredCol)
      .withColumn("s_d", col("survival_fp").cast("double") / 1000000000.0)
      .withColumn("se_raw", expr(
        "s_d * sqrt(cast(greenwood_fp as double) / 1e18)"))
      .select(col("t"), col("n_at_risk"), col("churned"), col("censored"),
        round(col("s_d"), 6).as("survival"),
        round(col("se_raw"), 6).as("se"),
        round(greatest(lit(0.0), expr("s_d - 1.96 * se_raw")), 6).as("lo95"),
        round(least(lit(1.0), expr("s_d + 1.96 * se_raw")), 6).as("hi95"))
      .orderBy("t")

  /** Shared curve builder: per-distinct-time exits, at-risk sets, the
    * 10⁹ fixed-point survival fold, and the 10¹⁸ fixed-point Greenwood
    * cumulative — all exact integers on ~T rows.
    */
  private def kmCurve(subjects: DataFrame, tCol: String,
                      censoredCol: String): DataFrame = {
    val s = subjects.select(col(tCol).cast("long").as("t"),
      col(censoredCol).cast("boolean").as("cen"))
    val byT = s.groupBy("t").agg(
      count(when(!col("cen"), 1)).as("churned"),
      count(when(col("cen"), 1)).as("censored"))
    // at-risk just before t: everyone with lifetime >= t — the total
    // minus the strict-prefix exits (exact window sums on ~T rows)
    val wPrev = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val wCum = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(lit(1))
    val risk = byT
      .withColumn("n_at_risk",
        sum(col("churned") + col("censored")).over(wAll)
          - coalesce(sum(col("churned") + col("censored")).over(wPrev),
            lit(0L)))
      // the day factor (n - d)/n at 10^9, exact floor division; n > 0
      // by construction (t only exists because someone exited at it)
      .withColumn("f", expr(
        "(n_at_risk - churned) * 1000000000L div n_at_risk"))
      // Greenwood increment d·10¹⁸ div (n(n−d)); n = d (last point,
      // no censoring) freezes to 0 — see kaplanMeierGreenwood
      .withColumn("g_term", expr(
        """case when churned < n_at_risk
           then cast(churned as decimal(38,0)) * 1000000000000000000
                div (cast(n_at_risk as decimal(38,0)) * (n_at_risk - churned))
           else cast(0 as decimal(38,0)) end"""))
      .withColumn("greenwood_fp", sum(col("g_term")).over(wCum))
    // ordered factor list, broadcast once; survival at the k-th time
    // point folds the first k factors (position slice — the t-sorted
    // array order IS the fold order, identical in any engine)
    val factors = risk.agg(
      transform(array_sort(collect_list(struct(col("t"), col("f")))),
        x => x.getField("f")).as("fs"))
    risk
      .withColumn("rn", row_number().over(Window.orderBy("t")))
      .crossJoin(broadcast(factors))
      .withColumn("survival_fp", expr(
        """aggregate(slice(fs, 1, rn), 1000000000L,
                     (acc, x) -> (acc * x) div 1000000000L)"""))
  }
}
