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

  /** Two-sample log-rank test (Mantel 1966 / Peto & Peto 1972) — "did
    * retention differ between the arms": at each distinct exit time,
    * under H₀ the arm-1 deaths are hypergeometric with mean
    * E₁ = n₁·d/n and variance V = d·(n₁/n)·(n₂/n)·(n−d)/(n−1); the
    * statistic χ² = (ΣO₁ − ΣE₁)² / ΣV is χ²₁ under H₀. The survival
    * twin of the Welch-t / Mann-Whitney / KS comparison toolkit —
    * mean- and rank-based tests cannot see censoring; this is the
    * standard two-cohort retention readout.
    *
    * Exactness discipline (the msprt/chi² family): per-time counts and
    * suffix-sum risk sets are exact integer window arithmetic on ~T
    * rows; E₁ and V freeze as 10⁹ fixed-point floor divisions in
    * decimal(38,0) and are SUMMED EXACTLY (a float per-term sum would
    * depend on aggregation order); the α=.05 decision is the exact
    * decimal comparison (ΣO₁·10⁹ − ΣE₁)²·10⁶ > 3841459·ΣV·10⁹ — no
    * float near the boundary; the χ² display is the one double. Domain
    * (COVERAGE.md table): the variance numerator needs n⁴·10⁹ ≲ 10³⁸
    * and the decision square n²·10²⁴ ≲ 10³⁸ ⇒ n ≲ 10⁶ subjects per
    * comparison — the chi-square family's documented contract. Arms
    * outside {1, 2} are dropped (the mannWhitney rule); an empty arm
    * fails fast.
    *
    * Scale shape: ONE subject aggregate (map-side combined) down to ≤T
    * rows, two tiny window passes, one scalar fold.
    *
    * @return one row: n1, n2, o1, e1 (6 dp), chi2 (6 dp), significant
    */
  def logRank(subjects: DataFrame, armCol: String, tCol: String,
              censoredCol: String): DataFrame =
    logRankImpl(subjects, armCol, tCol, censoredCol, exactDecision = true)

  /** [[logRank]]'s large-n escape hatch (the mannWhitneyApprox
    * contract): the exact form's V numerator d·n₁ₜ·n₂ₜ·(n−d)·10⁹ ≲
    * 10³⁸ caps the cell at n ≲ 10⁶ subjects and fails fast past it.
    * Here V freezes through a STAGED fixed-point division —
    * a = n₁ₜ·n₂ₜ·10⁹ div n, then v = d·(n−d)·a div (n·(n−1)) — whose
    * intermediates stay ≲ n³·10⁹/16 (in-range to n ≈ 3·10⁹), still
    * EXACT-INTEGER and order/partition-independent (no float sums; the
    * staged floor loses < 2 ulp of the 10⁻⁹ grid per time vs the
    * single division). The α=.05 decision rides the double χ² against
    * 3.841459 with a 10⁻⁹ boundary guard that raises instead of
    * guessing. Explicit opt-in; the default stays exact.
    */
  def logRankApprox(subjects: DataFrame, armCol: String, tCol: String,
                    censoredCol: String): DataFrame =
    logRankImpl(subjects, armCol, tCol, censoredCol, exactDecision = false)

  private def logRankImpl(subjects: DataFrame, armCol: String, tCol: String,
                          censoredCol: String,
                          exactDecision: Boolean): DataFrame = {
    val s = subjects.select(col(armCol).as("arm"),
        col(tCol).cast("long").as("t"),
        col(censoredCol).cast("boolean").as("cen"))
      .filter(col("arm") === 1 || col("arm") === 2)
    val byT = s.groupBy("t").agg(
      count(when(col("arm") === 1 && !col("cen"), 1)).as("d1"),
      count(when(col("arm") === 1 && col("cen"), 1)).as("c1"),
      count(when(col("arm") === 2 && !col("cen"), 1)).as("d2"),
      count(when(col("arm") === 2 && col("cen"), 1)).as("c2"))
    val wPrev = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val wAll = Window.partitionBy(lit(1))
    val risk = byT
      .withColumn("n1t", sum(col("d1") + col("c1")).over(wAll)
        - coalesce(sum(col("d1") + col("c1")).over(wPrev), lit(0L)))
      .withColumn("n2t", sum(col("d2") + col("c2")).over(wAll)
        - coalesce(sum(col("d2") + col("c2")).over(wPrev), lit(0L)))
      .withColumn("d", col("d1") + col("d2"))
      .withColumn("n", col("n1t") + col("n2t"))
      // O₁ and E₁ sum over ALL death times (d > 0) — the conventional
      // observed/expected readout (R survdiff). At an n = 1 time the
      // lone at-risk subject dies, so d1 and e1 = n1t·d/n contribute
      // EQUALLY (both 1 if it's arm 1, both 0 if arm 2): (O₁ − E₁) is
      // identical to the old n > 1-filtered sum, only the reported o1
      // and e1 columns shift to the standard convention. V's n − 1
      // denominator still needs n > 1; its n = 1 contribution is
      // conventionally 0 (n1t·n2t = 0), frozen via the guard.
      .filter(col("d") > 0)
      .withColumn("e1_fp", expr(
        """cast(n1t as decimal(38,0)) * d * 1000000000 div n"""))
      .withColumn("v_fp",
        if (exactDecision) expr(
          """case when n > 1 then
               (cast(d as decimal(38,0)) * n1t * n2t * (n - d) * 1000000000)
               div (cast(n as decimal(38,0)) * n * (n - 1))
             else cast(0 as bigint) end""")
        else expr(
          // staged division keeps every intermediate ≲ n³·10⁹/16
          """case when n > 1 then
               (cast(d as decimal(38,0)) * (n - d)
                 * (cast(n1t as decimal(38,0)) * n2t * 1000000000 div n))
               div (cast(n as decimal(38,0)) * (n - 1))
             else cast(0 as bigint) end"""))
    val tot = risk.agg(
      sum(col("d1")).as("o1"),
      sum(col("e1_fp")).as("e1_fp"),
      sum(col("v_fp")).as("v_fp"))
    val counts = s.agg(
      count(when(col("arm") === 1, 1)).as("n1"),
      count(when(col("arm") === 2, 1)).as("n2"))
    counts.crossJoin(broadcast(tot))
      .select(
        expr("""case when n1 = 0 or n2 = 0
                then cast(raise_error('logRank: both arms need subjects')
                  as bigint) else n1 end""").as("n1"),
        col("n2"), col("o1"),
        round(col("e1_fp").cast("double") / 1e9, 6).as("e1"),
        round(expr(
          """(cast(o1 as double) - cast(e1_fp as double) / 1e9)
             * (cast(o1 as double) - cast(e1_fp as double) / 1e9)
             / (cast(v_fp as double) / 1e9)"""), 6).as("chi2"),
        // Spark `div` returns BIGINT, so the summed moments re-enter
        // decimal here — the decision must never ride Long arithmetic
        (if (exactDecision)
          expr("""(cast(o1 as decimal(38,0)) * 1000000000 - e1_fp)
                    * (cast(o1 as decimal(38,0)) * 1000000000 - e1_fp) * 1000000
                  > 3841459 * cast(v_fp as decimal(38,0)) * 1000000000""")
        else expr(
          // double χ² vs the df=1 critical, 1e-9 absolute guard band
          // (χ² near 3.84 ⇒ absolute ≈ relative; inputs are exact ints,
          // so the band can only be crossed by a genuine boundary case)
          """case
             when abs((cast(o1 as double) - cast(e1_fp as double) / 1e9)
                      * (cast(o1 as double) - cast(e1_fp as double) / 1e9)
                      / (cast(v_fp as double) / 1e9) - 3.841459) < 1e-9
               then cast(raise_error(
                 'logRankApprox: chi2 within 1e-9 of the 3.841459 boundary — use the exact mode') as boolean)
             else (cast(o1 as double) - cast(e1_fp as double) / 1e9)
                  * (cast(o1 as double) - cast(e1_fp as double) / 1e9)
                  / (cast(v_fp as double) / 1e9) > 3.841459
             end""")).as("significant"))
  }

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
