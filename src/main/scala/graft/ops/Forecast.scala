package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Seasonal-naive forecasting backtest — the baseline every production
  * forecast is judged against (M-competition discipline): predict each
  * period as the value one season earlier, then score the prediction
  * against what actually happened. Teams that can't beat this number
  * ship this number; the engine provides it as the evaluation floor
  * for capacity planning / anomaly thresholds over the event streams
  * (complements q178's CUSUM and q180's trend slope).
  *
  * Join-based, not lag-based: `pred(t) = v(t − season)` materializes
  * through a self-join on (keys, t − season), so GAPS in the series
  * are handled by construction (a window `lag(seasonRows)` silently
  * reads the wrong period when hours are missing). Periods without a
  * season-ago observation simply don't score — the honest backtest
  * denominator, reported as `n_eval`.
  *
  * Scale shape: one key+time-hashed self-join (8-byte-ish keys, the
  * narrow (keys, t, v) projection — never raw events) and one per-key
  * aggregation; both partial-aggregated, no window, no sort.
  */
object Forecast {

  /** Per-key backtest of the seasonal-naive predictor over a numeric
    * period index `tCol` (e.g. epoch-hours) with season length
    * `season` periods: (keys…, n_eval, mape, bias) where
    * mape = avg |pred − v| / v (requires v > 0 rows — counts are),
    * bias = avg (pred − v), both rounded to 6.
    */
  def seasonalNaiveBacktest(series: DataFrame, keys: Seq[String],
                            tCol: String, vCol: String,
                            season: Long): DataFrame = {
    require(season > 0, s"season must be positive, got $season")
    val cur = series.select(
      keys.map(col) :+ col(tCol).as("__t") :+ col(vCol).as("__v"): _*)
    val prev = series.select(
      keys.map(col) :+ (col(tCol) + season).as("__t") :+ col(vCol).as("__p"): _*)
    cur.join(prev, keys :+ "__t")
      .filter(col("__v") > 0)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_eval"),
        round(avg(abs(col("__p") - col("__v")) / col("__v")), 6).as("mape"),
        round(avg(col("__p") - col("__v")), 6).as("bias"))
  }

  /** Per-key backtest of Holt double exponential smoothing (Holt 1957 —
    * level + additive trend, the first forecaster expected to BEAT
    * [[seasonalNaiveBacktest]]'s floor): one-step-ahead forecast
    * f_t = l + b, then l' = α·y_t + (1−α)(l+b),
    * b' = β(l'−l) + (1−β)b, scored by mean absolute error over the
    * key's time-ordered observations (l₀ = y₀, b₀ = 0).
    *
    * The recurrence is inherently sequential PER KEY, so it runs as
    * the engine's ordered-fold shape (the q123/q221 discipline): sort
    * the key's observations into an array, fold once left-to-right —
    * a FIXED float-op chain an external engine replays bit-for-bit
    * via `list_reduce(list(... ORDER BY t), ...)` (q237). Parallelism
    * is across keys; a key's history must fit one row (~720 hourly
    * points ≈ 12 KB — at 100 TB, window the history or keep (l, b)
    * in a streaming state store instead).
    *
    * Gap-blind by design: observations fold in time order whether or
    * not periods are contiguous — this evaluates the SMOOTHER;
    * gap-filling is q78's job, upstream.
    *
    * @return (keys…, n_obs, mae, level, trend) — mae over the n−1
    *         one-step forecasts, final state rounded to 6
    */
  /** One Holt update as a fold step over `(l, b, sae, n)` accumulator
    * structs — the SINGLE definition of the float-op chain, shared by
    * [[holtBacktest]] and `streaming.IncrementalForecast` so the
    * incremental store's continuation is bit-identical to the batch
    * fold by construction (same expression tree, same doubles).
    */
  private[graft] def holtStep(alpha: Double, beta: Double)
                             (acc: org.apache.spark.sql.Column,
                              x: org.apache.spark.sql.Column)
  : org.apache.spark.sql.Column = {
    // the duplicated l' subexpression in b' is deliberate: the
    // oracle's lambda writes the same text twice, and identical
    // pure float expressions yield identical doubles
    val l = acc.getField("l"); val b = acc.getField("b")
    val y = x.getField("y")
    val nl = lit(alpha) * y + lit(1.0 - alpha) * (l + b)
    struct(
      nl.as("l"),
      (lit(beta) * (nl - l) + lit(1.0 - beta) * b).as("b"),
      (acc.getField("sae") + abs(y - (l + b))).as("sae"),
      (acc.getField("n") + lit(1.0)).as("n"))
  }

  def holtBacktest(series: DataFrame, keys: Seq[String],
                   tCol: String, vCol: String,
                   alpha: Double, beta: Double): DataFrame = {
    require(0 < alpha && alpha < 1 && 0 < beta && beta < 1,
      s"need 0 < alpha, beta < 1, got ($alpha, $beta)")
    val sorted = series
      .select(keys.map(col) :+
        struct(col(tCol).as("t"), col(vCol).cast("double").as("y")).as("__e"): _*)
      .groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(col("__e"))).as("__s"),
        count(lit(1)).as("n_obs"))
    val init = struct(
      element_at(col("__s"), 1).getField("y").as("l"),
      lit(0.0).as("b"), lit(0.0).as("sae"), lit(0.0).as("n"))
    val folded = aggregate(
      expr("slice(__s, 2, size(__s) - 1)"), init, holtStep(alpha, beta))
    sorted.select(
      keys.map(col) :+ col("n_obs") :+ folded.as("__st"): _*)
      .select(keys.map(col) :+ col("n_obs") :+
        round(col("__st").getField("sae") /
          greatest(col("__st").getField("n"), lit(1.0)), 6).as("mae") :+
        round(col("__st").getField("l"), 6).as("level") :+
        round(col("__st").getField("b"), 6).as("trend"): _*)
  }

  /** Per-key backtest of Holt-Winters TRIPLE exponential smoothing
    * (additive seasonality — Winters 1960; the fpp3 recurrences): the
    * completion of the q224 (seasonal-naive floor) → q237 (level +
    * trend) forecasting ladder, for series that both trend AND repeat,
    * which hourly operational counts do.
    *
    * One-step-ahead forecast f_t = l + b + s_{t−m}; updates
    *   l' = α(y_t − s_{t−m}) + (1−α)(l + b)
    *   b' = β(l' − l) + (1−β)b
    *   s_t = γ(y_t − (l + b)) + (1−γ)s_{t−m}
    * Initialization (first season only, so no observation is both
    * initializer and forecast target): l₀ = mean of the first `season`
    * values (0-seeded left fold / m), b₀ = 0, s_i = y_i − l₀ for the
    * first season; scoring starts at observation season+1.
    *
    * Same ordered-fold shape as [[holtBacktest]], with the seasonal
    * state as a LENGTH-m QUEUE inside the accumulator: each step
    * consumes the head (that IS s_{t−m}) and appends the refreshed
    * seasonal — no index arithmetic, and the oracle replays it with
    * the identical list operations (`s[2:]` + `list_append`) in a
    * recursive CTE; `list_reduce` stays banned for this accumulator
    * (the documented DuckDB multi-field-struct fold bug, q237's note).
    * Keys with fewer than season+1 observations have no forecastable
    * period and are dropped (the honest denominator discipline).
    *
    * Parallelism is across keys; a key's history folds in one row
    * (the q237 size note — window or stream state at 100 TB).
    *
    * @return (keys…, n_obs, mae, level, trend, seasonal_next) — mae
    *         over the n_obs − season one-step forecasts, final state
    *         rounded to 6; seasonal_next = the upcoming period's
    *         seasonal term
    */
  def holtWintersBacktest(series: DataFrame, keys: Seq[String],
                          tCol: String, vCol: String,
                          alpha: Double, beta: Double, gamma: Double,
                          season: Int): DataFrame = {
    require(0 < alpha && alpha < 1 && 0 < beta && beta < 1 &&
      0 < gamma && gamma < 1,
      s"need 0 < alpha, beta, gamma < 1, got ($alpha, $beta, $gamma)")
    require(season >= 2, s"season must be at least 2, got $season")
    val sorted = series
      .select(keys.map(col) :+
        struct(col(tCol).as("t"), col(vCol).cast("double").as("y")).as("__e"): _*)
      .groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(col("__e"))).as("__s"),
        count(lit(1)).as("n_obs"))
      .filter(col("n_obs") > season)
    // l0 = 0-seeded left fold of the first season / m (0.0 + y is
    // exact, so the bits equal DuckDB's first-element-seeded fold)
    val firstSeason = expr(s"slice(__s, 1, $season)")
    val l0 = aggregate(firstSeason, lit(0.0),
      (acc, e) => acc + e.getField("y")) / lit(season.toDouble)
    val init = struct(
      l0.as("l"), lit(0.0).as("b"), lit(0.0).as("sae"), lit(0.0).as("n"),
      transform(firstSeason, e => e.getField("y") - l0).as("s"))
    val folded = aggregate(
      expr(s"slice(__s, ${season + 1}, size(__s) - $season)"), init,
      (acc, x) => {
        // duplicated l' text in b' is deliberate (the q237 oracle
        // discipline: a recursive CTE cannot reference a same-SELECT
        // alias, and identical pure float expressions give identical
        // doubles)
        val l = acc.getField("l"); val b = acc.getField("b")
        val sOld = element_at(acc.getField("s"), 1)
        val y = x.getField("y")
        val nl = lit(alpha) * (y - sOld) + lit(1.0 - alpha) * (l + b)
        val ns = lit(gamma) * (y - (l + b)) + lit(1.0 - gamma) * sOld
        struct(
          nl.as("l"),
          (lit(beta) * (nl - l) + lit(1.0 - beta) * b).as("b"),
          (acc.getField("sae") + abs(y - (l + b + sOld))).as("sae"),
          (acc.getField("n") + lit(1.0)).as("n"),
          concat(slice(acc.getField("s"), 2, season - 1), array(ns)).as("s"))
      })
    sorted.select(
      keys.map(col) :+ col("n_obs") :+ folded.as("__st"): _*)
      .select(keys.map(col) :+ col("n_obs") :+
        round(col("__st").getField("sae") /
          greatest(col("__st").getField("n"), lit(1.0)), 6).as("mae") :+
        round(col("__st").getField("l"), 6).as("level") :+
        round(col("__st").getField("b"), 6).as("trend") :+
        round(element_at(col("__st").getField("s"), 1), 6).as("seasonal_next"): _*)
  }

  /** Per-key AR(2) fit by Yule-Walker plus an in-sample one-step
    * backtest — the AUTOREGRESSIVE member of the forecasting ladder
    * (q224 seasonal-naive → q237 Holt → q240 Holt-Winters → here):
    * where the smoothing family tracks level/trend/season with decay
    * knobs, AR(2) ESTIMATES its dynamics from the series' own
    * autocovariances, and its fitted (φ₁, φ₂) double as a stationarity
    * diagnostic (roots near the unit circle = near-random-walk load).
    *
    * Estimation is MOMENT-BASED, which is what makes it the scale
    * shape: the whole fit is one pass of exact integer sums
    * (Σy, Σy², Σy_t·y_{t−k} over lag-k JOIN pairs — join-based lags,
    * the [[seasonalNaiveBacktest]] gap discipline: a missing hour
    * simply contributes no pair, never a wrong one), then a
    * closed-form 2×2 solve per key on the driver-free aggregate row:
    *
    *   c_k  = (Σy_t·y_{t−k} − ȳ(Σy_t + Σy_{t−k}) + n_k·ȳ²) / n
    *   φ₁ = c₁(c₀−c₂)/(c₀²−c₁²),  φ₂ = (c₀c₂−c₁²)/(c₀²−c₁²)
    *
    * Because every sum is exact long arithmetic, the float work is a
    * FIXED expression tree over exact inputs — deterministic across
    * engines with no intermediate rounding (the q241 exactness
    * discipline, achieved here with integer moments instead of
    * power-of-two weights). Degenerate keys (constant series or
    * c₀²=c₁², e.g. fewer than 3 points) fall back to φ=0 — the
    * predict-the-mean model — rather than NaN.
    *
    * The backtest scores pred_t = ȳ + φ₁(y_{t−1}−ȳ) + φ₂(y_{t−2}−ȳ)
    * over every row with BOTH lags present (inner 3-way join), MAE
    * rounded to 6 (the only unordered float sum, bounded by n·ulp).
    *
    * At 100 TB nothing changes shape: three narrow (keys, t, v)
    * hash-joins and one aggregation, all partial-aggregated, no
    * window, no sort, no per-key history row (unlike the fold family
    * — this is the forecaster to reach for when a key's history does
    * NOT fit one row).
    *
    * @param series (keys…, tCol, vCol) with vCol integer-typed counts
    *        (cast to long internally — exactness of the moment sums
    *        is the determinism contract)
    * @return (keys…, n_obs, n_eval, phi1, phi2, mae) rounded to 6
    */
  def ar2Backtest(series: DataFrame, keys: Seq[String],
                  tCol: String, vCol: String): DataFrame = {
    val base = series.select(
      keys.map(col) :+ col(tCol).cast("long").as("__t") :+
        col(vCol).cast("long").as("__y"): _*)
    def lagged(k: Int) = base.select(
      keys.map(col) :+ (col("__t") + k).as("__t") :+
        col("__y").as(s"__p$k"): _*)
    // Global moments: n, Σy, Σy² (exact longs).
    val g = base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("s"),
        sum(col("__y") * col("__y")).as("syy"))
    // Lag-k pair moments (exact longs over the join-surviving pairs).
    def pairMoments(k: Int) = base.join(lagged(k), keys :+ "__t")
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as(s"n$k"),
        sum(col("__y") * col(s"__p$k")).as(s"sxy$k"),
        sum(col("__y")).as(s"sy$k"), sum(col(s"__p$k")).as(s"sx$k"))
    val m = g.join(pairMoments(1), keys).join(pairMoments(2), keys)
    val nD = col("n").cast("double")
    val mean = col("s").cast("double") / nD
    def cov(k: Int) =
      (col(s"sxy$k").cast("double") -
        mean * (col(s"sy$k") + col(s"sx$k")).cast("double") +
        col(s"n$k").cast("double") * mean * mean) / nD
    val c0 = (col("syy").cast("double") -
      mean * (col("s") + col("s")).cast("double") + nD * mean * mean) / nD
    val withPhi = m
      .withColumn("__mean", mean)
      .withColumn("__c0", c0)
      .withColumn("__c1", cov(1)).withColumn("__c2", cov(2))
      .withColumn("__d",
        col("__c0") * col("__c0") - col("__c1") * col("__c1"))
      .withColumn("__phi1",
        when(abs(col("__d")) < 1e-12, 0.0)
          .otherwise(col("__c1") * (col("__c0") - col("__c2")) / col("__d")))
      .withColumn("__phi2",
        when(abs(col("__d")) < 1e-12, 0.0)
          .otherwise((col("__c0") * col("__c2") -
            col("__c1") * col("__c1")) / col("__d")))
    // One-step in-sample backtest over rows with both lags.
    val triple = base.join(lagged(1), keys :+ "__t").join(lagged(2), keys :+ "__t")
    val scored = triple.join(
        withPhi.select(keys.map(col) :+ col("__mean") :+
          col("__phi1") :+ col("__phi2"): _*), keys)
      .withColumn("__pred",
        col("__mean") + col("__phi1") * (col("__p1").cast("double") - col("__mean")) +
          col("__phi2") * (col("__p2").cast("double") - col("__mean")))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_eval"),
        round(avg(abs(col("__pred") - col("__y").cast("double"))), 6).as("mae"))
    withPhi.join(scored, keys, "left")
      .select(keys.map(col) :+ col("n").as("n_obs") :+
        coalesce(col("n_eval"), lit(0L)).as("n_eval") :+
        round(col("__phi1"), 6).as("phi1") :+
        round(col("__phi2"), 6).as("phi2") :+
        coalesce(col("mae"), lit(0.0)).as("mae"): _*)
  }

  /** Per-key classical additive decomposition (the textbook
    * moving-average method — Hyndman & Athanasopoulos fpp3 §3.4) of a
    * gap-tolerant integer series into trend + seasonal + remainder:
    * the DIAGNOSTIC face of the forecasting family (q224/q237/q240
    * predict; this explains, and its remainder is the right input for
    * q232's MAD spike detector — deseasonalized residuals don't
    * inflate the threshold the way raw diurnal counts do).
    *
    * Trend is the 2×m centered moving average, computed GAP-HONESTLY
    * with a RANGE window over the period index: the window sums rows
    * whose t lies in [t−m/2, t+m/2], and a row only gets a trend when
    * that window holds ALL m+1 periods (count = m+1 → the series is
    * locally contiguous, so the row-based lag/lead(m/2) that fetches
    * the half-weighted endpoints provably lands on t∓m/2):
    *
    *   trend_t = (Σ_{|o|≤m/2} y_{t+o} − (y_{t−m/2} + y_{t+m/2})/2) / m
    *
    * — an exact long window sum and two exact endpoints, so trend is
    * a fixed float expression over exact integers (deterministic, no
    * rounding needed). Seasonal = per-(key, t mod m) mean of the
    * detrended values, centered to zero mean across the m phases
    * (both unordered float averages — rounded at 6 once, after
    * centering); remainder = y − trend − seasonal(rounded).
    *
    * Scale shape: one RANGE window (a sort per key — rows stay
    * (keys, t, y)-narrow), two small aggregations (m rows per key),
    * one broadcast-back join. No self-join fan-out, no per-key
    * history row.
    *
    * @param season m, even (the 2×m form; 24 for hourly-daily)
    * @return (keys…, t, y, trend, seasonal, remainder) for rows with
    *         a full trend window; trend/seasonal/remainder rounded 6
    */
  def decompose(series: DataFrame, keys: Seq[String],
                tCol: String, vCol: String, season: Int): DataFrame = {
    require(season >= 2 && season % 2 == 0,
      s"season must be even and at least 2, got $season")
    val h = season / 2
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col("__t"))
    val rangeW = w.rangeBetween(-h, h)
    val base = series.select(
      keys.map(col) :+ col(tCol).cast("long").as("__t") :+
        col(vCol).cast("long").as("__y"): _*)
    val trended = base
      .withColumn("__wsum", sum(col("__y")).over(rangeW))
      .withColumn("__wcnt", count(lit(1)).over(rangeW))
      .withColumn("__yl", lag(col("__y"), h).over(w))
      .withColumn("__yr", lead(col("__y"), h).over(w))
      .filter(col("__wcnt") === season + 1)
      .withColumn("__trend",
        (col("__wsum").cast("double") -
          (col("__yl") + col("__yr")).cast("double") / 2.0) / season.toDouble)
      .withColumn("__phase", pmod(col("__t"), lit(season.toLong)))
      // detrended residual at EXACT 2·season fixed point:
      // y − trend = (y·2·season − 2·wsum + yl + yr) / (2·season) — the
      // numerator is a plain long, so the phase mean rides an exact
      // integer sum: order- and partition-count-independent (the old
      // unordered avg(double) flipped a 6-dp rounding at sf0.1 when
      // the session core count changed; this is the q284
      // quantize-before-sum rule, except the quantization here is
      // LOSSLESS)
      .withColumn("__detr_fp",
        col("__y") * lit(2L * season) - col("__wsum") * lit(2L)
          + col("__yl") + col("__yr"))
    // trended feeds phaseMeans AND the final join; phaseMeans feeds
    // sMeans AND centered — without truncation the corpus window pass
    // recomputes up to three times (the mannWhitney/ksTest shared-
    // consumer idiom: lazy local checkpoint at each fan-out point)
    val trendedCk = trended.localCheckpoint(eager = false)
    val phaseMeans = trendedCk.groupBy(keys.map(col) :+ col("__phase"): _*)
      .agg(sum(col("__detr_fp")).as("__s_sum"),
        count(lit(1)).as("__s_cnt"))
      .withColumn("__s_raw", col("__s_sum").cast("double")
        / (col("__s_cnt").cast("double") * (2.0 * season)))
      .localCheckpoint(eager = false)
    // cross-phase centering: an ORDERED fold over the ≤season phase
    // means (the kaplanMeier/psi list_reduce idiom) — a plain avg over
    // an unordered window would re-introduce order sensitivity
    val sMeans = phaseMeans
      .groupBy(keys.map(col): _*)
      .agg(transform(array_sort(collect_list(
          struct(col("__phase"), col("__s_raw")))),
        x => x.getField("__s_raw")).as("__ss"))
      .select(keys.map(col) :+
        expr("""aggregate(__ss, cast(0.0 as double), (a, x) -> a + x)
                / size(__ss)""").as("__s_mean"): _*)
    val centered = phaseMeans.join(broadcast(sMeans), keys)
      .withColumn("__seasonal", round(col("__s_raw") - col("__s_mean"), 6))
      .select(keys.map(col) :+ col("__phase") :+ col("__seasonal"): _*)
    trendedCk.join(broadcast(centered), keys :+ "__phase")
      .select(keys.map(col) :+ col("__t").as("t") :+ col("__y").as("y") :+
        round(col("__trend"), 6).as("trend") :+
        col("__seasonal").as("seasonal") :+
        round(col("__y").cast("double") - col("__trend") - col("__seasonal"), 6)
          .as("remainder"): _*)
  }
}
