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
      expr("slice(__s, 2, size(__s) - 1)"), init,
      (acc, x) => {
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
      })
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
}
