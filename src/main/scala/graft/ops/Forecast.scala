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
}
