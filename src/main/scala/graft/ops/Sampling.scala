package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distributed sampling.
  *
  * Spark's `sample`/`randomSplit` are seed-reproducible only for a fixed
  * partitioning; these operators derive their randomness from a hash of
  * the row's key instead, so the selection is a pure function of the
  * DATA — stable across partitionings, engines, and runs (and therefore
  * SQL-oracle-able).
  */
object Sampling {

  /** Hash-derived uniform in (0, 1): the first 60 bits of md5(key),
    * folded mod 1000003 (same value as
    * `('0x' || substr(md5(key), 1, 15))::BIGINT % 1000003` in DuckDB).
    */
  def hashUniform(key: Column): Column =
    ((conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")
      % 1000003L + 1L).cast("double")) / 1000004.0

  /** Efraimidis-Spirakis weighted sampling without replacement: row i
    * wins with probability proportional to `weight` via the key
    * `ln(u_i) / w_i` (maximized); the s winners are found with a
    * distributed TakeOrdered (per-partition top-s heaps, no shuffle of
    * the losers). `weight` must be strictly positive.
    */
  def weightedSample(df: DataFrame, idCol: String, weight: Column, s: Int): DataFrame = {
    val key = log(hashUniform(col(idCol))) / weight
    df.withColumn("__skey", key)
      .orderBy(col("__skey").desc, col(idCol).asc)
      .limit(s)
      .drop("__skey")
  }

  /** Uniform deterministic sample of ~fraction of rows: keep rows whose
    * hash-uniform falls below the threshold (Bernoulli by data, not by
    * partition position).
    */
  def uniformSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(hashUniform(col(idCol)) < fraction)

  /** Stratified deterministic sampling — the training-data MIXING step:
    * keep each row with the rate configured for its stratum (domain /
    * source / language), unlisted strata at `defaultRate`. The rates ride
    * a broadcast literal table so the mixing recipe is data, not code
    * (swap recipes without re-planning), and selection is a pure function
    * of the row id: re-runs, re-partitions, and per-stratum audits all
    * see the same sample. One broadcast-hash join + one filter — no
    * shuffle of the corpus.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rateTable = rates.toSeq.toDF(strataCol, "__rate")
    df.join(broadcast(rateTable), Seq(strataCol), "left")
      .filter(hashUniform(col(idCol)) < coalesce(col("__rate"), lit(defaultRate)))
      .drop("__rate")
  }
}
