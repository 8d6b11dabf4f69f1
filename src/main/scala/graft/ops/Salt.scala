package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys: salt the skewed (big) side into
  * `salts` sub-keys and explode the small side across all salt values,
  * so one hot key's rows spread over `salts` reducers instead of one.
  *
  * AQE's skew-join handles sort-merge skew automatically at runtime;
  * this explicit form covers the cases AQE can't re-plan (e.g. skewed
  * aggregations, pre-AQE shuffle sizing, deterministic layout tests).
  */
object Salt {

  /** Equi-join `big ⋈ small` on `key`, salted `salts` ways. Result
    * columns = big's ++ small's (minus the duplicate key).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(salts)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial-aggregate on (key, salt),
    * then final-aggregate on key. `partial` and `fin` must compose (sum/
    * sum, count/sum, min/min, ...).
    */
  def saltedAgg(df: DataFrame, key: String, valueCol: String, salts: Int,
                partial: Column => Column, fin: Column => Column): DataFrame =
    df.withColumn("__salt", pmod(hash(col(key), monotonically_increasing_id()), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(partial(col(valueCol)).as("__p"))
      .groupBy(col(key))
      .agg(fin(col("__p")).as(valueCol))
}
