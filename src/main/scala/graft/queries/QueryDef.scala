package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: Spark implementation + (when SQL-expressible)
  * the equivalent DuckDB oracle SQL over the same parquet tables.
  *
  * Determinism contract (driver hash-compares row sets):
  *  - every computed float is `round(...)`-ed identically on both sides;
  *  - every window rank orders by a total order (unique tiebreaker);
  *  - integer-typed outputs are cast to the same width on both sides
  *    (DuckDB `sum(INTEGER)` is HUGEINT, Spark is LongType — always cast).
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)

object T {
  /** Load one driver test table from an sf dir. */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** The events table carries TIMESTAMP(NANOS) parquet timestamps, which
    * Spark 4 rejects by default. Read nanos as long and rebuild a
    * microsecond timestamp (floor division — matches DuckDB's own
    * ns→us truncation of the same column).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
}
