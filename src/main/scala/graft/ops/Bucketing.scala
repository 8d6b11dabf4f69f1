package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout: pre-shuffle fact tables once at write time so
  * repeated equi-joins/aggregations on the bucket key run with NO
  * exchange at read time — the core co-location lever for a 100 TB
  * star schema (SURVEY.md §7 / SCALE.md).
  *
  * Spark bucketing requires a catalog table (`saveAsTable`); callers
  * provide the table name, data lands in the session's warehouse dir.
  */
object Bucketing {

  /** Write `df` as a bucketed (and optionally sorted) catalog table. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, sortCol: Option[String] = None,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    val spark = df.sparkSession
    // A dropped-but-not-cleaned managed location (crashed earlier run)
    // blocks CREATE TABLE — clear both catalog entry and location.
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(warehouse)) fs.delete(warehouse, true)
    val w = df.write.mode(mode).format("parquet")
      .bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(s => w.sortBy(s)).saveAsTable(table)
  }

  /** Join two bucketed tables on their (shared) bucket key. When both
    * sides are bucketed into the same bucket count, Catalyst plans a
    * SortMergeJoin with zero ShuffleExchange (asserted in BucketingSpec).
    */
  def bucketJoin(spark: SparkSession, leftTable: String, rightTable: String,
                 key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
