package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.SimSearch

/** Streaming maintenance of an on-disk IVF similarity index: embeddings
  * arrive continuously, each micro-batch is assigned to its nearest
  * centroid and appended to a bucket-partitioned parquet index, and
  * probes read ONLY their probed buckets' files.
  *
  * This is the frozen-index regime every production ANN service runs:
  * centroids are trained once (here [[SimSearch.seedCentroids]] or any
  * learned set) and FIXED; assignment of a new vector depends only on
  * the vector and the centroids, so incremental ingestion is
  * embarrassingly parallel and the incrementally-built index is
  * row-identical to batch-bucketing the same corpus
  * (IncrementalIvfSpec pins probe-result equality with
  * [[SimSearch.ivfTopK]] over the full corpus, plus replay safety).
  *
  * 100 TB shape:
  *  - the index directory is hive-partitioned by `bucket`, so a probe's
  *    `bucket IN (…)` filter becomes DIRECTORY pruning — a query with
  *    nProbe = 4 of 1024 buckets reads ~0.4 % of the index bytes
  *    (spec asserts `PartitionFilters` on the probe scan);
  *  - per batch the only work is |batch|·nCentroids codegen'd dot
  *    products and one partitioned write — no shuffle of the existing
  *    index, which is never rewritten;
  *  - the probed-bucket id set pulled to the driver is bounded by
  *    nCentroids (the KMeans-centroid gate), never by data.
  *
  * Replay-idempotent like [[ContinuousTrainingPrep]]: each batch
  * overwrites its own `batch=<id>` subdirectory, so a crash-replayed
  * micro-batch rewrites identical files.
  */
object IncrementalIvf {

  /** Assign one arriving slice to buckets and commit it to the index. */
  def processBatch(batch: Dataset[Row], batchId: Long, cents: DataFrame,
                   idCol: String, embCol: String, indexDir: String): Unit = {
    val c = SimSearch.unitized(batch.toDF(), idCol, embCol, idCol, "__ne")
    SimSearch.nearestBuckets(c, cents, idCol, "__ne", 1)
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$indexDir/batch=$batchId")
  }

  /** Wire an embeddings stream into the index. */
  def start(stream: DataFrame, cents: DataFrame, idCol: String,
            embCol: String, indexDir: String, checkpointDir: String)
  : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: Dataset[Row], id: Long) =>
        processBatch(df, id, cents, idCol, embCol, indexDir)
      }
      .start()

  /** Top-K probe against the on-disk index: rank each query's `nProbe`
    * nearest buckets, then scan ONLY those buckets' partitions with the
    * exact cosine rerank shared with the batch path
    * ([[SimSearch.probeRank]]).
    */
  def probe(spark: SparkSession, indexDir: String, queries: DataFrame,
            cents: DataFrame, idCol: String, embCol: String, k: Int,
            nProbe: Int): DataFrame = {
    val q = SimSearch.unitized(queries, idCol, embCol, "query_id", "__qe")
    val probed = SimSearch.nearestBuckets(q, cents, "query_id", "__qe", nProbe)
    // ≤ nCentroids scalar ids — the literal IN list that turns the scan
    // filter into hive-directory pruning
    val buckets = probed.select("bucket").distinct().collect().map(_.getLong(0))
    val index = spark.read.parquet(indexDir)
      .filter(col("bucket").isin(buckets: _*))
      .select(col(idCol), col("__ne"), col("bucket").cast("long").as("bucket"))
    SimSearch.probeRank(probed, index, idCol, k)
  }
}
