package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Scd2

/** Streaming SCD Type-2 — CDC dimension maintenance over micro-batches:
  * each arriving snapshot batch applies [[Scd2]]'s change semantics
  * (close-and-reopen changed keys, insert new keys, no-op identical
  * arrivals) with the BATCH ID as the version stamp. The reconstructed
  * history equals the batch `Scd2` applied sequentially, spec-pinned.
  *
  * Store layout — append-only DELTAS, not history snapshots (a
  * dimension rewritten per batch would be O(batches × dim) on disk):
  * {{{
  *   batch=N/opens/   rows opened by batch N: (key, attrs..., valid_from=N)
  *   batch=N/closes/  (key, valid_from, valid_to=N) — which OPEN row each
  *                    change closed, addressed by its (key, valid_from)
  *   _compacted/v=G/  both sub-stores folded by [[compact]] (GenStore)
  * }}}
  *
  * [[history]] reconstructs the full SCD2 table as `opens LEFT JOIN
  * closes` on (key, valid_from): a row is current iff no close record
  * addresses it. Closes are monotone facts (an open row closes at most
  * once, at one version, derived deterministically from the batch
  * sequence), so reconstruction is order-insensitive and replaying a
  * batch rewrites identical delta files — the [[IncrementalPack]]
  * exactly-once idiom.
  *
  * 100 TB shape: per batch, the current image (needed to diff) is
  * reconstructed from the store — one delta read (O(store) files until
  * [[compact]] folds them, then O(1) generations) and one key-equi
  * join. Dimensions are vocabulary-scale; the heavy side of CDC is the
  * fact stream, which never passes through here.
  */
object IncrementalScd2 {

  private def batchDir(storeDir: String, id: Long) = f"$storeDir/batch=$id"

  private def storeParts(spark: SparkSession, storeDir: String,
                         upTo: Long): Seq[String] =
    GenStore.latestCompaction(spark, storeDir) match {
      case Some((g, mb)) =>
        if (mb >= upTo) throw new IllegalStateException(
          s"IncrementalScd2: batch $upTo would replay but generation $g already " +
            s"folded batches <= $mb. Reset checkpoint+store together, " +
            "or compact only between batches.")
        GenStore.genDir(storeDir, g) +:
          GenStore.liveBatchIds(spark, storeDir, mb).filter(_ < upTo)
            .map(b => s"$storeDir/batch=$b")
      case None =>
        GenStore.liveBatchIds(spark, storeDir, -1L).filter(_ < upTo)
          .map(b => s"$storeDir/batch=$b")
    }

  private def readSub(spark: SparkSession, storeDir: String,
                      parts: Seq[String], sub: String): Option[DataFrame] = {
    val ps = GenStore.nonEmptyPaths(spark, storeDir, parts.map(_ + "/" + sub))
    if (ps.isEmpty) None
    else Some(ps.map(spark.read.parquet(_)).reduce(_ unionByName _))
  }

  private def historyFromParts(spark: SparkSession, storeDir: String,
                               parts: Seq[String], key: String): Option[DataFrame] =
    readSub(spark, storeDir, parts, "opens").map { opens =>
      readSub(spark, storeDir, parts, "closes") match {
        case None => opens
          .withColumn("valid_to", lit(null).cast("long"))
          .withColumn("is_current", lit(true))
        case Some(closes) => opens
          .join(closes.select(col(key), col("valid_from"),
            col("valid_to").as("__vt")), Seq(key, "valid_from"), "left")
          .withColumn("valid_to", col("__vt")).drop("__vt")
          .withColumn("is_current", col("valid_to").isNull)
      }
    }

  /** Apply one snapshot batch. `batch` carries (key, attrs...). */
  def processBatch(batch: DataFrame, batchId: Long, key: String,
                   attrs: Seq[String], storeDir: String): Unit = {
    val spark = batch.sparkSession
    val u = batch.select((key +: attrs).map(col): _*).dropDuplicates(key)
    val prior = storeParts(spark, storeDir, batchId)
    val hist = historyFromParts(spark, storeDir, prior, key)
    var cached: Option[DataFrame] = None
    val (opens, closes) = hist match {
      case None =>
        (u.withColumn("valid_from", lit(batchId)),
          u.limit(0).select(col(key), lit(0L).as("valid_from"),
            lit(0L).as("valid_to")))
      case Some(h) =>
        val current = h.filter(col("is_current")).cache()
        cached = Some(current)
        val uRenamed = u.select(col(key) +: attrs.map(a => col(a).as(s"__u_$a")): _*)
        val joined = current.join(uRenamed, Seq(key), "right")
        val attrDiffers = attrs.map(a => !(col(a) <=> col(s"__u_$a"))).reduce(_ || _)
        val opening = joined.filter(col("is_current").isNull || attrDiffers)
          .select(col(key) +: attrs.map(a => col(s"__u_$a").as(a)): _*)
          .withColumn("valid_from", lit(batchId))
        val closing = joined.filter(col("is_current").isNotNull && attrDiffers)
          .select(col(key))
        val closed = current.join(closing, Seq(key))
          .select(col(key), col("valid_from"), lit(batchId).as("valid_to"))
        (opening, closed)
    }
    val dir = batchDir(storeDir, batchId)
    opens.write.mode("overwrite").parquet(s"$dir/opens")
    closes.write.mode("overwrite").parquet(s"$dir/closes")
    cached.foreach(_.unpersist(blocking = false))
  }

  /** Wire a snapshot stream into the dimension store. `autoCompactEvery`
    * > 0 folds live batches whenever that many have accumulated
    * ([[GenStore.autoCompact]] — replay-safe).
    */
  def start(stream: DataFrame, key: String, attrs: Seq[String],
            storeDir: String, checkpointDir: String,
            autoCompactEvery: Int = 0)
  : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: Dataset[Row], id: Long) =>
        GenStore.autoCompact(df.sparkSession, storeDir, id, autoCompactEvery) {
          compact(df.sparkSession, storeDir)
        }
        processBatch(df.toDF(), id, key, attrs, storeDir)
      }
      .start()

  /** The full SCD2 history (key, attrs..., valid_from, valid_to,
    * is_current) reconstructed from the delta store.
    */
  def history(spark: SparkSession, storeDir: String, key: String): DataFrame =
    historyFromParts(spark, storeDir,
      storeParts(spark, storeDir, Long.MaxValue), key)
      .getOrElse(sys.error(s"IncrementalScd2 store empty: $storeDir"))

  /** Point-in-time image at `version` ([[Scd2.asOf]] over [[history]]). */
  def asOf(spark: SparkSession, storeDir: String, key: String,
           version: Long): DataFrame =
    Scd2.asOf(history(spark, storeDir, key), version)

  /** Fold live batch deltas into the next generation ([[GenStore]]). */
  def compact(spark: SparkSession, storeDir: String): Unit = {
    val prev = GenStore.latestCompaction(spark, storeDir)
    val prevMax = prev.map(_._2).getOrElse(-1L)
    val live = GenStore.liveBatchIds(spark, storeDir, prevMax)
    if (live.nonEmpty) {
      val newGen = prev.map(_._1).getOrElse(0L) + 1
      val parts = prev.map { case (g, _) => GenStore.genDir(storeDir, g) }.toSeq ++
        live.map(b => s"$storeDir/batch=$b")
      val dst = GenStore.genDir(storeDir, newGen)
      for (sub <- Seq("opens", "closes"))
        readSub(spark, storeDir, parts, sub).foreach(
          _.write.mode("overwrite").parquet(s"$dst/$sub"))
      GenStore.commitManifest(spark, storeDir, newGen, live.max)
    }
    GenStore.cleanup(spark, storeDir)
  }
}
