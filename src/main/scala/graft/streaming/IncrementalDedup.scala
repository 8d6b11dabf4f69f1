package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, LongType, StructField, StructType}

import graft.llm.DedupOps
import graft.ops.ConnectedComponents

/** Streaming corpus admission with MinHash-LSH near-dup screening — the
  * continuous form of the q26/q129 batch dedup: documents arrive in
  * micro-batches and a document is ADMITTED only when its verified
  * Jaccard against every previously admitted document (and every
  * admitted representative of its own batch) stays below `tau`. This is
  * the ingestion gate of a continuously-growing training corpus: the
  * admitted set never contains a candidate pair at or above the
  * threshold, no matter how the arrival order slices the corpus.
  *
  * Reference counterpart: none — the reference dedups only within one
  * static frame (`main.py:64` drop_duplicates); the streaming
  * admission shape is the brief's training-data-pipeline extension.
  *
  * Decision policy (deterministic, documented):
  *  1. HISTORY SCREEN — batch docs whose banded signature collides with
  *     a stored signature are verified (exact Jaccard on the hashed
  *     shingle sets); a verified match ≥ tau rejects the doc with
  *     `dup_of` = the smallest matching admitted id.
  *  2. IN-BATCH SCREEN — survivors of (1) run the q26 LSH self-join;
  *     verified edges form components ([[ConnectedComponents]] min-label)
  *     and only each component's minimum id is admitted, `dup_of` = the
  *     component representative for the rest. Near-duplication is not
  *     transitive, so min-id-per-component is a policy, not a theorem —
  *     the same policy as the q99 semantic dedup.
  *
  * Store layout under `storeDir` (append-only, one dir per batch):
  * {{{
  *   batch=N/sigs/sb=K/   (id, band, sig)  — admitted docs' band rows,
  *                        hive-partitioned by sb = signature bucket
  *   batch=N/docs/        (id, sh)         — admitted docs' xxhash64'd
  *                        shingle sets (8-byte elements, q129 discipline)
  *   batch=N/decisions/   (id, admitted, dup_of)
  * }}}
  *
  * 100 TB shape:
  *  - Only fixed-width (id, band, sig) rows enter the history collision
  *    join; the signature store is `bands` × ~24 bytes per admitted doc
  *    (a 1B-doc corpus at bands=4 is ~100 GB of signatures vs the
  *    corpus' tens of TB) and the shingle arrays never shuffle — the
  *    verify joins them to the candidate sliver where they are read.
  *  - The signature store is hive-partitioned by `sb = pmod(xxhash64(
  *    sig), sigBuckets)`. A batch computes its own distinct `sb` set
  *    (driver pull bounded by `sigBuckets` — the [[IncrementalIvf]]
  *    bucket gate, never data-sized) and the history read prunes to
  *    those partitions: a small batch against a huge history touches
  *    only the buckets it can possibly collide in.
  *  - History DOCS are read only to verify candidates; the join is
  *    id-equi and AQE sizes it. At extreme history/batch ratios the
  *    [[graft.ops.BloomPrune]] idiom drops non-candidate doc rows at
  *    the scan.
  *  - Per-batch dir count grows linearly in batches; the
  *    [[IncrementalIvf.compact]] generation protocol applies verbatim
  *    to `sigs`/`docs` (same layout: partitioned parquet under
  *    versioned dirs).
  *
  * Exactly-once: batch N derives only from dirs `batch<N` and the batch
  * data, and OVERWRITES its own `batch=N` dir — a crash-replayed batch
  * rewrites identical files ([[IncrementalPack]] idiom). The spec pins
  * replay identity and the no-admitted-near-dup invariant.
  */
object IncrementalDedup {

  /** @param bands       LSH bands (q26 default discipline)
    * @param rowsPerBand minhash rows concatenated per band
    * @param tau         verified-Jaccard rejection threshold
    * @param sigBuckets  hive partitions of the signature store; also the
    *                    bound on the per-batch driver pull
    */
  final case class Config(bands: Int = 4, rowsPerBand: Int = 2,
                          tau: Double = 0.5, sigBuckets: Int = 64)

  private def batchDir(storeDir: String, id: Long) = f"$storeDir/batch=$id"

  private def decisionSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("admitted", BooleanType, nullable = false),
    StructField("dup_of", LongType, nullable = true)))

  /** Existing predecessor batch dirs (`batch<upTo`), via the store's own
    * Hadoop FileSystem so any Spark-supported scheme works.
    */
  private def priorBatchDirs(spark: SparkSession, storeDir: String,
                             upTo: Long): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(storeDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("batch="))
      .filter(_.getName.stripPrefix("batch=").toLong < upTo)
      .sortBy(_.getName.stripPrefix("batch=").toLong)
      .map(_.toString)
  }

  /** Screen one micro-batch and commit its admitted docs + decisions.
    *
    * @param batch       (idCol: integral, shinglesCol: array<string>) frame;
    *                    empty-shingle docs are admitted trivially (they can
    *                    match nothing)
    */
  def processBatch(batch: DataFrame, batchId: Long, idCol: String,
                   shinglesCol: String, storeDir: String,
                   cfg: Config = Config()): Unit = {
    val spark = batch.sparkSession
    graft.engine.expressions.MinHashBands.register(spark)

    val dedupped = batch
      .select(col(idCol).cast("long").as("id"),
        array_distinct(col(shinglesCol)).as("__raw"))
      .dropDuplicates("id")
    // Empty docs can near-dup nothing — admit without signatures.
    val empties = dedupped.filter(size(col("__raw")) === 0).select("id")
    val b = dedupped.filter(size(col("__raw")) > 0)
      .select(col("id"),
        // signatures hash the raw strings (MinHashBands contract); the
        // stored/verified sets are 8-byte element hashes (q129 discipline:
        // Jaccard is identical modulo 64-bit collisions within one union)
        graft.engine.expressions.MinHashBands.bandSignatures(
          col("__raw"), cfg.bands, cfg.rowsPerBand).as("__sigs"),
        array_distinct(transform(col("__raw"), t => xxhash64(t))).as("sh"))
      .cache()
    val sigs = b.select(col("id"), posexplode(col("__sigs")).as(Seq("band", "sig")))
      .withColumn("sb", pmod(xxhash64(col("sig")), lit(cfg.sigBuckets)).cast("int"))
      .cache()

    // ---- 1. history screen -------------------------------------------
    val prior = priorBatchDirs(spark, storeDir, batchId)
    val histDups: DataFrame =
      if (prior.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
          StructType(Seq(StructField("id", LongType), StructField("dup_of", LongType))))
      else {
        // Bounded driver pull: distinct signature buckets of THIS batch
        // (≤ sigBuckets values) → partition pruning on the history scan.
        val sbSet = sigs.select("sb").distinct().collect().map(_.getInt(0)).toSeq
        // One read per batch dir (multi-root hive discovery rejects
        // sibling partitioned trees); each scan prunes to the batch's
        // buckets before the union.
        val histSigs = prior.map(p => spark.read.parquet(p + "/sigs")
          .filter(col("sb").isin(sbSet: _*))).reduce(_ unionByName _)
        val cand = sigs
          .join(histSigs.select(col("sb"), col("band"), col("sig"),
            col("id").as("hid")), Seq("sb", "band", "sig"))
          .select("id", "hid").distinct()
        val histDocs = spark.read.parquet(prior.map(_ + "/docs"): _*)
        cand
          .join(b.select(col("id"), col("sh")), "id")
          .join(histDocs.select(col("id").as("hid"), col("sh").as("hsh")), "hid")
          .filter(DedupOps.jaccard(col("sh"), col("hsh")) >= cfg.tau)
          .groupBy("id").agg(min("hid").as("dup_of"))
      }
    val histDupsCached = histDups.cache()

    // ---- 2. in-batch screen ------------------------------------------
    val survivors = b.join(histDupsCached.select("id"), Seq("id"), "left_anti").cache()
    val sSigs = sigs.join(survivors.select("id"), "id")
    val sPairs = sSigs.select(col("band"), col("sig"), col("id").as("id_a"))
      .join(sSigs.select(col("band"), col("sig"), col("id").as("id_b")),
        Seq("band", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val edges = sPairs
      .join(survivors.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(survivors.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .filter(DedupOps.jaccard(col("sh_a"), col("sh_b")) >= cfg.tau)
      .select("id_a", "id_b")
    val comps = ConnectedComponents.labelPropagation(edges, "id_a", "id_b")
    val inBatchDups = comps.filter(col("node") =!= col("component"))
      .select(col("node").as("id"), col("component").as("dup_of"))

    // ---- decisions + commit ------------------------------------------
    val rejected = histDupsCached.unionByName(inBatchDups)
    val decisions = dedupped.select("id")
      .join(rejected, Seq("id"), "left")
      .select(col("id"), col("dup_of").isNull.as("admitted"), col("dup_of"))
    val dir = batchDir(storeDir, batchId)
    // decisions first is NOT the commit point — every dir is rewritten
    // on replay; readers of a half-written batch dir are out of scope
    // (the store is read between batches, as the spec stages it).
    decisions.select(
        col("id"), col("admitted"), col("dup_of").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/decisions")
    val admittedIds = decisions.filter(col("admitted")).select("id")
    survivors.join(admittedIds, "id").select("id", "sh")
      .write.mode("overwrite").parquet(s"$dir/docs")
    sigs.join(admittedIds, "id").select("id", "band", "sig", "sb")
      .write.mode("overwrite").partitionBy("sb").parquet(s"$dir/sigs")
    // empty-shingle admits carry no signatures/docs rows by construction
    val _ = empties // (documents with no shingles appear only in decisions)

    Seq(b, sigs, histDupsCached, survivors).foreach(_.unpersist(blocking = false))
  }

  /** Wire a document stream into the admission store. */
  def start(stream: DataFrame, idCol: String, shinglesCol: String,
            storeDir: String, checkpointDir: String, cfg: Config = Config())
  : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: Dataset[Row], id: Long) =>
        processBatch(df.toDF(), id, idCol, shinglesCol, storeDir, cfg)
      }
      .start()

  /** All admitted docs' hashed shingle sets across the store. */
  def admitted(spark: SparkSession, storeDir: String): DataFrame = {
    val dirs = priorBatchDirs(spark, storeDir, Long.MaxValue)
    require(dirs.nonEmpty, s"IncrementalDedup store empty: $storeDir")
    spark.read.parquet(dirs.map(_ + "/docs"): _*)
  }

  /** Every admission decision (id, admitted, dup_of) across the store. */
  def decisions(spark: SparkSession, storeDir: String): DataFrame = {
    val dirs = priorBatchDirs(spark, storeDir, Long.MaxValue)
    require(dirs.nonEmpty, s"IncrementalDedup store empty: $storeDir")
    spark.read.parquet(dirs.map(_ + "/decisions"): _*)
  }
}
