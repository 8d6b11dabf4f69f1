package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.flows.TrainingPrep
import graft.llm.Decontaminate
import graft.ops.Dedup

/** Streaming continuation of the [[graft.flows.TrainingPrep]] pipeline:
  * a corpus prepared once in batch keeps GROWING, and each arriving
  * slice must flow through the SAME prep stages — dedup against
  * everything already ingested, decontamination against the same fixed
  * benchmark set, the per-row gates, then sequence packing that
  * continues the global token stream where the previous batch stopped.
  *
  * Stage reuse is literal, not parallel code: per-row stages come from
  * `TrainingPrep.normalizedCounts`, the fingerprint key from
  * `Dedup.fingerprint`, decontamination from
  * `Decontaminate.contaminatedIdsAgainst`, and the offset continuation
  * from [[IncrementalPack]] — so the streamed result equals the batch
  * result ON THE SAME PREFIX by construction (pinned by
  * ContinuousTrainingPrepSpec, including a mid-corpus restart).
  *
  * Cross-batch state, all file-backed and replay-idempotent:
  *  - `fp/batch=<N>/` — parquet of fingerprints FIRST seen in batch N
  *    (16-byte keys, never text). Batch N dedups against the union of
  *    batches < N, so a replayed batch reads exactly what the crashed
  *    attempt read and rewrites its own directory.
  *  - `offset-<N>` — the IncrementalPack token-offset carry.
  *
  * Exactness requires arrival order consistent with doc_id (append-only
  * corpus, monotone ids across batches — the natural ingestion shape):
  * then "first seen" and the batch run's min-id representative are the
  * same document, and concatenating per-batch packs in batch order
  * equals the one-shot doc_id-ordered pack.
  *
  * The eval set is a FIXED frame (benchmarks exist before prep starts),
  * so batch and continuation check contamination against identical
  * grams; at scale only its distinct 8-byte gram hashes are rescanned
  * per batch, and the Bloom-prefilter path bounds the per-batch shuffle.
  */
object ContinuousTrainingPrep {

  private def fpDir(stateDir: String, batchId: Long) =
    s"$stateDir/fp/batch=$batchId"

  /** Fingerprints committed by batches strictly before `batchId`. */
  private def seenFingerprints(spark: SparkSession, stateDir: String,
                               batchId: Long): DataFrame = {
    val dirs = (0L until batchId).map(fpDir(stateDir, _))
      .filter(d => Files.exists(Paths.get(d)))
    if (dirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("__fp",
            org.apache.spark.sql.types.StringType))))
    else spark.read.parquet(dirs: _*).select("__fp")
  }

  /** Process one arriving corpus slice `(doc_id, source, text)`:
    * dedup (in-batch + against history), decontaminate against the
    * static eval set, run the shared per-row stages, pack continuing
    * from the carried offset, and commit this batch's new fingerprints
    * and carry-out. Idempotent under replay: every write overwrites a
    * per-batch location and every read sees only predecessors' state.
    */
  def processBatch(batch: Dataset[Row], batchId: Long, evalDocs: DataFrame,
                   cfg: TrainingPrep.Config, outDir: String,
                   stateDir: String): Unit = {
    val spark = batch.sparkSession

    // 1. exact dedup, incrementally: first-per-fingerprint within the
    // batch (min doc_id — byFingerprint's representative), then drop
    // fingerprints any earlier batch committed.
    val withFp = batch.withColumn("__fp", Dedup.fingerprint(Seq("text")))
    val inBatch = Dedup.firstPerKey(withFp, Seq("__fp"), Seq(col("doc_id").asc))
    val fresh = inBatch
      .join(seenFingerprints(spark, stateDir, batchId), Seq("__fp"), "left_anti")
      .cache()

    // 4. contamination against the fixed benchmark set — the identical
    // gram join the batch run does, restricted to this slice's train
    // side (eval-slice docs are held out by stage 2 regardless).
    val contaminated = Decontaminate.contaminatedIdsAgainst(
      fresh.filter(col("doc_id") % cfg.evalModulus =!= 0).select("doc_id", "text"),
      evalDocs, "doc_id", "text", n = 3, bloomPrefilter = true)

    // 2/3/5/6 shared verbatim with the batch path, then the offset-
    // continued packing (7).
    val counts = TrainingPrep.normalizedCounts(
      fresh.drop("__fp"), contaminated, cfg)
    val (packed, carryOut) =
      IncrementalPack.packBatch(counts, IncrementalPack.readCarry(stateDir, batchId),
        cfg.packCap)
    packed.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")

    // commit state AFTER output: a crash between the two replays the
    // batch, which rereads the same predecessors and rewrites the same
    // files.
    fresh.select("__fp").write.mode("overwrite").parquet(fpDir(stateDir, batchId))
    IncrementalPack.writeCarry(stateDir, batchId, carryOut)
    fresh.unpersist()
  }

  /** Wire a documents stream into the continuation. */
  def start(stream: DataFrame, evalDocs: DataFrame, cfg: TrainingPrep.Config,
            outDir: String, stateDir: String, checkpointDir: String)
  : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: Dataset[Row], id: Long) =>
        processBatch(df, id, evalDocs, cfg, outDir, stateDir)
      }
      .start()
}
