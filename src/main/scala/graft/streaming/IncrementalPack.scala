package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

import graft.ops.PrefixSum

/** Streaming continuation of the concat-and-chunk sequence packing
  * (q108): documents arrive in micro-batches and are appended to the
  * SAME global token stream, pack ids and offsets continuing exactly
  * where the previous batch stopped — the ingestion shape of a training
  * corpus that grows daily.
  *
  * Exactly-once protocol (both halves idempotent under batch replay):
  *  - output: each micro-batch overwrites its own `batch=<id>`
  *    subdirectory, so a replayed batch rewrites identical files
  *    instead of appending duplicates;
  *  - carry state: the token offset AFTER batch N is written to
  *    `offset-N` via atomic rename; batch N reads its carry-in from
  *    `offset-(N-1)`, never from memory, so a restarted query (or a
  *    retried batch) recomputes from the same carry. A tiny text file
  *    per batch — the state is one long, not a table.
  */
object IncrementalPack {

  private def carryPath(stateDir: String, batchId: Long) =
    Paths.get(stateDir, s"offset-$batchId")

  /** Carry-in for `batchId`: the offset committed by its predecessor.
    * FAILS FAST when batchId > 0 and the predecessor's offset file is
    * missing (state dir lost or partially restored while the output and
    * checkpoint survived): silently restarting from offset 0 would
    * corrupt the global token stream — earlier batch outputs remain on
    * disk with offsets this batch would then reuse. Recovery is an
    * explicit operator decision (restore the state dir, or reset output
    * + checkpoint + state together), never an implicit default.
    */
  def readCarry(stateDir: String, batchId: Long): Long = {
    if (batchId == 0) 0L
    else {
      val p = carryPath(stateDir, batchId - 1)
      if (!Files.exists(p)) throw new IllegalStateException(
        s"IncrementalPack carry state missing: $p does not exist but batch " +
          s"$batchId is not the first. Refusing to re-pack from offset 0 — " +
          "restore the state dir or reset checkpoint+output+state together.")
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong
    }
  }

  /** Atomically record the offset reached after `batchId`. */
  def writeCarry(stateDir: String, batchId: Long, offset: Long): Unit = {
    Files.createDirectories(Paths.get(stateDir))
    val tmp = Paths.get(stateDir, s".offset-$batchId.tmp")
    Files.write(tmp, offset.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, carryPath(stateDir, batchId),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Pack one batch of (doc_id, n) rows starting at global token offset
    * `carryIn`; returns the pack rows and the carry-out offset. Pure:
    * same batch + same carry ⇒ same rows (the q108 layout algebra with
    * a shifted origin).
    */
  def packBatch(batch: DataFrame, carryIn: Long, cap: Int): (DataFrame, Long) = {
    val withCum = PrefixSum.withRunningSum(batch, "n", "__cb0", Seq(col("doc_id")))
      .withColumn("cb", col("__cb0") + carryIn)
      .withColumn("ca", col("cb") + col("n"))
    val packed = withCum
      .select(col("doc_id"), col("cb"), col("ca"),
        explode(sequence(expr(s"cb div $cap"), expr(s"(ca - 1) div $cap"))).as("pack_id"))
      .select(col("doc_id"),
        col("pack_id").cast("int").as("pack_id"),
        (least(col("ca"), (col("pack_id") + 1) * cap)
          - greatest(col("cb"), col("pack_id") * cap)).cast("int").as("n_pack_tokens"),
        (greatest(col("cb"), col("pack_id") * cap) - col("pack_id") * cap)
          .cast("int").as("offset_in_pack"))
    val total = batch.agg(coalesce(sum("n"), lit(0L))).head().getLong(0)
    (packed, carryIn + total)
  }

  /** The foreachBatch body: tokenize-count, pack with the carried
    * offset, idempotently (over)write this batch's partition, commit the
    * new offset. Exposed (not inlined in [[start]]) so replay semantics
    * are directly testable without a streaming harness.
    */
  def processBatch(batch: Dataset[Row], batchId: Long, outDir: String,
                   stateDir: String, cap: Int): Unit = {
    val counts = batch
      .select(col("doc_id"),
        size(graft.llm.TextOps.tokenize(col("text"))).cast("long").as("n"))
    val (packed, carryOut) = packBatch(counts, readCarry(stateDir, batchId), cap)
    packed.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    writeCarry(stateDir, batchId, carryOut)
  }

  /** Wire a documents stream into the incremental packer. */
  def start(stream: DataFrame, outDir: String, stateDir: String,
            checkpointDir: String, cap: Int = 64)
  : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: Dataset[Row], id: Long) =>
        processBatch(df, id, outDir, stateDir, cap)
      }
      .start()
}
