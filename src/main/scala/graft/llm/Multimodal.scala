package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video travel as opaque
  * `binary` payloads with typed metadata; decode/feature-extract runs
  * partition-wise so a real codec slots in without touching the plan.
  *
  * The decode step is PLUGGABLE ([[MediaDecoder]]): the contract is
  * open-once-per-partition, decode-per-row, close-at-exhaustion —
  * exactly the lifecycle a JNI/FFM codec or an ONNX feature extractor
  * needs, with state amortized across a partition's rows and never
  * held beyond one row's output at a time. This container ships no
  * image/audio codecs, so the shipped instance is [[HistogramDecoder]]
  * — a deterministic stand-in (16-bin byte histogram, L1-normalized)
  * with the same shape a real decoder would have (bytes in, fixed-dim
  * float features out). Everything around it (schema, batch iteration,
  * partition preservation, column contracts, lifecycle) is real and
  * spec-asserted (LlmOpsSpec "MediaDecoder seam").
  */
object Multimodal {

  val featureDim = 16

  /** The pluggable decode contract. Implementations are shipped to
    * executors (Serializable) and driven partition-wise by
    * [[extractFeatures]]:
    *  - `open()` runs ONCE per partition before any row — acquire
    *    codec/model state here, never in `decode`;
    *  - `decode(payload)` runs per row: payload bytes in (null/empty
    *    must yield a zero vector, not throw), `featureDim` floats out;
    *  - `close()` runs when the partition's iterator is exhausted —
    *    release native state. Must be idempotent (the consumer may
    *    probe `hasNext` again after exhaustion).
    */
  trait MediaDecoder extends Serializable {
    def featureDim: Int
    def open(): Unit = ()
    def decode(payload: Array[Byte]): Array[Float]
    def close(): Unit = ()
  }

  /** The codec-free default/test instance: deterministic 16-bin byte
    * histogram, L1-normalized. A real codec replaces this keeping the
    * [[MediaDecoder]] lifecycle.
    */
  object HistogramDecoder extends MediaDecoder {
    val featureDim: Int = Multimodal.featureDim
    def decode(payload: Array[Byte]): Array[Float] = {
      val bins = new Array[Float](featureDim)
      if (payload == null || payload.isEmpty) return bins
      var i = 0
      while (i < payload.length) {
        bins((payload(i) & 0xff) / featureDim) += 1f
        i += 1
      }
      val n = payload.length.toFloat
      var j = 0
      while (j < featureDim) { bins(j) /= n; j += 1 }
      bins
    }
  }

  /** Payload schema: one row per asset. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  /** Back-compat alias for the default decode ([[HistogramDecoder]]). */
  def fakeDecode(payload: Array[Byte]): Array[Float] =
    HistogramDecoder.decode(payload)

  /** Decode + feature-extract, partition-wise (the Scala analogue of a
    * batched `mapInPandas` decode UDF): no shuffle; decoder lifecycle
    * at PARTITION bounds (open before the first row, close at
    * exhaustion — never per row); one row in flight at a time, so
    * memory is bounded by a single payload regardless of partition
    * size; output schema fixed.
    */
  def extractFeatures(assets: DataFrame,
                      decoder: MediaDecoder = HistogramDecoder): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("modality", StringType, nullable = false),
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val rdd = assets.select("asset_id", "modality", "payload").rdd.mapPartitions { it =>
      decoder.open()
      new Iterator[Row] {
        private var closed = false
        def hasNext: Boolean = {
          val h = it.hasNext
          if (!h && !closed) { closed = true; decoder.close() }
          h
        }
        def next(): Row = {
          val r = it.next()
          val payload = r.getAs[Array[Byte]]("payload")
          Row(r.getLong(0), r.getString(1),
            if (payload == null) 0 else payload.length,
            decoder.decode(payload).toSeq)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling: every `stride`-th fixed-size chunk of the payload
    * (a video's frame-sample analogue), as pure column ops — slicing
    * binary needs no decode.
    */
  def sampleChunks(assets: DataFrame, chunkBytes: Int, stride: Int): DataFrame =
    assets.select(col("asset_id"),
      posexplode(transform(
        sequence(lit(0), ((length(col("payload")) - 1) / (chunkBytes * stride)).cast("int")),
        i => substring(col("payload"), (i * chunkBytes * stride + 1).cast("int"), lit(chunkBytes))))
        .as(Seq("chunk_idx", "chunk")))

  /** STUB resize: updates the (width, height) metadata and subsamples
    * the payload by the area ratio — a real image resize keeps this
    * exact signature and column contract (payload in, payload out,
    * metadata consistent). Pure column ops, no shuffle.
    */
  def resizeStub(assets: DataFrame, newW: Int, newH: Int): DataFrame = {
    val ratio = (col("width") * col("height")).cast("double") / (newW * newH)
    val newLen = greatest(lit(1),
      (length(col("payload")) / greatest(ratio, lit(1.0))).cast("int"))
    assets.withColumn("payload", col("payload").substr(lit(1), newLen))
      .withColumn("width", lit(newW))
      .withColumn("height", lit(newH))
  }

  /** 16-bin byte histogram of a payload as EXACT integer counts, pure
    * column ops: bin j = #bytes with b div 16 == j. The codec-free
    * content fingerprint for opaque payloads (sniffing, near-dup) — and
    * being integer-exact it is engine-independent, so an external oracle
    * can replay it bit-for-bit (ASCII payloads equal their string form).
    * The payload is bound to a lambda variable before the per-byte loop
    * (see TextOps.shingles for why).
    */
  def byteHistogramCounts(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    // one split pass per payload; the codes array is itself bound before
    // the 16 bin filters reference it (each reference would otherwise
    // re-evaluate the whole per-byte loop)
    val codes = transform(split(payload.cast("string"), ""), c => ascii(c))
    graft.engine.functions.let(codes)(cs =>
      transform(sequence(lit(0), lit(featureDim - 1)),
        j => size(filter(cs, c => floor(c / featureDim) === j))))
  }

  /** Build an assets frame from the documents table (text bytes as the
    * stand-in payload) — the fixture generator for tests and queries.
    */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("asset_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("modality"),
      col("text").cast("binary").as("payload"),
      lit(64).as("width"), lit(48).as("height"))
}
