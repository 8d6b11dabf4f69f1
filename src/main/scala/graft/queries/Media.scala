package graft.queries

import org.apache.spark.sql.functions._
import graft.llm.Multimodal

/** Multimodal binary-column plumbing exercised end-to-end: documents'
  * text bytes stand in for media payloads; partition-wise feature
  * extraction (decode stubbed, see `llm.Multimodal`) + binary chunk
  * sampling. The oracle checks the structural outputs (sizes, chunk
  * counts, modality routing); the histogram math is ScalaTest-verified.
  */
object Media {

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q42_multimodal", Some("""
      SELECT doc_id AS asset_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS modality,
             CAST(length(text) AS INTEGER) AS n_bytes,
             CAST((length(text) - 1) // 512 + 1 AS INTEGER) AS n_chunks
      FROM documents"""),
      (spark, dir) => {
        val assets = Multimodal.assetsFromDocuments(T(spark, dir, "documents"))
        val feats = Multimodal.extractFeatures(assets)
          .select("asset_id", "modality", "n_bytes")
        val chunks = Multimodal.sampleChunks(assets, chunkBytes = 128, stride = 4)
          .groupBy("asset_id").agg(count(lit(1)).cast("int").as("n_chunks"))
        feats.join(chunks, "asset_id")
          .select("asset_id", "modality", "n_bytes", "n_chunks")
      })
  )
}
