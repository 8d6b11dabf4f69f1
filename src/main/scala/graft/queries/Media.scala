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
      }),

    // Codec-free media near-dup: integer byte-histogram fingerprints
    // (llm.Multimodal.byteHistogramCounts — exact, engine-independent),
    // cosine over same-modality pairs, top-3 most similar per target.
    // This oracle-checks the multimodal NUMERIC path end to end, not
    // just the structural outputs.
    QueryDef("q76_media_fingerprint", Some {
      // normalize-once formulation (mirrors Vector.unitSql): unit vectors
      // per asset, then a plain dot per pair — the same fold order as the
      // Spark side's codegen DotProduct over pre-normalized arrays.
      val dot = "list_aggregate(list_transform(range(1, 17), i -> a.ne[i] * b.ne[i]), 'sum')"
      s"""
      WITH codes AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS modality,
               list_transform(range(1, length(text) + 1), i -> ascii(text[i])) AS cs
        FROM documents),
      hist AS (
        SELECT doc_id, modality,
               list_transform(range(0, 16), j -> len(list_filter(cs, c -> c // 16 = j))) AS h
        FROM codes),
      un AS (
        SELECT doc_id, modality,
               list_transform(h, x -> CAST(x AS DOUBLE) / sqrt(list_aggregate(
                   list_transform(h, y -> CAST(y AS DOUBLE) * y), 'sum'))) AS ne
        FROM hist),
      pairs AS (
        SELECT a.doc_id AS asset_id, b.doc_id AS other_id,
               round($dot, 6) AS cos_sim
        FROM un a JOIN un b
          ON a.modality = b.modality AND a.doc_id <> b.doc_id
        WHERE a.doc_id % 7 = 0)
      SELECT asset_id, other_id, cos_sim, CAST(rnk AS INTEGER) AS rnk
      FROM (SELECT *, row_number() OVER (PARTITION BY asset_id ORDER BY cos_sim DESC, other_id) AS rnk
            FROM pairs)
      WHERE rnk <= 3"""
    },
      (spark, dir) => {
        import graft.engine.expressions.DotProduct
        DotProduct.register(spark)
        // let-bind the histogram: l2Normalize references its argument in
        // a per-element lambda, which would re-evaluate the whole
        // histogram 16x per row without the binding.
        // Cached: the histogram scan (a full pass over every payload's
        // bytes) feeds BOTH join sides — materializing the 16-double
        // fingerprints runs it once, and shrinks the relation from
        // payload-sized to fingerprint-sized (what actually broadcasts).
        // Lazy-return cache — resident sessions release it via
        // GraftSession.withQueryCaches.
        val unit = Multimodal.assetsFromDocuments(T(spark, dir, "documents"))
          .select(col("asset_id"), col("modality"),
            graft.engine.functions.let(Multimodal.byteHistogramCounts(col("payload")))(
              h => graft.engine.functions.l2Normalize(h)).as("ne"))
          .cache()
        // Probe-side repartition + explicit candidate broadcast (the
        // Reports.peerPairs pattern): the 3-value modality key would cap
        // a shuffled join at 3 tasks; broadcasting the fingerprints and
        // spreading the filtered probe side keeps the O(pairs) scoring
        // stage at full cluster width. Exact all-pairs is inherently the
        // small-corpus path — SimSearch LSH/IVF is the 100 TB route
        // (SCALE.md).
        val n = spark.sessionState.conf.numShufflePartitions
        val a = unit.select(col("asset_id"), col("modality"), col("ne").as("ne_a"))
          .filter(col("asset_id") % 7 === 0).repartition(n)
        val b = unit.select(col("asset_id").as("other_id"), col("modality"), col("ne").as("ne_b"))
        val pairs = a.join(broadcast(b), Seq("modality"))
          .filter(col("asset_id") =!= col("other_id"))
          .select(col("asset_id"), col("other_id"),
            round(DotProduct.dot(col("ne_a"), col("ne_b")), 6).as("cos_sim"))
        graft.ops.TopK.exactPerKey(pairs, Seq("asset_id"),
            Seq(col("cos_sim").desc, col("other_id").asc), 3, "rnk")
          .withColumn("rnk", col("rnk").cast("int"))
          .select("asset_id", "other_id", "cos_sim", "rnk")
      }),

    // REAL codec end to end: encode a deterministic grayscale PNG per
    // doc (sample(x,y) = (id*31 + x*7 + y*13) mod 256, JDK PNG writer),
    // decode it back with javax.imageio (llm.Multimodal.ImageIoDecoder),
    // histogram the decoded pixels. PNG is lossless, so the oracle can
    // compute the exact same histogram from the pixel FORMULA without
    // ever touching an image library — a full-hash gate on the decode
    // path itself, not just the plumbing around it.
    QueryDef("q199_imageio_decode", Some("""
      WITH ids AS (SELECT doc_id FROM documents WHERE doc_id % 5 = 0),
      px AS (
        SELECT i.doc_id, ((i.doc_id * 31 + x.x * 7 + y.y * 13) % 256) // 16 AS bin
        FROM ids i, range(0, 24) AS x(x), range(0, 16) AS y(y)),
      cnt AS (SELECT doc_id, bin, count(*) AS n FROM px GROUP BY 1, 2)
      SELECT i.doc_id AS asset_id, CAST(b.j AS INTEGER) AS bin,
             CAST(coalesce(c.n, 0) AS INTEGER) AS n_px
      FROM ids i CROSS JOIN range(0, 16) AS b(j)
      LEFT JOIN cnt c ON c.doc_id = i.doc_id AND c.bin = b.j"""),
      (spark, dir) => {
        val ids = T(spark, dir, "documents").select("doc_id")
          .filter(col("doc_id") % 5 === 0)
        val assets = Multimodal.syntheticPngAssets(ids, "doc_id", w = 24, h = 16)
        Multimodal.extractFeatures(assets, Multimodal.ImageIoDecoder)
          .select(col("asset_id"),
            posexplode(col("features")).as(Seq("bin", "n_px")))
          .select(col("asset_id"), col("bin").cast("int").as("bin"),
            col("n_px").cast("int").as("n_px"))
      }),

    // REAL audio codec end to end (q199's twin for the audio modality):
    // encode deterministic 16-bit PCM WAVs (sample(i) = (id*31 + i*7)
    // mod 65536 − 32768, hand-built RIFF header), decode back with
    // javax.sound.sampled (llm.Multimodal.WavDecoder), histogram the
    // amplitudes. PCM is uncompressed, so the oracle computes the same
    // histogram from the sample formula without any audio library.
    QueryDef("q214_wav_decode", Some("""
      WITH ids AS (SELECT doc_id FROM documents WHERE doc_id % 5 = 0),
      s AS (SELECT i.doc_id, ((i.doc_id * 31 + x.i * 7) % 65536) // 4096 AS bin
            FROM ids i, range(0, 400) AS x(i)),
      cnt AS (SELECT doc_id, bin, count(*) AS n FROM s GROUP BY 1, 2)
      SELECT i.doc_id AS asset_id, CAST(b.j AS INTEGER) AS bin,
             CAST(coalesce(c.n, 0) AS INTEGER) AS n_samples
      FROM ids i CROSS JOIN range(0, 16) AS b(j)
      LEFT JOIN cnt c ON c.doc_id = i.doc_id AND c.bin = b.j"""),
      (spark, dir) => {
        val ids = T(spark, dir, "documents").select("doc_id")
          .filter(col("doc_id") % 5 === 0)
        val assets = Multimodal.syntheticWavAssets(ids, "doc_id", nSamples = 400)
        Multimodal.extractFeatures(assets, Multimodal.WavDecoder)
          .select(col("asset_id"),
            posexplode(col("features")).as(Seq("bin", "n_samples")))
          .select(col("asset_id"), col("bin").cast("int").as("bin"),
            col("n_samples").cast("int").as("n_samples"))
      }),

    // Perceptual image near-dup (llm.Multimodal.aHashNearDups): decode
    // real PNGs, 8×8 average-hash over the pixels (bit = 64·cellSum >
    // totalSum, pure-integer), Hamming-banded candidate join (8 bands —
    // complete for hamming ≤ 6 by pigeonhole), exact Hamming verify.
    // The corpus plants a near-identical twin (asset 2·id+1, one pixel
    // corrupted to 255) next to every 20th base asset (2·id); the
    // oracle replays hash + ALL-pairs Hamming from the pixel formula —
    // legal because completeness makes banding ≡ all-pairs — so the
    // full hash gate covers decode, hash, banding and verify at once.
    QueryDef("q216_phash_neardup", Some("""
      WITH ids AS (SELECT doc_id FROM documents WHERE doc_id % 5 = 0),
      base AS (SELECT doc_id, doc_id * 2 AS aid, FALSE AS sp FROM ids
               UNION ALL
               SELECT doc_id, doc_id * 2 + 1, TRUE FROM ids WHERE doc_id % 20 = 0),
      px AS (SELECT b.aid, (y.y // 2) * 8 + (x.x // 3) AS c,
                    CASE WHEN b.sp AND x.x = 0 AND y.y = 0 THEN 255
                         ELSE (b.doc_id * 31 + x.x * 7 + y.y * 13) % 256 END AS v
             FROM base b, range(0, 24) AS x(x), range(0, 16) AS y(y)),
      cell AS (SELECT aid, c, sum(v) AS s FROM px GROUP BY 1, 2),
      tot AS (SELECT aid, sum(s) AS t FROM cell GROUP BY 1),
      bits AS (SELECT c.aid, c.c, CASE WHEN 64 * c.s > t.t THEN 1 ELSE 0 END AS b
               FROM cell c JOIN tot t USING (aid)),
      ham AS (SELECT a.aid AS id_a, b.aid AS id_b,
                     sum(CASE WHEN a.b <> b.b THEN 1 ELSE 0 END) AS hamming
              FROM bits a JOIN bits b ON a.c = b.c AND a.aid < b.aid
              GROUP BY 1, 2)
      SELECT id_a, id_b, CAST(hamming AS INTEGER) AS hamming
      FROM ham WHERE hamming <= 6"""),
      (spark, dir) => {
        val ids = T(spark, dir, "documents").select("doc_id")
          .filter(col("doc_id") % 5 === 0)
        val base = Multimodal.syntheticPngAssets(ids, "doc_id", w = 24, h = 16,
          idScale = 2)
        val twins = Multimodal.syntheticPngAssets(
          ids.filter(col("doc_id") % 20 === 0), "doc_id", w = 24, h = 16,
          idScale = 2, idOffset = 1, spot255 = true)
        Multimodal.aHashNearDups(base.unionByName(twins), hamMax = 6, nBlocks = 8)
      })
  )
}
