package graft.queries

import org.apache.spark.sql.functions._
import graft.llm.TextOps
import graft.ops.Sampling

/** Training-corpus curation: the steps between a raw 100 TB crawl and a
  * training set — context-window chunking, benchmark decontamination,
  * text normalization, repetition filtering, and domain mixing.
  *
  * Every operator here is a narrow per-row projection (codegen'd column
  * expressions, no UDFs) until an explicit join/aggregation, so the
  * corpus scan parallelizes trivially; the only shuffles are the
  * decontamination gram join (8-byte hashed keys, never document text)
  * and its final per-doc count aggregation.
  *
  * Reference scope: the reference has NO text-curation surface — its
  * queries are the relational/ML flows of SURVEY.md §2. These are the
  * beyond-reference curation stages a production pre-training pipeline
  * runs on the same tables (SURVEY.md "LLM-data-pipeline operators").
  */
object Curation {

  /** Tokens per training context window (q103). */
  val ChunkCap = 32

  /** Tokens per packed training sequence (q108). */
  val PackCap = 64

  /** Per-source token quota (q114). */
  val TokenBudget = 2000L

  /** Per-source document cap (q201). */
  val SourceCap = 100

  /** Slot budget apportioned across sources (q205). */
  val AllocBudget = 9973L

  /** q206 span-corruption knobs: block width and 1-in-N selection. */
  val SpanLen = 3
  val SpanSelMod = 8

  /** q210 content-defined chunk boundary rate (1-in-N tokens). */
  val CdcSelMod = 8

  /** Sliding-window chunk size and stride (q117); overlap = 64−48. */
  val OverlapWindow = 64
  val OverlapStride = 48

  /** q126 document-frequency cap: grams shared by more than this many
    * documents are boilerplate, generate no evidence pairs (bounds the
    * posting-join pair space exactly like q120's SimMaxDf).
    */
  val EvidenceMaxDf = 100

  /** q127 global token budget. */
  val SelectBudget = 10000L

  /** q151 batch size for the padding-waste report. */
  val PadBatch = 8

  /** q152 per-source eval fraction (exact quota). */
  val EvalRate = 0.1

  /** Quality-weighted subsample size (q262). */
  val QualitySampleN = 200

  /** Per-source quality-weighted quota (q268). */
  val StratumSampleK = 25

  private val stopSqlList = Text.Stop.map(s => s"'$s'").mkString(", ")

  /** Shared oracle CTE prefix of the A-ES samplers (q262 global /
    * q268 per-stratum): the q28 quality weight (+0.05 floor) and the
    * md5 hash-uniform, ending at CTE `w(doc_id, source, wt, u)` — one
    * definition so the two samplers cannot drift.
    */
  private lazy val aesWeightCtes: String = s"""
      t AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
      m AS (SELECT doc_id, source,
              0.5 * (1.0 - CAST(len(list_filter(toks, x -> x IN ($stopSqlList))) AS DOUBLE) / len(toks))
              + 0.3 * (1.0 - CAST(len(list_filter(toks, x -> length(x) <= 2)) AS DOUBLE) / len(toks))
              + 0.2 * least(CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS DOUBLE) / len(toks) / 10.0, 1.0)
                AS q
            FROM t),
      w AS (SELECT doc_id, source, q + 0.05 AS wt,
              (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               % 1000003 + 1) / 1000004.0 AS u
            FROM m)"""

  val defs: Seq[QueryDef] = Seq(

    // Context-window chunking: split each document into fixed-size token
    // windows (the "concat-free" packing used when documents may not
    // cross sequence boundaries). Pure explode over a computed range —
    // zero shuffle; output rows carry only their own window's text.
    // string_split never yields an empty array (even "" splits to [""]),
    // so the chunk range is always non-empty and ascending.
    QueryDef("q103_doc_chunks", Some(s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      c AS (SELECT doc_id, toks,
              unnest(generate_series(0, CAST(ceil(len(toks) / ${ChunkCap}.0) AS BIGINT) - 1)) AS chunk_id
            FROM t)
      SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
             array_to_string(toks[chunk_id*$ChunkCap+1 : chunk_id*$ChunkCap+$ChunkCap], ' ') AS chunk_text,
             CAST(least($ChunkCap, len(toks) - chunk_id*$ChunkCap) AS INTEGER) AS n_chunk_tokens
      FROM c"""),
      (spark, dir) => {
        val cap = ChunkCap
        T(spark, dir, "documents")
          .select(col("doc_id"), TextOps.tokenize(col("text")).as("toks"))
          .select(col("doc_id"), col("toks"),
            explode(sequence(lit(0L),
              ceil(size(col("toks")) / lit(cap.toDouble)).cast("long") - 1))
              .as("chunk_id"))
          .select(col("doc_id"),
            col("chunk_id").cast("int").as("chunk_id"),
            concat_ws(" ", slice(col("toks"),
              (col("chunk_id") * cap + 1).cast("int"), lit(cap))).as("chunk_text"),
            least(lit(cap), size(col("toks")) - col("chunk_id").cast("int") * cap)
              .cast("int").as("n_chunk_tokens"))
      }),

    // Benchmark decontamination: flag training documents sharing any
    // trigram with the held-out eval slice (doc_id % 97 == 0 stands in
    // for a benchmark set). Grams are xxhash64'd before the join so the
    // shuffle moves 8-byte keys, never text; a 64-bit collision would
    // undercount n_shared_grams by 1 with probability ~n²/2⁶⁵ (~1e-8 at
    // sf0.1) — far below any curation decision threshold. The eval side
    // is benchmark-sized (≈1%): AQE broadcasts it while small and falls
    // back to a wide hash join on the high-cardinality gram key, never a
    // funnel.
    QueryDef("q104_decontaminate", Some("""
      WITH sh AS (
        SELECT doc_id, list_distinct(list_transform(generate_series(1, greatest(len(t)-2, 0)),
                                       i -> array_to_string(t[i:i+2], ' '))) AS grams
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
      tr AS (SELECT doc_id, unnest(grams) AS g FROM sh WHERE doc_id % 97 <> 0),
      ev AS (SELECT doc_id AS eval_id, unnest(grams) AS g FROM sh WHERE doc_id % 97 = 0)
      SELECT tr.doc_id, CAST(count(DISTINCT tr.g) AS INTEGER) AS n_shared_grams,
             CAST(count(DISTINCT ev.eval_id) AS INTEGER) AS n_eval_docs
      FROM tr JOIN ev USING (g) GROUP BY tr.doc_id"""),
      (spark, dir) => {
        val grams = T(spark, dir, "documents")
          .select(col("doc_id"),
            explode(TextOps.shingles(TextOps.tokenize(col("text")), 3)).as("gram"))
          .select(col("doc_id"), xxhash64(col("gram")).as("g"))
        val train = grams.filter(col("doc_id") % 97 =!= 0)
        val evalSet = grams.filter(col("doc_id") % 97 === 0)
          .select(col("g"), col("doc_id").as("eval_id"))
        train.join(evalSet, "g")
          .groupBy("doc_id")
          .agg(countDistinct("g").cast("int").as("n_shared_grams"),
            countDistinct("eval_id").cast("int").as("n_eval_docs"))
      }),

    // Text normalization: drop stopwords and sub-3-char tokens, emit the
    // cleaned text plus a retention ratio (single int/int division —
    // IEEE-identical on both engines, per the q28 rounding note).
    QueryDef("q105_text_normalize", Some(s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      c AS (SELECT doc_id, toks,
              list_filter(toks, x -> length(x) >= 3 AND x NOT IN ($stopSqlList)) AS kept
            FROM t)
      SELECT doc_id, array_to_string(kept, ' ') AS clean_text,
             CAST(len(kept) AS INTEGER) AS n_kept,
             CAST(len(toks) AS INTEGER) AS n_orig,
             CAST(len(kept) AS DOUBLE) / len(toks) AS retention
      FROM c"""),
      (spark, dir) =>
        T(spark, dir, "documents")
          .select(col("doc_id"), TextOps.tokenize(col("text")).as("toks"))
          .select(col("doc_id"), col("toks"),
            TextOps.normalizeTokens(col("toks"), Text.Stop, minLen = 3).as("kept"))
          .select(col("doc_id"),
            concat_ws(" ", col("kept")).as("clean_text"),
            size(col("kept")).as("n_kept"),
            size(col("toks")).as("n_orig"),
            (size(col("kept")).cast("double") / size(col("toks"))).as("retention"))),

    // Repetition quality filter: max single-token share + duplicate-
    // bigram ratio, with the decision thresholds applied to the same
    // doubles on both engines (single divisions of integer counts — no
    // rounding needed or wanted, per the q28 note).
    QueryDef("q106_repetition", Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      m AS (SELECT doc_id, len(toks) AS n,
              list_max(list_transform(list_distinct(toks),
                x -> len(list_filter(toks, y -> y = x)))) AS max_tf,
              list_transform(generate_series(1, greatest(len(toks)-1, 0)),
                i -> toks[i] || ' ' || toks[i+1]) AS bi
            FROM t)
      SELECT doc_id, CAST(max_tf AS INTEGER) AS max_tf,
             CAST(max_tf AS DOUBLE) / n AS max_token_share,
             1.0 - CAST(len(list_distinct(bi)) AS DOUBLE) / greatest(len(bi), 1) AS dup_bigram_ratio,
             (CAST(max_tf AS DOUBLE) / n > 0.2
              OR 1.0 - CAST(len(list_distinct(bi)) AS DOUBLE) / greatest(len(bi), 1) > 0.1) AS repetitive
      FROM m"""),
      (spark, dir) =>
        T(spark, dir, "documents")
          .select(col("doc_id"), TextOps.tokenize(col("text")).as("toks"))
          .select(col("doc_id"),
            size(col("toks")).as("n"),
            TextOps.maxTokenFreq(col("toks")).as("max_tf"),
            TextOps.ngramsAll(col("toks"), 2).as("bi"))
          .select(col("doc_id"),
            col("max_tf").cast("int").as("max_tf"),
            (col("max_tf").cast("double") / col("n")).as("max_token_share"),
            (lit(1.0) - size(array_distinct(col("bi"))).cast("double")
              / greatest(size(col("bi")), lit(1))).as("dup_bigram_ratio"))
          .withColumn("repetitive",
            col("max_token_share") > 0.2 || col("dup_bigram_ratio") > 0.1)),

    // Domain mixing: per-source sampling rates from a broadcast literal
    // recipe table, selection a pure hash of doc_id (Sampling.hashUniform
    // — same first-60-bits-of-md5 construction as the q73 oracle, IEEE
    // double division on both sides).
    QueryDef("q107_domain_mix", Some("""
      WITH rates(source, rate) AS (VALUES ('src0', 1.0), ('src1', 0.75), ('src2', 0.5), ('src3', 0.25)),
      d AS (SELECT doc_id, source,
              CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000003 + 1 AS DOUBLE)
                / 1000004.0 AS u
            FROM documents)
      SELECT d.doc_id, d.source
      FROM d LEFT JOIN rates USING (source)
      WHERE d.u < coalesce(rates.rate, 0.1)"""),
      (spark, dir) =>
        Sampling.stratifiedSample(
          T(spark, dir, "documents").select(col("doc_id"), col("source")),
          "doc_id", "source",
          Map("src0" -> 1.0, "src1" -> 0.75, "src2" -> 0.5, "src3" -> 0.25),
          defaultRate = 0.1)
          .select(col("doc_id"), col("source"))),

    // Concat-and-chunk sequence packing: documents concatenated in
    // doc_id order, the token stream cut into fixed 64-token packs, each
    // output row one (doc, pack) slice. The global running token count
    // comes from ops.PrefixSum — a two-phase distributed scan — not an
    // unpartitioned window, so the packing layout is computed at cluster
    // width; the oracle's `sum(n) OVER (ORDER BY doc_id)` is the
    // semantics, not the plan.
    QueryDef("q108_pack_concat", Some(s"""
      WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents),
      c AS (SELECT doc_id, n,
              CAST(coalesce(sum(n) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
            FROM t),
      e AS (SELECT doc_id, n, cb, cb + n AS ca,
              unnest(generate_series(cb // $PackCap, (cb + n - 1) // $PackCap)) AS pack_id
            FROM c)
      SELECT doc_id, CAST(pack_id AS INTEGER) AS pack_id,
             CAST(least(ca, (pack_id+1)*$PackCap) - greatest(cb, pack_id*$PackCap) AS INTEGER) AS n_pack_tokens,
             CAST(greatest(cb, pack_id*$PackCap) - pack_id*$PackCap AS INTEGER) AS offset_in_pack
      FROM e"""),
      (spark, dir) => {
        val cap = PackCap
        val t = T(spark, dir, "documents")
          .select(col("doc_id"),
            size(TextOps.tokenize(col("text"))).cast("long").as("n"))
        graft.ops.PrefixSum.withRunningSum(t, "n", "cb", Seq(col("doc_id")))
          .withColumn("ca", col("cb") + col("n"))
          .select(col("doc_id"), col("cb"), col("ca"),
            explode(sequence(expr(s"cb div $cap"), expr(s"(ca - 1) div $cap")))
              .as("pack_id"))
          .select(col("doc_id"),
            col("pack_id").cast("int").as("pack_id"),
            (least(col("ca"), (col("pack_id") + 1) * cap)
              - greatest(col("cb"), col("pack_id") * cap)).cast("int").as("n_pack_tokens"),
            (greatest(col("cb"), col("pack_id") * cap) - col("pack_id") * cap)
              .cast("int").as("offset_in_pack"))
      }),

    // End-to-end sequence-level prep (flows.TrainingPrep): exact dedup →
    // eval holdout → repetition gates → decontamination → domain mix →
    // normalization → packing. Stages 1–5 are each a pure function of
    // the full input table, so the oracle expresses them as independent
    // CTE predicates over `documents` ANDed together — exactly the
    // commuting-filters contract the flow documents.
    QueryDef("q109_training_prep", Some(s"""
      WITH tok AS (SELECT doc_id, source, text, string_split(text, ' ') AS toks FROM documents),
      dedup AS (SELECT doc_id FROM (
                  SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
                  FROM documents) WHERE rn = 1),
      sig AS (SELECT doc_id, len(toks) AS n,
                list_max(list_transform(list_distinct(toks), x -> len(list_filter(toks, y -> y = x)))) AS max_tf,
                list_transform(generate_series(1, greatest(len(toks)-1, 0)), i -> toks[i] || ' ' || toks[i+1]) AS bi
              FROM tok),
      okrep AS (SELECT doc_id FROM sig
                WHERE NOT (CAST(max_tf AS DOUBLE)/n > 0.2
                           OR 1.0 - CAST(len(list_distinct(bi)) AS DOUBLE)/greatest(len(bi),1) > 0.1)),
      sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, greatest(len(toks)-2, 0)),
                             i -> array_to_string(toks[i:i+2], ' '))) AS grams FROM tok),
      contam AS (SELECT DISTINCT tr.doc_id
                 FROM (SELECT doc_id, unnest(grams) AS g FROM sh WHERE doc_id % 97 <> 0) tr
                 JOIN (SELECT doc_id AS eid, unnest(grams) AS g FROM sh WHERE doc_id % 97 = 0) ev USING (g)),
      rates(source, rate) AS (VALUES ('src0', 1.0), ('src1', 0.75), ('src2', 0.5), ('src3', 0.25)),
      mix AS (SELECT d.doc_id FROM
                (SELECT doc_id, source,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000003 + 1 AS DOUBLE)
                     / 1000004.0 AS u
                 FROM documents) d
              LEFT JOIN rates USING (source)
              WHERE d.u < coalesce(rates.rate, 0.5)),
      kept AS (SELECT doc_id,
                 len(list_filter(toks, x -> length(x) >= 3 AND x NOT IN ($stopSqlList))) AS n
               FROM tok
               WHERE doc_id IN (SELECT doc_id FROM dedup)
                 AND doc_id % 97 <> 0
                 AND doc_id IN (SELECT doc_id FROM okrep)
                 AND doc_id NOT IN (SELECT doc_id FROM contam)
                 AND doc_id IN (SELECT doc_id FROM mix)),
      surv AS (SELECT doc_id, CAST(n AS BIGINT) AS n FROM kept WHERE n > 0),
      c AS (SELECT doc_id, n,
              CAST(coalesce(sum(n) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
            FROM surv),
      e AS (SELECT doc_id, n, cb, cb + n AS ca,
              unnest(generate_series(cb // 64, (cb + n - 1) // 64)) AS pack_id FROM c)
      SELECT doc_id, CAST(pack_id AS INTEGER) AS pack_id,
             CAST(least(ca, (pack_id+1)*64) - greatest(cb, pack_id*64) AS INTEGER) AS n_pack_tokens,
             CAST(greatest(cb, pack_id*64) - pack_id*64 AS INTEGER) AS offset_in_pack
      FROM e"""),
      (spark, dir) =>
        graft.flows.TrainingPrep.run(
          T(spark, dir, "documents").select(col("doc_id"), col("source"), col("text")),
          graft.flows.TrainingPrep.Config(
            stop = Text.Stop,
            rates = Map("src0" -> 1.0, "src1" -> 0.75, "src2" -> 0.5, "src3" -> 0.25),
            defaultRate = 0.5))),

    // Packed-sequence MATERIALIZATION: the q108 layout turned into the
    // actual training text — per-(doc, pack) token slices reassembled
    // per pack in offset order. The tokens ride the prefix scan's
    // range sort (one corpus shuffle — packing fundamentally reorders
    // the corpus into a global stream) and the final groupBy moves each
    // token exactly once more; nothing is ever quadratic.
    QueryDef("q113_pack_text", Some(s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      c AS (SELECT doc_id, toks, len(toks) AS n,
              CAST(coalesce(sum(len(toks)) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
            FROM t),
      e AS (SELECT doc_id, toks, n, cb, cb + n AS ca,
              unnest(generate_series(cb // $PackCap, (cb + n - 1) // $PackCap)) AS pack_id FROM c),
      s AS (SELECT pack_id,
              greatest(cb, pack_id*$PackCap) - pack_id*$PackCap AS off,
              array_to_string(toks[greatest(cb, pack_id*$PackCap) - cb + 1 :
                                    least(ca, (pack_id+1)*$PackCap) - cb], ' ') AS piece,
              least(ca, (pack_id+1)*$PackCap) - greatest(cb, pack_id*$PackCap) AS k
            FROM e)
      SELECT CAST(pack_id AS INTEGER) AS pack_id,
             string_agg(piece, ' ' ORDER BY off) AS pack_text,
             CAST(sum(k) AS INTEGER) AS n_pack_tokens
      FROM s GROUP BY pack_id"""),
      (spark, dir) => {
        val cap = PackCap
        val withN = T(spark, dir, "documents")
          .select(col("doc_id"), TextOps.tokenize(col("text")).as("toks"))
          .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("n"))
        val sliced = graft.ops.PrefixSum.withRunningSum(withN, "n", "cb", Seq(col("doc_id")))
          .withColumn("ca", col("cb") + col("n"))
          .select(col("toks"), col("cb"), col("ca"),
            explode(sequence(expr(s"cb div $cap"), expr(s"(ca - 1) div $cap")))
              .as("pack_id"))
          .select(col("pack_id").cast("int").as("pack_id"),
            (greatest(col("cb"), col("pack_id") * cap) - col("pack_id") * cap)
              .cast("int").as("off"),
            concat_ws(" ", slice(col("toks"),
              (greatest(col("cb"), col("pack_id") * cap) - col("cb") + 1).cast("int"),
              (least(col("ca"), (col("pack_id") + 1) * cap)
                - greatest(col("cb"), col("pack_id") * cap)).cast("int"))).as("piece"),
            (least(col("ca"), (col("pack_id") + 1) * cap)
              - greatest(col("cb"), col("pack_id") * cap)).cast("int").as("k"))
        sliced.groupBy("pack_id")
          .agg(
            concat_ws(" ", array_sort(collect_list(struct(col("off"), col("piece"))))
              .getField("piece")).as("pack_text"),
            sum("k").cast("int").as("n_pack_tokens"))
      }),

    // Token-budget mixing: per-source absolute token quotas (the
    // "2B tokens of web, 500M of code" recipe form) — keep the
    // hash-random prefix of each source whose running token total fits
    // the budget. Integer hash ranks order the rows, so there is no
    // float boundary anywhere in the selection.
    QueryDef("q114_token_budget", Some(s"""
      WITH t AS (SELECT doc_id, source, len(string_split(text, ' ')) AS n,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000003 + 1 AS h
                 FROM documents),
      c AS (SELECT doc_id, source, n,
              sum(n) OVER (PARTITION BY source ORDER BY h, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM t)
      SELECT doc_id, source, CAST(n AS INTEGER) AS n_tokens,
             CAST(cum AS BIGINT) AS cum_tokens
      FROM c WHERE cum <= $TokenBudget"""),
      (spark, dir) =>
        Sampling.budgetSample(
          T(spark, dir, "documents")
            .select(col("doc_id"), col("source"),
              size(TextOps.tokenize(col("text"))).as("n")),
          "doc_id", "source", col("n"), TokenBudget, cumCol = "cum_tokens")
          .select(col("doc_id"), col("source"), col("n").cast("int").as("n_tokens"),
            col("cum_tokens").cast("long").as("cum_tokens"))),

    // Sliding-window chunking (the retrieval-context variant of q103's
    // disjoint chunks): window W starting every S tokens, so adjacent
    // chunks share W−S tokens of context. Chunk count is
    // 1 + ceil((n−W)/S) (one window, then one per stride that still
    // exposes new tokens) — same narrow per-row explode shape as q103.
    QueryDef("q117_overlap_chunks", Some(s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      c AS (SELECT doc_id, toks,
              unnest(generate_series(0,
                CASE WHEN len(toks) <= $OverlapWindow THEN 0
                     ELSE (len(toks) - $OverlapWindow + $OverlapStride - 1) // $OverlapStride END)) AS chunk_id
            FROM t)
      SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
             array_to_string(toks[chunk_id*$OverlapStride+1 : chunk_id*$OverlapStride+$OverlapWindow], ' ') AS chunk_text,
             CAST(least($OverlapWindow, len(toks) - chunk_id*$OverlapStride) AS INTEGER) AS n_chunk_tokens
      FROM c"""),
      (spark, dir) => {
        val (win, stride) = (OverlapWindow, OverlapStride)
        T(spark, dir, "documents")
          .select(col("doc_id"), TextOps.tokenize(col("text")).as("toks"))
          .select(col("doc_id"), col("toks"),
            explode(sequence(lit(0),
              when(size(col("toks")) <= win, lit(0))
                .otherwise(expr(s"(size(toks) - $win + $stride - 1) div $stride")
                  .cast("int")))).as("chunk_id"))
          .select(col("doc_id"),
            col("chunk_id").cast("int").as("chunk_id"),
            concat_ws(" ", slice(col("toks"),
              (col("chunk_id") * stride + 1).cast("int"), lit(win))).as("chunk_text"),
            least(lit(win), size(col("toks")) - col("chunk_id") * stride)
              .cast("int").as("n_chunk_tokens"))
      }),

    // Contamination EVIDENCE: q104 says which train docs are
    // contaminated; this names the (train, eval) pairs with the shared
    // distinct-trigram count and Jaccard overlap — what a release
    // audit actually publishes. Pairs form only through shared grams
    // (inverted-posting join on 8-byte xxhash64 keys, document text
    // never shuffles), and a document-frequency cap drops boilerplate
    // grams before the join — the q120 pair-space bound: Σ_g df(g)²
    // with df ≤ $EvidenceMaxDf$, never |train|·|eval|. Jaccard is one
    // integer division — IEEE-identical both engines, unrounded (q28
    // rationale). Same eval split as q104 (doc_id % 97).
    QueryDef("q126_contamination_evidence", Some(s"""
      WITH sh AS (
        SELECT doc_id, list_distinct(list_transform(generate_series(1, greatest(len(t)-2, 0)),
                                       i -> array_to_string(t[i:i+2], ' '))) AS grams
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
      ex AS (SELECT doc_id, unnest(grams) AS g FROM sh),
      dfq AS (SELECT g, count(*) AS df FROM ex GROUP BY g),
      fx AS (SELECT doc_id, g FROM ex JOIN dfq USING (g) WHERE df <= $EvidenceMaxDf),
      sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM fx GROUP BY doc_id),
      tr AS (SELECT doc_id AS train_id, g FROM fx WHERE doc_id % 97 <> 0),
      ev AS (SELECT doc_id AS eval_id, g FROM fx WHERE doc_id % 97 = 0),
      pairs AS (SELECT train_id, eval_id, CAST(count(*) AS BIGINT) AS shared
                FROM tr JOIN ev USING (g) GROUP BY train_id, eval_id)
      SELECT train_id, eval_id, shared,
             CAST(shared AS DOUBLE) / (st.n + se.n - shared) AS jaccard
      FROM pairs JOIN sz st ON train_id = st.doc_id
                 JOIN sz se ON eval_id = se.doc_id
      WHERE shared >= 2"""),
      (spark, dir) => {
        val ex = T(spark, dir, "documents")
          .select(col("doc_id"),
            explode(TextOps.shingles(TextOps.tokenize(col("text")), 3)).as("gram"))
          .select(col("doc_id"), xxhash64(col("gram")).as("g"))
        val dfq = ex.groupBy("g").agg(count(lit(1)).as("df"))
          .filter(col("df") <= EvidenceMaxDf)
        val fx = ex.join(dfq.select("g"), "g")
        val sz = fx.groupBy("doc_id").agg(count(lit(1)).as("n"))
        val tr = fx.filter(col("doc_id") % 97 =!= 0).select(col("doc_id").as("train_id"), col("g"))
        val ev = fx.filter(col("doc_id") % 97 === 0).select(col("doc_id").as("eval_id"), col("g"))
        tr.join(ev, "g")
          .groupBy("train_id", "eval_id").agg(count(lit(1)).as("shared"))
          .filter(col("shared") >= 2)
          .join(sz.select(col("doc_id").as("train_id"), col("n").as("__nt")), "train_id")
          .join(sz.select(col("doc_id").as("eval_id"), col("n").as("__ne")), "eval_id")
          .select(col("train_id"), col("eval_id"), col("shared"),
            (col("shared").cast("double") / (col("__nt") + col("__ne") - col("shared")))
              .as("jaccard"))
      }),

    // Greedy quality-first selection under a global token budget: rank
    // the corpus by the q28 quality score (doc_id tiebreak) and keep
    // every document whose slice STARTS inside the budget — the "best
    // N tokens" data-selection step that follows scoring in a curation
    // pipeline. The running sum is the q108 distributed prefix scan
    // (per-partition sums, ONE driver row per partition, no global
    // single-partition window); quality is used only for ORDERING, so
    // both engines compute identical doubles and identical order, and
    // every output column is integer-exact.
    QueryDef("q127_budget_selection", Some(s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      m AS (SELECT doc_id, len(toks) AS n_tokens,
                   CAST(len(list_filter(toks, x -> x IN ($stopSqlList))) AS DOUBLE) / len(toks) AS stop_ratio,
                   CAST(len(list_filter(toks, x -> length(x) <= 2)) AS DOUBLE) / len(toks) AS short_ratio,
                   CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS DOUBLE) / len(toks) AS mean_len
            FROM t),
      q AS (SELECT doc_id, n_tokens,
                   0.5 * (1.0 - stop_ratio) + 0.3 * (1.0 - short_ratio)
                     + 0.2 * least(mean_len / 10.0, 1.0) AS quality
            FROM m),
      w AS (SELECT *, coalesce(sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
            FROM q)
      SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens, quality,
             CAST(cum_before AS BIGINT) AS cum_before
      FROM w WHERE cum_before < $SelectBudget"""),
      (spark, dir) => {
        val toks = TextOps.tokenize(col("text"))
        val scored = T(spark, dir, "documents")
          .select(col("doc_id"), size(toks).as("n_tokens"),
            TextOps.qualityScore(toks, Text.Stop).as("quality"))
        graft.ops.PrefixSum.withRunningSum(scored, "n_tokens", "cum_before",
            Seq(col("quality").desc, col("doc_id")))
          .filter(col("cum_before") < SelectBudget)
          .select(col("doc_id"), col("n_tokens").cast("int").as("n_tokens"),
            col("quality"), col("cum_before"))
      }),

    // PII redaction — the scrub pass every training pipeline runs
    // before text leaves curation: emails, URLs, IPv4s and phone-shaped
    // numbers are counted and replaced with typed sentinels. A narrow
    // per-row projection (codegen'd regexp built-ins, no UDF, zero
    // shuffle): at 100 TB it rides the corpus scan for free. The
    // synthetic corpus contains no PII, so the query plants a
    // deterministic specimen of each class (doc_id-derived, identical
    // SQL on both engines) before scanning — the oracle therefore
    // genuinely pins the cross-engine regex semantics (all four
    // patterns use only portable syntax: character classes, bounded
    // repetition, \b anchors — identical under Java regex and RE2) and
    // the sentinel substitution, via md5 of the redacted text.
    // Redaction order is fixed (email, url, ip, phone) on both sides.
    QueryDef("q145_pii_redact", Some("""
      WITH aug AS (SELECT doc_id,
                          text || ' contact user' || CAST(doc_id AS VARCHAR)
                               || '@mail.example.com or http://ex.org/d' || CAST(doc_id AS VARCHAR)
                               || ' ip 10.0.0.' || CAST(doc_id % 256 AS VARCHAR)
                               || ' tel 555-123-4567.' AS t
                   FROM documents),
      c AS (SELECT doc_id, t,
                   len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
                   len(regexp_extract_all(t, 'https?://[^\s]+')) AS n_urls,
                   len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
                   len(regexp_extract_all(t, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS n_phones
            FROM aug),
      r AS (SELECT doc_id, n_emails, n_urls, n_ips, n_phones,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                         'https?://[^\s]+', '<URL>', 'g'),
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                     '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS red
            FROM c)
      SELECT doc_id, CAST(n_emails AS INTEGER) AS n_emails,
             CAST(n_urls AS INTEGER) AS n_urls, CAST(n_ips AS INTEGER) AS n_ips,
             CAST(n_phones AS INTEGER) AS n_phones, md5(red) AS redacted_md5
      FROM r"""),
      (spark, dir) => {
        val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val urlPat = "https?://[^\\s]+"
        val ipPat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
        val phonePat = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
        val t = concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com or http://ex.org/d"), col("doc_id").cast("string"),
          lit(" ip 10.0.0."), (col("doc_id") % 256).cast("string"),
          lit(" tel 555-123-4567."))
        T(spark, dir, "documents")
          .select(col("doc_id"), t.as("t"))
          .select(col("doc_id"),
            regexp_count(col("t"), lit(emailPat)).cast("int").as("n_emails"),
            regexp_count(col("t"), lit(urlPat)).cast("int").as("n_urls"),
            regexp_count(col("t"), lit(ipPat)).cast("int").as("n_ips"),
            regexp_count(col("t"), lit(phonePat)).cast("int").as("n_phones"),
            md5(
              regexp_replace(
                regexp_replace(
                  regexp_replace(
                    regexp_replace(col("t"), emailPat, "<EMAIL>"),
                    urlPat, "<URL>"),
                  ipPat, "<IP>"),
                phonePat, "<PHONE>")).as("redacted_md5"))
      }),

    // Incoming-batch novelty scoring: for each document of the arriving
    // slice (doc_id % 10 == 0 stands in for the new crawl), the fraction
    // of its distinct trigrams never seen in the existing corpus — the
    // intake signal that separates genuinely new content from re-crawls
    // before any expensive dedup runs. Same scale shape as q104: grams
    // are xxhash64'd so the anti-join shuffles 8-byte keys against the
    // reference gram set (which at 100 TB is the persisted gram index,
    // not a rescan), and the novelty ratio is one int/int division.
    QueryDef("q147_novelty", Some("""
      WITH sh AS (
        SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, greatest(len(t)-2, 0)),
                                              i -> array_to_string(t[i:i+2], ' ')))) AS g
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
      ref AS (SELECT DISTINCT g FROM sh WHERE doc_id % 10 <> 0),
      nw AS (SELECT doc_id, g FROM sh WHERE doc_id % 10 = 0)
      SELECT doc_id, CAST(count(*) AS INTEGER) AS n_grams,
             CAST(sum(CASE WHEN ref.g IS NULL THEN 1 ELSE 0 END) AS INTEGER) AS n_novel,
             CAST(sum(CASE WHEN ref.g IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS novelty
      FROM nw LEFT JOIN ref ON nw.g = ref.g
      GROUP BY doc_id"""),
      (spark, dir) => {
        val grams = T(spark, dir, "documents")
          .select(col("doc_id"),
            explode(TextOps.shingles(TextOps.tokenize(col("text")), 3)).as("gram"))
          .select(col("doc_id"), xxhash64(col("gram")).as("g"))
        val ref = grams.filter(col("doc_id") % 10 =!= 0).select("g").distinct()
        val nw = grams.filter(col("doc_id") % 10 === 0)
        nw.join(ref.withColumn("__hit", lit(1)), Seq("g"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("int").as("n_grams"),
            sum(when(col("__hit").isNull, 1L).otherwise(0L)).cast("int").as("n_novel"))
          .select(col("doc_id"), col("n_grams"), col("n_novel"),
            (col("n_novel").cast("double") / col("n_grams")).as("novelty"))
      }),

    // Epoch upsampling + global training order: each document is
    // repeated by its source's epoch factor (high-value domains see more
    // epochs — the multi-epoch mixing recipe), and every copy gets its
    // global position in a deterministic hash-shuffled training order —
    // the "final shuffle" a training run consumes. The position is the
    // md5-ordered global row number via [[graft.ops.GlobalRank]]'s
    // distributed zipWithIndex (fully range-sorted, never the
    // single-task unpartitioned window the SQL twin uses), so the order
    // is reproducible run-to-run and engine-to-engine.
    QueryDef("q148_epoch_order", Some("""
      WITH f AS (SELECT doc_id,
                        CASE WHEN source = 'web' THEN 1
                             WHEN source = 'wiki' THEN 3 ELSE 2 END AS nf
                 FROM documents),
      c AS (SELECT doc_id, unnest(generate_series(1, nf)) AS copy FROM f),
      k AS (SELECT doc_id, copy,
                   md5(CAST(doc_id AS VARCHAR) || ':' || CAST(copy AS VARCHAR)) AS key
            FROM c)
      SELECT doc_id, CAST(copy AS INTEGER) AS copy,
             CAST(row_number() OVER (ORDER BY key, doc_id, copy) AS BIGINT) AS pos
      FROM k"""),
      (spark, dir) => {
        val f = T(spark, dir, "documents")
          .select(col("doc_id"),
            when(col("source") === "web", 1)
              .when(col("source") === "wiki", 3).otherwise(2).as("nf"))
        val k = f
          .select(col("doc_id"), explode(sequence(lit(1), col("nf"))).as("copy"))
          .withColumn("key", md5(concat(col("doc_id").cast("string"), lit(":"),
            col("copy").cast("string"))))
        graft.ops.GlobalRank.withRowNumber(k, "pos",
            Seq(col("key"), col("doc_id"), col("copy")))
          .select(col("doc_id"), col("copy").cast("int").as("copy"), col("pos"))
      }),

    // Padding-waste report for length-sorted batching: documents sorted
    // by token length (desc) are grouped into fixed-size batches; each
    // batch pads to its own max length, and the report quantifies the
    // wasted pad tokens per batch — the measurement that justifies
    // bucketed batching over random batching for training throughput.
    // The global order comes from [[graft.ops.GlobalRank]]'s distributed
    // zipWithIndex (the SQL twin uses the window form), everything after
    // is one batch-keyed aggregation; waste_frac is a single int/int
    // division, IEEE-identical on both engines.
    QueryDef("q151_padding_waste", Some(s"""
      WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents),
      r AS (SELECT doc_id, n_tokens,
                   row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS pos
            FROM t),
      b AS (SELECT *, (pos - 1) // $PadBatch AS batch_id FROM r)
      SELECT CAST(batch_id AS BIGINT) AS batch_id,
             CAST(count(*) AS INTEGER) AS n_docs,
             CAST(max(n_tokens) AS INTEGER) AS max_len,
             CAST(sum(n_tokens) AS BIGINT) AS sum_len,
             CAST(count(*) * max(n_tokens) - sum(n_tokens) AS BIGINT) AS waste,
             CAST(count(*) * max(n_tokens) - sum(n_tokens) AS DOUBLE)
               / (count(*) * max(n_tokens)) AS waste_frac
      FROM b GROUP BY batch_id"""),
      (spark, dir) => {
        val t = T(spark, dir, "documents")
          .select(col("doc_id"), size(TextOps.tokenize(col("text"))).as("n_tokens"))
        graft.ops.GlobalRank.withRowNumber(t, "pos",
            Seq(col("n_tokens").desc, col("doc_id")))
          .withColumn("batch_id", ((col("pos") - 1) / PadBatch).cast("long"))
          .groupBy("batch_id")
          .agg(count(lit(1)).cast("int").as("n_docs"),
            max(col("n_tokens")).cast("int").as("max_len"),
            sum(col("n_tokens")).as("sum_len"))
          .select(col("batch_id"), col("n_docs"), col("max_len"), col("sum_len"),
            (col("n_docs").cast("long") * col("max_len") - col("sum_len")).as("waste"),
            ((col("n_docs").cast("long") * col("max_len") - col("sum_len")).cast("double")
              / (col("n_docs").cast("long") * col("max_len"))).as("waste_frac"))
      }),

    // Exact stratified split: per source, exactly floor(n_source ·
    // rate) documents go to eval, chosen by md5-ordered rank — the
    // deterministic "random" that reproduces across engines and runs.
    // Complements q107's hash-probabilistic mixer: that one is
    // partitioning-independent but only approximates the rate; this one
    // hits the quota byte-exactly (what an eval-set contract requires).
    // The rank window partitions by source, so it scales with per-source
    // cardinality, never the corpus.
    QueryDef("q152_exact_stratified_split", Some(s"""
      WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
      r AS (SELECT doc_id, source,
                   row_number() OVER (PARTITION BY source
                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
            FROM documents)
      SELECT doc_id, source,
             CASE WHEN rk <= CAST(floor(n * $EvalRate) AS BIGINT)
                  THEN 'eval' ELSE 'train' END AS split
      FROM r JOIN c USING (source)"""),
      (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = T(spark, dir, "documents")
        val c = docs.groupBy("source").agg(count(lit(1)).as("n"))
        val r = docs.select(col("doc_id"), col("source"),
          row_number().over(Window.partitionBy("source")
            .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))).as("rk"))
        r.join(c, "source")
          .select(col("doc_id"), col("source"),
            when(col("rk") <= floor(col("n") * lit(EvalRate)).cast("long"), "eval")
              .otherwise("train").as("split"))
      }),

    // Dataset manifest — the "dataset card" a corpus release ships with:
    // per source, document/token/char totals, the exact-duplicate rate,
    // and an ORDER-INDEPENDENT content hash (bit_xor of per-doc content
    // hashes — any engine, any partitioning, any row order produces the
    // same fingerprint, so two releases can be compared by one number).
    // One scan, one aggregation; the dup rate reuses the q30 fingerprint
    // idea (16-byte hashes, never text, through the shuffle).
    QueryDef("q158_dataset_manifest", Some("""
      WITH d AS (SELECT source, text, len(string_split(text, ' ')) AS n_tokens,
                        length(text) AS n_chars,
                        ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
                 FROM documents),
      dup AS (SELECT source, sum(c - 1) AS n_dups
              FROM (SELECT source, h, count(*) AS c FROM d GROUP BY source, h)
              GROUP BY source)
      SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             CAST(sum(n_chars) AS BIGINT) AS total_chars,
             CAST(any_value(dup.n_dups) AS BIGINT) AS n_exact_dups,
             round(CAST(any_value(dup.n_dups) AS DOUBLE) / count(*), 6) AS dup_rate,
             bit_xor(h) AS content_hash
      FROM d JOIN dup ON d.source = dup.source
      GROUP BY d.source"""),
      (spark, dir) => {
        import graft.engine.expressions.KmvDistinct.hash60
        val d = T(spark, dir, "documents")
          .select(col("source"), size(TextOps.tokenize(col("text"))).as("n_tokens"),
            length(col("text")).as("n_chars"), hash60(col("text")).as("h"))
        val dup = d.groupBy("source", "h").agg(count(lit(1)).as("c"))
          .groupBy("source").agg(sum(col("c") - 1).as("n_dups"))
        d.groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"),
            sum("n_chars").as("total_chars"),
            expr("bit_xor(h)").as("content_hash"))
          .join(dup, "source")
          .select(col("source"), col("n_docs"), col("total_tokens"), col("total_chars"),
            col("n_dups").as("n_exact_dups"),
            round(col("n_dups").cast("double") / col("n_docs"), 6).as("dup_rate"),
            col("content_hash"))
      }),

    // Temperature-based language rebalancing (the p^α mixing schedule of
    // mBERT/XLM-R/mT5): per-language rates LEARNED from the corpus —
    // dominant `en` is downsampled toward share^0.5, the rarest language
    // keeps rate 1 — then the same pure-hash Bernoulli selection as
    // q73/q107 (md5 integer rank, no float boundary on the uniform). The
    // rate itself is rounded to 9 dp on both sides, so the engines
    // filter on an identical double. Complements q107: there the mixing
    // recipe is configured, here it is derived.
    QueryDef("q169_temperature_resample", Some("""
      WITH c AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY lang),
      tot AS (SELECT sum(n) AS nn FROM c),
      w AS (SELECT lang, n, nn, pow(n / nn, 0.5) AS pa FROM c, tot),
      z AS (SELECT sum(pa) AS zpa FROM w),
      r AS (SELECT lang, n, nn, (pa / zpa) / (n / nn) AS boost FROM w, z),
      mr AS (SELECT max(boost) AS mb FROM r),
      rate AS (SELECT lang, round(boost / mb, 9) AS rate FROM r, mr)
      SELECT d.doc_id, d.lang, rate
      FROM documents d JOIN rate USING (lang)
      WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                 % 1000003 + 1 AS DOUBLE) / 1000004.0 < rate"""),
      (spark, dir) =>
        Sampling.temperatureResample(
            T(spark, dir, "documents").select(col("doc_id"), col("lang")),
            "doc_id", "lang", alpha = 0.5)
          .select(col("doc_id"), col("lang"), col("rate"))),

    // k-anonymity release gate (Sweeney 2002, suppression-only): rows
    // whose quasi-identifier combination — market segment × nation ×
    // 5000-wide balance band — is shared by fewer than k=3 customers
    // get those columns nulled before release. One shuffle on the QI
    // key (partitioned window count, no global order); at sf0.01 this
    // suppresses 129 of 1500 rows across 89 sparse groups.
    QueryDef("q170_k_anonymity", Some("""
      WITH t AS (SELECT c_custkey, c_mktsegment, c_nationkey,
                        CAST(floor(c_acctbal / 5000) AS BIGINT) AS bal_band
                 FROM customer),
      g AS (SELECT *, count(*) OVER (PARTITION BY c_mktsegment, c_nationkey, bal_band) AS n
            FROM t)
      SELECT c_custkey,
             CASE WHEN n >= 3 THEN c_mktsegment END AS c_mktsegment,
             CASE WHEN n >= 3 THEN c_nationkey END AS c_nationkey,
             CASE WHEN n >= 3 THEN bal_band END AS bal_band,
             CAST(n AS BIGINT) AS grp_n,
             n < 3 AS suppressed
      FROM g"""),
      (spark, dir) =>
        graft.ops.Quality.kAnonymize(
          T(spark, dir, "customer")
            .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"),
              floor(col("c_acctbal") / 5000).cast("long").as("bal_band")),
          Seq("c_mktsegment", "c_nationkey", "bal_band"), k = 3)),

    // ε-differentially-private composition release (Laplace mechanism,
    // Dwork et al. 2006 — q170's aggregate-statistics companion):
    // customer counts per nation × segment with seeded Laplace(1/ε)
    // noise. The noise is a pure function of (seed, group) through the
    // engine's md5-uniform fold (ops.Sampling.hashUniform — the q171/
    // q73 hashing discipline), so the oracle replays the exact doubles:
    // determinism is what makes a DP release auditable AND what makes
    // seed rotation a protocol decision rather than RNG state.
    QueryDef("q220_dp_release", Some("""
      WITH g AS (SELECT c_nationkey AS nation_key, c_mktsegment AS segment,
                        count(*) AS n
                 FROM customer GROUP BY 1, 2),
      u AS (SELECT *,
              (('0x' || substr(md5('7|' || CAST(nation_key AS VARCHAR) || '|' || segment), 1, 15))::BIGINT
                 % 1000003 + 1) / 1000004.0 AS uu
            FROM g)
      SELECT nation_key, segment,
             round(n + -(1.0 / 0.5) * sign(uu - 0.5) * ln(1 - 2 * abs(uu - 0.5)), 6)
               AS noisy_count
      FROM u"""),
      (spark, dir) =>
        graft.ops.Quality.dpGroupCounts(
          T(spark, dir, "customer")
            .select(col("c_nationkey").as("nation_key"),
              col("c_mktsegment").as("segment")),
          Seq("nation_key", "segment"), epsilon = 0.5, seed = 7L)),

    // The corpus-side canonical composition
    // (flows.CorpusPipeline.canonicalPack, q109's near-dup-cluster
    // sibling): LSH near-dup clusters → min-id canonical per cluster →
    // eval holdout (doc_id % 97) → decontaminate canonical train docs
    // against the RAW eval slice → q108 concat-and-chunk pack layout.
    // Oracle: the q195 recursive-component CTEs over Vector.lshCtes,
    // then q109's contamination CTE, then the q108 prefix-sum layout —
    // every stage integer-exact, so the flow hash-gates end to end.
    QueryDef("q200_corpus_canonical_pack", Some(s"""
      WITH RECURSIVE ${Vector.lshCtes("documents")},
      strong AS (SELECT id_a, id_b FROM verified WHERE jaccard >= 0.5),
      sym AS (SELECT id_a AS a, id_b AS b FROM strong
              UNION SELECT id_b, id_a FROM strong
              UNION SELECT id_a, id_a FROM strong
              UNION SELECT id_b, id_b FROM strong),
      reach(a, b) AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
      comp AS (SELECT a AS node, min(b) AS component FROM reach GROUP BY a),
      losers AS (SELECT node FROM comp WHERE node <> component),
      train AS (SELECT doc_id, text FROM documents
                WHERE doc_id NOT IN (SELECT node FROM losers)
                  AND doc_id % 97 <> 0),
      g3 AS (SELECT doc_id,
               unnest(list_distinct(list_transform(
                 generate_series(1, greatest(len(string_split(text, ' ')) - 2, 0)),
                 i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')))) AS g
             FROM documents),
      contam AS (SELECT DISTINCT tr.doc_id
                 FROM (SELECT * FROM g3 WHERE doc_id IN (SELECT doc_id FROM train)) tr
                 JOIN (SELECT g FROM g3 WHERE doc_id % 97 = 0) ev USING (g)),
      surv AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
               FROM train
               WHERE doc_id NOT IN (SELECT doc_id FROM contam)
                 AND len(string_split(text, ' ')) > 0),
      c AS (SELECT doc_id, n,
              CAST(coalesce(sum(n) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
            FROM surv),
      e AS (SELECT doc_id, n, cb, cb + n AS ca,
              unnest(generate_series(cb // $PackCap, (cb + n - 1) // $PackCap)) AS pack_id
            FROM c)
      SELECT doc_id, CAST(pack_id AS INTEGER) AS pack_id,
             CAST(least(ca, (pack_id+1)*$PackCap) - greatest(cb, pack_id*$PackCap) AS INTEGER) AS n_pack_tokens,
             CAST(greatest(cb, pack_id*$PackCap) - pack_id*$PackCap AS INTEGER) AS offset_in_pack
      FROM e"""),
      (spark, dir) =>
        graft.flows.CorpusPipeline.canonicalPack(
          T(spark, dir, "documents").select(col("doc_id"), col("text")),
          minJaccard = 0.5, evalMod = 97, gramN = 3, packCap = PackCap)),

    // Per-source document cap — the crawl-pipeline "domain cap" that
    // stops any single source from dominating the mix: keep at most
    // SourceCap docs per source, chosen by deterministic hash rank
    // (Sampling.hashRank — an order-free uniform draw reproducible on
    // any engine, unlike head-of-scan which depends on file order).
    // One group-limit window per source (WindowGroupLimit pushes the
    // cap below the sort at scale); the survivors' rank doubles as a
    // stable epoch-independent shuffle order within the source.
    QueryDef("q201_source_cap", Some(s"""
      SELECT doc_id, source, CAST(rnk AS INTEGER) AS rnk FROM (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source
                 ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                            % 1000003 + 1, doc_id) AS rnk
        FROM documents)
      WHERE rnk <= $SourceCap"""),
      (spark, dir) =>
        graft.ops.TopK.exactPerKey(
          T(spark, dir, "documents")
            .select(col("doc_id"), col("source"),
              Sampling.hashRank(col("doc_id")).as("__hr")),
          Seq("source"), Seq(col("__hr").asc, col("doc_id").asc),
          SourceCap, "rnk")
          .select(col("doc_id"), col("source"), col("rnk").cast("int").as("rnk"))),

    // Largest-remainder apportionment of a fixed slot budget across
    // sources by token mass (ops.Allocate — Hamilton's method): the
    // exact-integer step that turns a target mixture into whole
    // per-source counts summing to EXACTLY the budget, each within one
    // slot of its real-valued quota. Integral div/mod end to end, so
    // the oracle replays it bit-for-bit.
    QueryDef("q205_budget_allocation", Some(s"""
      WITH s AS (SELECT source,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS w
                 FROM documents GROUP BY source),
      t AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM s),
      b AS (SELECT source, w, ($AllocBudget * w) // tw AS base,
                   ($AllocBudget * w) % tw AS rem
            FROM s CROSS JOIN t),
      l AS (SELECT $AllocBudget - CAST(sum(base) AS BIGINT) AS lo FROM b),
      r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk FROM b)
      SELECT source, CAST(w AS BIGINT) AS weight,
             CAST(base + CASE WHEN rk <= l.lo THEN 1 ELSE 0 END AS BIGINT) AS alloc
      FROM r CROSS JOIN l"""),
      (spark, dir) =>
        graft.ops.Allocate.largestRemainder(
          T(spark, dir, "documents")
            .groupBy("source")
            .agg(sum(size(TextOps.tokenize(col("text")))).as("w")),
          "source", "w", AllocBudget)),

    // Length-bucketed batching (the fairseq/HF bucketing discipline —
    // the FIX for the padding waste q151 measures): docs route to
    // power-of-2 length buckets, each bucket batches floor(cap/ub) docs
    // and pads only to its own upper bound. Per-bucket ranks come from
    // the distributed global row number plus a broadcast per-bucket
    // offset — NOT a window partitioned by the ~7 bucket values, which
    // would cap the whole layout at 7 tasks (the q151 caveat applied).
    QueryDef("q209_bucketed_batching", Some(s"""
      WITH t AS (SELECT doc_id,
                   least(len(string_split(text, ' ')), $PackCap) AS len
                 FROM documents),
      b AS (SELECT doc_id, len,
              CASE WHEN len <= 1 THEN 1 WHEN len <= 2 THEN 2 WHEN len <= 4 THEN 4
                   WHEN len <= 8 THEN 8 WHEN len <= 16 THEN 16
                   WHEN len <= 32 THEN 32 ELSE 64 END AS ub
            FROM t),
      r AS (SELECT doc_id, len, ub,
              row_number() OVER (PARTITION BY ub ORDER BY doc_id) AS rk
            FROM b)
      SELECT doc_id, CAST(len AS INTEGER) AS n_tokens, CAST(ub AS INTEGER) AS padded_to,
             CAST((rk - 1) // ($PackCap // ub) AS INTEGER) AS batch_id,
             CAST((rk - 1) % ($PackCap // ub) AS INTEGER) AS slot,
             CAST(ub - len AS INTEGER) AS waste
      FROM r"""),
      (spark, dir) => {
        val cap = PackCap
        val withUb = T(spark, dir, "documents")
          .select(col("doc_id"),
            least(size(TextOps.tokenize(col("text"))), lit(cap)).as("len"))
          .withColumn("ub",
            when(col("len") <= 1, 1).when(col("len") <= 2, 2)
              .when(col("len") <= 4, 4).when(col("len") <= 8, 8)
              .when(col("len") <= 16, 16).when(col("len") <= 32, 32)
              .otherwise(64))
        // distributed per-bucket rank: global row number ordered by
        // (ub, doc_id), minus each bucket's broadcast min — full cluster
        // width regardless of how few buckets exist
        val ranked = graft.ops.GlobalRank.withRowNumber(withUb, "__gr",
          Seq(col("ub").asc, col("doc_id").asc))
        val offsets = ranked.groupBy("ub").agg(min(col("__gr")).as("__off"))
        ranked.join(broadcast(offsets), "ub")
          .select(col("doc_id"),
            col("len").cast("int").as("n_tokens"),
            col("ub").cast("int").as("padded_to"),
            // integral div/mod end to end (the Allocate discipline)
            expr(s"CAST((__gr - __off) div ($cap div ub) AS INT)").as("batch_id"),
            expr(s"CAST((__gr - __off) % ($cap div ub) AS INT)").as("slot"),
            (col("ub") - col("len")).cast("int").as("waste"))
      }),

    // Content-defined chunking (the CDC boundary idea of LBFS/rsync
    // applied to token streams): a chunk ends after any token whose
    // hash rank selects it (1-in-8), so boundaries follow CONTENT, not
    // position — insert a sentence and every chunk after it still
    // starts at the same tokens, which is what makes sub-document
    // near-dup detection robust to edits (fixed-width q103 windows all
    // shift). Pure per-row array ops — cut points from one filtered
    // index pass, chunks sliced between consecutive cuts; linear in
    // tokens, zero shuffle.
    QueryDef("q210_cdc_chunks", Some(s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      c AS (SELECT doc_id, tk,
              list_concat(list_concat([0], list_filter(range(1, len(tk)),
                i -> (('0x' || substr(md5(tk[i]), 1, 15))::BIGINT % 1000003 + 1)
                       % $CdcSelMod = 0)), [len(tk)]) AS cuts
            FROM t),
      e AS (SELECT doc_id, tk, cuts,
              unnest(generate_series(1, len(cuts) - 1)) AS k
            FROM c)
      SELECT doc_id, CAST(k - 1 AS INTEGER) AS chunk_idx,
             array_to_string(tk[cuts[k] + 1 : cuts[k + 1]], ' ') AS chunk_text,
             CAST(cuts[k + 1] - cuts[k] AS INTEGER) AS n_chunk_tokens
      FROM e"""),
      (spark, dir) =>
        T(spark, dir, "documents").select(col("doc_id"),
          posexplode(TextOps.cdcChunks(TextOps.tokenize(col("text")), CdcSelMod))
            .as(Seq("chunk_idx", "__c")))
          .select(col("doc_id"), col("chunk_idx").cast("int").as("chunk_idx"),
            col("__c.chunk_text").as("chunk_text"),
            col("__c.n_chunk_tokens").as("n_chunk_tokens"))),

    // Sub-document duplication map — q210's payoff: content-defined
    // chunks hashed (md5 — engine-replayable) and grouped across the
    // corpus; a chunk appearing in ≥2 documents is shared boilerplate
    // (headers, disclaimers, templated text) that document-level
    // near-dup never sees because the surrounding text differs. The
    // report a curation run uses to strip boilerplate BEFORE minhashing
    // — shuffle moves 16-byte hashes, never chunk text.
    QueryDef("q211_shared_chunks", Some(s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      c AS (SELECT doc_id, tk,
              list_concat(list_concat([0], list_filter(range(1, len(tk)),
                i -> (('0x' || substr(md5(tk[i]), 1, 15))::BIGINT % 1000003 + 1)
                       % $CdcSelMod = 0)), [len(tk)]) AS cuts
            FROM t),
      e AS (SELECT doc_id, tk, cuts,
              unnest(generate_series(1, len(cuts) - 1)) AS k
            FROM c),
      ch AS (SELECT doc_id,
               md5(array_to_string(tk[cuts[k] + 1 : cuts[k + 1]], ' ')) AS h,
               cuts[k + 1] - cuts[k] AS n_toks
             FROM e)
      SELECT h AS chunk_md5,
             CAST(any_value(n_toks) AS INTEGER) AS n_chunk_tokens,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_occurrences,
             CAST(min(doc_id) AS BIGINT) AS example_doc
      FROM ch GROUP BY h HAVING count(DISTINCT doc_id) >= 2"""),
      (spark, dir) => {
        val chunks = graft.SparkEntry.queries("q210_cdc_chunks")(spark, dir)
          .select(col("doc_id"), md5(col("chunk_text")).as("chunk_md5"),
            col("n_chunk_tokens"))
        chunks.groupBy("chunk_md5")
          .agg(first(col("n_chunk_tokens")).as("n_chunk_tokens"),
            countDistinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_occurrences"),
            min(col("doc_id")).as("example_doc"))
          .filter(col("n_docs") >= 2)
      }),

    // T5-style span corruption (Raffel et al. 2020): tokens partition
    // into fixed 3-token blocks; a block is masked iff the md5 hash
    // rank of (doc_id, block) selects it (~1/8 of blocks — disjoint by
    // construction, so no greedy overlap state). `input` replaces each
    // masked block with its <extra_id_k> sentinel (k = order among the
    // doc's masked blocks); `target` is the sentinel-prefixed masked
    // text. Pure per-row column ops — the example generator runs at
    // scan speed with zero shuffle — and every string is an exact
    // deterministic function of (doc_id, text), so the oracle replays
    // it verbatim.
    QueryDef("q206_span_corruption", Some(s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      blks AS (SELECT doc_id, tk,
                 range(0, CAST((len(tk) + ${SpanLen - 1}) // $SpanLen AS INT)) AS blocks
               FROM t),
      m AS (SELECT doc_id, tk, blocks,
              list_filter(blocks, b ->
                (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)), 1, 15))::BIGINT
                   % 1000003 + 1) % $SpanSelMod = 0) AS mb
            FROM blks)
      SELECT doc_id, CAST(len(mb) AS INTEGER) AS n_spans,
             coalesce(array_to_string(flatten(list_transform(blocks, b ->
               CASE WHEN list_contains(mb, b)
                    THEN ['<extra_id_' || CAST(list_position(mb, b) - 1 AS VARCHAR) || '>']
                    ELSE tk[b * $SpanLen + 1 : b * $SpanLen + $SpanLen] END)), ' '), '') AS input,
             coalesce(array_to_string(flatten(list_transform(mb, b ->
               list_concat(['<extra_id_' || CAST(list_position(mb, b) - 1 AS VARCHAR) || '>'],
                 tk[b * $SpanLen + 1 : b * $SpanLen + $SpanLen]))), ' '), '') AS target
      FROM m"""),
      (spark, dir) => {
        import graft.engine.functions.let
        val L = SpanLen
        def sentinel(k: org.apache.spark.sql.Column) =
          concat(lit("<extra_id_"), (k - 1).cast("string"), lit(">"))
        T(spark, dir, "documents").select(col("doc_id"),
          let(TextOps.tokenize(col("text"))) { tk =>
            let(when(size(tk) > 0,
                sequence(lit(0), ((size(tk) + lit(L - 1)) / lit(L)).cast("int") - 1))
              .otherwise(array().cast("array<int>"))) { blocks =>
              let(filter(blocks, b =>
                  Sampling.hashRank(concat(col("doc_id").cast("string"),
                    lit(":"), b.cast("string"))) % SpanSelMod === 0)) { mb =>
                struct(
                  size(mb).cast("int").as("n_spans"),
                  array_join(flatten(transform(blocks, b =>
                    when(array_contains(mb, b), array(sentinel(array_position(mb, b))))
                      .otherwise(slice(tk, b * L + 1, lit(L))))), " ").as("input"),
                  array_join(flatten(transform(mb, b =>
                    concat(array(sentinel(array_position(mb, b))),
                      slice(tk, b * L + 1, lit(L))))), " ").as("target"))
              }
            }
          }.as("__o"))
          .select(col("doc_id"), col("__o.n_spans").as("n_spans"),
            col("__o.input").as("input"), col("__o.target").as("target"))
      }),

    // Quality-weighted corpus subsampling (Efraimidis–Spirakis A-ES,
    // "Weighted random sampling with a reservoir", IPL 2006): the
    // standard "keep the best-ish N documents, biased by quality but
    // still random" curation step. Each doc draws key ln(u)/w — u the
    // pure md5-hash uniform of doc_id, w the q28 quality score (+0.05
    // floor so degenerate all-stopword docs keep a nonzero weight) —
    // and the SampleN largest keys win: selection probability ∝ w,
    // without replacement. Plan: one corpus scan computing w and the
    // key (codegen'd column math), then TakeOrderedAndProject —
    // per-partition top-N heaps, only N·|partitions| rows ever move;
    // no corpus shuffle, no global sort. The oracle replays the
    // identical IEEE key (q28's formula hash-matches bit-for-bit, and
    // u is the shared first-60-bits-of-md5 recipe), so the gate is a
    // full hash match, not rows-only.
    QueryDef("q262_quality_corpus_sample", Some(s"""
      WITH $aesWeightCtes
      SELECT doc_id, source, round(wt, 6) AS wt
      FROM w
      ORDER BY ln(u) / wt DESC, doc_id
      LIMIT ${QualitySampleN}"""),
      (spark, dir) => {
        val wt = TextOps.qualityScore(TextOps.tokenize(col("text")),
          Text.Stop) + lit(0.05)
        Sampling.weightedSample(
          T(spark, dir, "documents")
            .select(col("doc_id"), col("source"), wt.as("wt")),
          "doc_id", col("wt"), QualitySampleN)
          .withColumn("wt", round(col("wt"), 6))
      }),

    // Per-source quality-weighted quota (A-ES per stratum): the other
    // half of the q262 sampler — "keep the best-ish K docs from EVERY
    // source" instead of K overall, so no domain is starved by a
    // quality-rich neighbor (q152's exact-quota discipline with q262's
    // weight bias). Same ln(u)/w key; winners by per-source
    // row_number, one window shuffled on source — per-stratum cost is
    // bounded by stratum size, never corpus size. The oracle replays
    // key, partition, and tiebreak bit-for-bit.
    QueryDef("q268_stratified_quality_sample", Some(s"""
      WITH $aesWeightCtes,
      r AS (SELECT doc_id, source, wt,
              row_number() OVER (PARTITION BY source
                                 ORDER BY ln(u) / wt DESC, doc_id) AS rk
            FROM w)
      SELECT doc_id, source, round(wt, 6) AS wt
      FROM r WHERE rk <= ${StratumSampleK}"""),
      (spark, dir) => {
        val wt = TextOps.qualityScore(TextOps.tokenize(col("text")),
          Text.Stop) + lit(0.05)
        Sampling.weightedSampleByStratum(
          T(spark, dir, "documents")
            .select(col("doc_id"), col("source"), wt.as("wt")),
          "doc_id", "source", col("wt"), StratumSampleK)
          .withColumn("wt", round(col("wt"), 6))
      })
  )
}
