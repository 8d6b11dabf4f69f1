package graft

import org.apache.spark.sql.functions._
import graft.llm.{DedupOps, Multimodal, SimSearch, TextOps}

class LlmOpsSpec extends SparkSuite {
  import spark.implicits._

  test("TextOps.shingles: distinct n-grams in order") {
    val df = Seq("a b c b c").toDF("text")
    val got = df.select(TextOps.shingles(TextOps.tokenize(col("text")), 2))
      .head.getSeq[String](0)
    assert(got == Seq("a b", "b c", "c b"))
  }

  test("TextOps.tokenizeRegex splits letters/digits/symbols") {
    val got = Seq("ab12 cd-ef").toDF("t")
      .select(TextOps.tokenizeRegex(col("t"))).head.getSeq[String](0)
    assert(got == Seq("ab", "12", "cd", "-", "ef"))
  }

  test("DedupOps.winnowingOverlap: the n+w-1 span guarantee, and Jaccard-blind spans light up") {
    val n = 4; val w = 4
    // doc 1 and doc 2: completely different text EXCEPT one shared run of
    // exactly n+w-1 = 7 tokens -> the winnowing guarantee forces >= 1
    // shared fingerprint; doc 3 shares nothing
    val span = "the quick brown fox jumps over fences"            // 7 tokens
    val filler1 = (1 to 60).map(i => s"alpha$i").mkString(" ")
    val filler2 = (1 to 60).map(i => s"beta$i").mkString(" ")
    val filler3 = (1 to 60).map(i => s"gamma$i").mkString(" ")
    val docs = Seq(
      (1L, s"$filler1 $span ${(1 to 40).map(i => s"delta$i").mkString(" ")}"),
      (2L, s"$filler2 $span ${(1 to 40).map(i => s"epsilon$i").mkString(" ")}"),
      (3L, filler3)).toDF("doc_id", "text")
    val pairs = DedupOps.winnowingOverlap(docs, "doc_id", "text",
      n = n, w = w, maxDf = 10, minShared = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)),
      s"expected exactly the planted span pair, got $pairs")
    // the planted pair is Jaccard-invisible at whole-doc level: 7 shared
    // tokens out of ~107 -> far below any dedup threshold
    val j = docs.filter(col("doc_id") <= 2)
      .select(collect_list(array_distinct(split(col("text"), " "))).as("ts"))
      .select(DedupOps.jaccard(element_at(col("ts"), 1), element_at(col("ts"), 2)))
      .head.getDouble(0)
    assert(j < 0.1, s"fixture broken: whole-doc jaccard $j not small")
    // short docs (< n tokens) contribute nothing and do not crash
    val tiny = Seq((9L, "just three tokens")).toDF("doc_id", "text")
    assert(DedupOps.winnowingFingerprints(tiny, "doc_id", "text", n, w).count() == 0)
  }

  test("DedupOps.jaccard exact on known sets") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    assert(df.select(DedupOps.jaccard(col("x"), col("y"))).head.getDouble(0) == 0.5)
  }

  test("DedupOps.minhash is deterministic and order-insensitive") {
    val df = Seq(Seq("a", "b", "c"), Seq("c", "b", "a")).toDF("sh")
    val sigs = df.select(DedupOps.minhash(col("sh"), 0)).as[String].collect()
    assert(sigs(0) == sigs(1))
  }

  test("DedupOps.lshCandidates finds a planted near-duplicate") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val nearDup = base.replace("tok30", "tokX") // 29/31 shingles shared
    val noise = (1 to 30).map(i => s"other$i").mkString(" ")
    val df = Seq((1L, base), (2L, nearDup), (3L, noise)).toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.shingles(TextOps.tokenize(col("text")), 2).as("sh"))
    val pairs = DedupOps.lshCandidates(df, "doc_id", "sh")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
  }

  test("DedupOps.lshCandidates: no shuffle ever carries shingle arrays") {
    val df = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.shingles(TextOps.tokenize(col("text")), 2).as("sh"))
    val out = DedupOps.lshCandidates(df, "doc_id", "sh")
    out.count() // materialize so AQE's final plan (with real exchanges) exists
    val formatted = out.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // every "(n) Exchange" block's Input list must be shingle-free — the
    // collision shuffle stays (id, band, sig)-narrow (the 100 TB property
    // the round-4 reshape bought)
    val exchangeBlocks = formatted.split("\\(\\d+\\) ").toSeq
      .filter(b => b.startsWith("Exchange") || b.startsWith("ShuffleExchange"))
    assert(exchangeBlocks.nonEmpty, s"no exchange found in:\n$formatted")
    assert(exchangeBlocks.forall(b => !b.contains("sh#")),
      s"shingles leaked into a shuffle:\n${exchangeBlocks.mkString("\n---\n")}")
  }

  test("CorpusPipeline.runTyped: typed rows, valid splits, quality floor") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = graft.flows.CorpusPipeline.runTyped(docs,
      graft.flows.CorpusPipeline.Config(stop = graft.queries.Text.Stop)).collect()
    assert(out.nonEmpty)
    assert(out.forall(d => d.split == "train" || d.split == "val"))
    assert(out.forall(_.quality >= 0.8))
    assert(out.map(_.doc_id).distinct.length == out.length)
  }

  test("MinHashBands: deterministic, order-insensitive, null sig on empty set") {
    graft.engine.expressions.MinHashBands.register(spark)
    val sig = (sh: Seq[String]) => Seq(sh).toDF("sh")
      .select(graft.engine.expressions.MinHashBands.bandSignatures(col("sh"), 4, 2))
      .head.getSeq[String](0)
    val a = sig(Seq("x y", "y z", "z w"))
    val b = sig(Seq("z w", "x y", "y z")) // same set, different order
    assert(a == b && a.length == 4 && a.forall(_.contains("_")))
    assert(sig(Seq.empty).forall(_ == null)) // empty shingle set -> null sigs
    // distinct-set sensitivity: different sets produce different sigs
    assert(sig(Seq("completely", "different")) != a)
  }

  test("DedupOps.simhash32: identical docs same hash; near dups close in hamming") {
    val df = Seq(
      (1L, "spark scala data engine fast"),
      (2L, "spark scala data engine fast"),
      (3L, "spark scala data engine slow"),
      (4L, "completely different words entirely here")).toDF("id", "text")
      .select(col("id"), DedupOps.simhash32(TextOps.tokenize(col("text"))).as("h"))
    val m = df.as[(Long, Long)].collect().toMap
    assert(m(1L) == m(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m(1L), m(3L)) < ham(m(1L), m(4L)))
  }

  test("SimSearch.bruteForceTopK returns the true nearest neighbor") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = SimSearch.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 1),
      "vec_id", "embedding", 1)
    val top = got.head
    assert(top.getAs[Long]("vec_id") == 2L)
  }

  test("SimSearch.thresholdPairsBlocked == thresholdPairs (exact distributed matmul)") {
    // The BlockMatrix exact mode must find the identical pair set; scores
    // may differ only by BLAS accumulation order (≤1e-9, see Scaladoc).
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val loop = SimSearch.thresholdPairs(emb, "vec_id", "embedding", 0.35)
      .withColumnRenamed("cos_sim", "cs_a")
    val block = SimSearch.thresholdPairsBlocked(emb, "vec_id", "embedding", 0.35,
      blockSize = 64)
      .withColumnRenamed("cos_sim", "cs_b")
    val joined = loop.join(block, Seq("id_a", "id_b"), "full_outer").cache()
    assert(joined.count() > 0, "no pairs found — threshold too high for fixture")
    assert(joined.filter(col("cs_a").isNull || col("cs_b").isNull).count() == 0,
      "pair sets differ")
    val maxDiff = joined.agg(max(abs(col("cs_a") - col("cs_b")))).head.getDouble(0)
    assert(maxDiff <= 1e-9, s"scores diverge by $maxDiff")
    joined.unpersist()
  }

  test("SimSearch.ivfTopK recall vs brute force on sf0.001 embeddings") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val exact = SimSearch.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = SimSearch.ivfTopK(emb, queries, "vec_id", "embedding", 5,
      nCentroids = 8, nProbe = 4).select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall $recall") // nProbe=4 of 8 buckets on random vectors
  }

  test("SimSearch.ivfTopKLloyd: iters=0 equals id-order IVF; refined recall holds") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 100 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id", "cos_sim", "rnk")
        .collect().map(_.toString).toSet
    // zero refinements = the id-order seeding, bit for bit
    assert(rows(SimSearch.ivfTopKLloyd(emb, queries, "vec_id", "embedding", 5,
        nCentroids = 8, nProbe = 4, iters = 0)) ==
      rows(SimSearch.ivfTopK(emb, queries, "vec_id", "embedding", 5,
        nCentroids = 8, nProbe = 4)))
    val exact = SimSearch.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val lloyd = SimSearch.ivfTopKLloyd(emb, queries, "vec_id", "embedding", 5,
        nCentroids = 8, nProbe = 4, iters = 2)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(lloyd).size.toDouble / exact.size
    assert(recall >= 0.3, s"Lloyd-IVF recall $recall")
  }

  test("SimSearch.pqTopK: ADC recall vs brute force; deterministic re-run") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val exact = SimSearch.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    def run() = SimSearch.pqTopK(emb, queries, "vec_id", "embedding", 5,
        dim = 64, nSub = 8, nCodes = 16, iters = 1)
      .select("query_id", "vec_id", "adc_sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pq = run()
    // 8x16 codes over random 64-dim vectors is a coarse quantizer —
    // the gate is "meaningfully better than chance + stable"; the
    // accuracy knobs are (nSub, nCodes, exact rerank)
    val pqPairs = pq.map { case (q, v, _) => (q, v) }
    val recall = exact.intersect(pqPairs).size.toDouble / exact.size
    assert(recall >= 0.15, s"PQ-ADC recall $recall")
    assert(run() == pq, "PQ pipeline is not deterministic across runs")
    // exact rerank over PQ candidates: any true neighbor the candidate
    // set contains is guaranteed into the final top-k, so recall must
    // not drop below raw ADC (and usually improves)
    val reranked = SimSearch.pqTopKRerank(emb, queries, "vec_id", "embedding", 5,
        dim = 64, nSub = 8, nCodes = 16, iters = 1, rerankFactor = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val rerankRecall = exact.intersect(reranked).size.toDouble / exact.size
    assert(rerankRecall >= recall, s"rerank recall $rerankRecall < ADC recall $recall")
  }

  test("SimSearch.ivfPqTopK: residual codes beat plain PQ on clustered data; deterministic") {
    // Residual quantization's premise is that data CLUSTERS (so within-
    // cell residual spread << raw spread and the same code budget
    // quantizes finer). The driver's embeddings table is isotropic
    // random — cos(x, centroid) ~ 0, so ||x − c||² ~ 2||x||² and
    // residuals are LARGER than the vectors; measured there, IVFPQ
    // full-probe recall 0.16 vs PQ 0.28. The ≥-PQ property is asserted
    // on a planted-cluster fixture (8 unit centers, σ=0.05 noise — the
    // real-embedding regime); the driver table still gates determinism
    // and the above-chance floor at the composed operating point.
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(8)(Array.fill(64)(rnd.nextGaussian()))
      .map { v => val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n) }
    val clustered = (0 until 400).map { i =>
      (i.toLong, centers(i % 8).map(x => (x + 0.05 * rnd.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
    val cq = clustered.filter(col("vec_id") % 40 === 0)
    val cExact = SimSearch.bruteForceTopK(clustered, cq, "vec_id", "embedding", 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    def recallOf(exact: Set[(Long, Long)], pairs: Set[(Long, Long)]) =
      exact.intersect(pairs).size.toDouble / exact.size
    val cPq = recallOf(cExact,
      SimSearch.pqTopK(clustered, cq, "vec_id", "embedding", 5,
          dim = 64, nSub = 8, nCodes = 16, iters = 1)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet)
    // Equal code bytes (same nSub x nCodes), full probe — isolates the
    // residual-coding benefit from the IVF scan bound.
    val cIvfPq = recallOf(cExact,
      SimSearch.ivfPqTopK(clustered, cq, "vec_id", "embedding", 5,
          dim = 64, nCent = 8, nProbe = 8, cIters = 1, nSub = 8,
          nCodes = 16, pIters = 1)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet)
    assert(cIvfPq >= cPq, s"IVFPQ recall $cIvfPq < PQ recall $cPq on clustered data")

    // Driver table, composed operating point (probe 2/8 cells):
    // above-chance floor + cross-run determinism.
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val exact = SimSearch.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    def ivfPq() = SimSearch.ivfPqTopK(emb, queries, "vec_id",
        "embedding", 5, dim = 64, nCent = 8, nProbe = 2, cIters = 1,
        nSub = 8, nCodes = 16, pIters = 1)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val probed = ivfPq()
    assert(recallOf(exact, probed) >= 0.1,
      s"IVFPQ probed recall ${recallOf(exact, probed)}")
    assert(ivfPq() == probed, "IVFPQ pipeline is not deterministic across runs")
  }

  test("SimSearch OPQ-lite: balanced permutation is valid, balances variance, recall >= plain IVFPQ") {
    // anisotropic clustered fixture: residual noise concentrated in
    // coordinates 0-7 — exactly ONE subspace under identity grouping,
    // so its codebook eats the whole quantization budget; the balanced
    // permutation spreads the hot coordinates across subspaces
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(8)(Array.fill(64)(rnd.nextGaussian()))
      .map { v => val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n) }
    def sigma(j: Int) = if (j < 8) 0.3 else 0.01
    val clustered = (0 until 400).map { i =>
      (i.toLong, centers(i % 8).zipWithIndex
        .map { case (x, j) => (x + sigma(j) * rnd.nextGaussian()).toFloat })
    }.toDF("vec_id", "embedding")
    val cq = clustered.filter(col("vec_id") % 40 === 0)
    // permutation validity + balance on the raw frame
    val unit = clustered.select(col("vec_id"),
      col("embedding").cast("array<double>").as("e"))
    val perm = SimSearch.varianceBalancedPerm(unit, "e", 64, 8)
    assert(perm.sorted.toSeq == (0 until 64), "not a permutation")
    // every subspace gets exactly one hot coordinate (8 hot coords, 8
    // subspaces, greedy assigns heaviest-first to the lightest bin)
    val hotPerSub = perm.grouped(8).map(_.count(_ < 8)).toSeq
    assert(hotPerSub == Seq.fill(8)(1), s"hot coords per subspace: $hotPerSub")
    // recall at byte parity: permuted codebooks >= identity grouping
    val exact = SimSearch.bruteForceTopK(clustered, cq, "vec_id", "embedding", 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    def recallOf(pairs: Set[(Long, Long)]) =
      exact.intersect(pairs).size.toDouble / exact.size
    def run(useOpq: Boolean) = recallOf(
      SimSearch.ivfPqTopK(clustered, cq, "vec_id", "embedding", 5,
          dim = 64, nCent = 8, nProbe = 8, cIters = 1, nSub = 8,
          nCodes = 16, pIters = 1, opq = useOpq)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet)
    val (plain, opq) = (run(false), run(true))
    assert(opq >= plain, s"OPQ recall $opq < plain IVFPQ recall $plain")
  }

  test("SimSearch.matryoshkaTopK: degenerate full-prefix run equals brute force; tiering helps recall") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 100 === 0)
    def img(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id", "cos_sim", "rnk")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    // prefix = full width + candidates ≥ corpus ⇒ exactly brute force
    val full = SimSearch.matryoshkaTopK(emb, queries, "vec_id", "embedding",
      k = 10, prefixDim = 64, candFactor = 1000)
    val bf = SimSearch.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
    assert(img(full) == img(bf))
    // truncated stage: candidate supersets never lose recall (exact
    // rerank of a superset dominates), and the tiered run beats the
    // random-candidate floor
    val exact = bf.select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(cf: Int) = {
      val got = SimSearch.matryoshkaTopK(emb, queries, "vec_id", "embedding",
          k = 10, prefixDim = 8, candFactor = cf)
        .select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    val (r2, r8) = (recallAt(2), recallAt(8))
    assert(r8 >= r2, s"recall fell as candidates grew: cf=2 $r2 vs cf=8 $r8")
    assert(r8 > 0.1, s"tiered recall $r8 at chance level")
  }

  test("SimSearch.binaryHammingTopK: all-candidates run equals brute force; Hamming tiering beats chance") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 100 === 0)
    def img(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id", "cos_sim", "rnk")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val all = SimSearch.binaryHammingTopK(emb, queries, "vec_id", "embedding",
      k = 10, candFactor = 1000)
    val bf = SimSearch.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
    assert(img(all) == img(bf))
    val exact = bf.select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(cf: Int) = {
      val got = SimSearch.binaryHammingTopK(emb, queries, "vec_id", "embedding",
          k = 10, candFactor = cf)
        .select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    val (r2, r8) = (recallAt(2), recallAt(8))
    assert(r8 >= r2, s"recall fell as candidates grew: cf=2 $r2 vs cf=8 $r8")
    assert(r8 > 0.2, s"BQ-tiered recall $r8 at chance level")
  }

  test("SimSearch.binaryHammingTopK: codes follow the embedding dimension past 64") {
    import spark.implicits._
    // 96-dim corpus where vectors agree on the FIRST 64 dims and differ
    // only beyond them: a 64-truncated prefilter sees Hamming 0 for all
    // and tie-breaks by id (picking id 1, the wrong neighbor); the
    // dimension-sized code ranks the true match first.
    def vec(tail: Double): Array[Double] =
      Array.fill(64)(1.0) ++ Array.fill(32)(tail)
    val corpus = ((1L to 19L).map(i => (i, vec(-1.0))) :+ (20L, vec(1.0)))
      .toDF("vec_id", "embedding")
    val queries = Seq((0L, vec(1.0))).toDF("vec_id", "embedding")
    val top = SimSearch.binaryHammingTopK(corpus, queries, "vec_id", "embedding",
      k = 1, candFactor = 1)
    val got = top.select("vec_id").as[Long].collect().toSeq
    assert(got == Seq(20L), s"prefilter ignored dims past 64: picked $got")
    // and with every candidate admitted it still equals brute force
    def img(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id", "cos_sim", "rnk")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val all = SimSearch.binaryHammingTopK(corpus, queries, "vec_id", "embedding",
      k = 5, candFactor = 100)
    val bf = SimSearch.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5)
    assert(img(all) == img(bf))
  }

  test("DedupOps.maskDuplicateSpans: canonical occurrence survives, other occurrences masked, unique text untouched") {
    import spark.implicits._
    val boiler = "all rights reserved by the"        // a 5-token boilerplate span
    val docs = Seq(
      (1L, s"alpha beta gamma $boiler delta"),       // first occurrence -> canonical
      (2L, s"$boiler epsilon zeta eta theta iota"),  // duplicate -> masked
      (3L, "completely unique words appear here only once")
    ).toDF("doc_id", "text")
    val out = DedupOps.maskDuplicateSpans(docs, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    // doc 1 holds the globally-first occurrence: nothing masked
    assert(out(1L) == ((9, 0, s"alpha beta gamma $boiler delta")), out(1L).toString)
    // doc 2's copy of the span is masked out, the rest survives intact
    assert(out(2L) == ((10, 5, "epsilon zeta eta theta iota")), out(2L).toString)
    // unique text is untouched
    assert(out(3L) == ((7, 0, "completely unique words appear here only once")))
    // a doc that is ENTIRELY a duplicate span masks to the empty string
    val docs2 = docs.unionByName(Seq((4L, boiler)).toDF("doc_id", "text"))
    val all = DedupOps.maskDuplicateSpans(docs2, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(all(4L) == "" || all(1L).contains(boiler),
      "span lost from every document — no canonical survivor")
    // exactly one of the three occurrences keeps the span
    val survivors = all.values.count(_.contains(boiler))
    assert(survivors == 1, s"$survivors documents kept the duplicated span")
  }

  test("LanguageModel.knBigramNll: continuation backoff ranks open-context words above frequent-but-bound ones; held-out finite") {
    import spark.implicits._
    // the classic KN discriminator: "francisco" is FREQUENT but only
    // ever follows "san"; "pine" is rarer overall but follows many
    // distinct histories. After an unseen history, KN must prefer
    // "pine" (high continuation count) over "francisco" (N1+(. w)=1) —
    // the case add-k smoothing gets backwards.
    val train = (
      (1 to 30).map(i => (i.toLong, "san francisco")) ++
      Seq((100L, "tall pine"), (101L, "old pine"), (102L, "green pine"),
        (103L, "small pine"), (104L, "dry pine"))
    ).toDF("doc_id", "text")
    val eval = Seq((900L, "the francisco"), (901L, "the pine")).toDF("doc_id", "text")
    val nll = graft.llm.LanguageModel.knBigramNll(train, eval, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // both bigrams are unseen and the history "the" is unseen — scores
    // are pure continuation probabilities, finite in both cases
    assert(nll(900L).isFinite && nll(901L).isFinite)
    assert(nll(901L) < nll(900L),
      s"KN ranked bound-context 'francisco' (${nll(900L)}) above open-context 'pine' (${nll(901L)})")
    // in-distribution text scores far better than held-out gibberish
    val eval2 = Seq((910L, "san francisco san francisco"),
      (911L, "zzq qqz zqz qzz")).toDF("doc_id", "text")
    val nll2 = graft.llm.LanguageModel.knBigramNll(train, eval2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(nll2(910L) + 1.0 < nll2(911L),
      s"training-distribution text (${nll2(910L)}) not clearly under gibberish (${nll2(911L)})")
    // sub-2-token docs have no bigrams and are absent, not crashed
    val tiny = Seq((920L, "one")).toDF("doc_id", "text")
    assert(graft.llm.LanguageModel.knBigramNll(train, tiny, "doc_id", "text").count() == 0)
  }

  test("SimSearch.pcaRotation: orthogonal, dot-preserving, and it rescues the Matryoshka prefix on latent-structure embeddings") {
    import spark.implicits._
    // Latent-structure fixture: an 8-dim signal mixed into 64 dims by a
    // fixed random matrix + small noise. The ENERGY lives in an 8-dim
    // subspace, but NOT in the first 8 coordinates — the regime where a
    // raw Matryoshka prefix is blind and PCA rotation is the fix.
    val rnd = new scala.util.Random(23)
    val mix = Array.fill(64, 8)(rnd.nextGaussian())
    val vecs = (0 until 300).map { i =>
      val s = Array.fill(8)(rnd.nextGaussian() + (if (i % 6 == 0) 3.0 else 0.0))
      val v = Array.tabulate(64)(j =>
        (0 until 8).map(k => mix(j)(k) * s(k)).sum + 0.01 * rnd.nextGaussian())
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val rot = SimSearch.pcaRotation(vecs, "vec_id", "embedding")
    // orthogonality: R·Rᵀ = I
    val dim = rot.length
    for (i <- 0 until dim; j <- i until dim) {
      val d = (0 until dim).map(k => rot(i)(k) * rot(j)(k)).sum
      assert(math.abs(d - (if (i == j) 1.0 else 0.0)) < 1e-9, s"R·Rᵀ[$i][$j] = $d")
    }
    // rotation preserves pairwise dots (checked on the unit embeddings
    // through the column op itself, not just the matrix)
    val rotated = vecs.select(col("vec_id"),
      SimSearch.rotateEmb(col("embedding"), rot).as("embedding"))
    def dots(df: org.apache.spark.sql.DataFrame) =
      SimSearch.bruteForceTopK(df, df.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", 5)
        .select("query_id", "vec_id", "cos_sim")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val (dRaw, dRot) = (dots(vecs), dots(rotated))
    assert(dRaw.keySet == dRot.keySet)
    dRaw.foreach { case (k, v) => assert(math.abs(v - dRot(k)) <= 2e-6, s"$k: $v vs ${dRot(k)}") }
    // energy compaction: the rotated 8-prefix carries nearly all the
    // variance; the raw 8-prefix carries only its proportional share
    def prefixEnergy(df: org.apache.spark.sql.DataFrame): Double =
      SimSearch.unitized(df, "vec_id", "embedding", "vec_id", "ne")
        .select(
          aggregate(slice(col("ne"), 1, 8), lit(0.0), (a, x) => a + x * x).as("p"))
        .agg(avg(col("p"))).head.getDouble(0)
    val (eRaw, eRot) = (prefixEnergy(vecs), prefixEnergy(rotated))
    assert(eRot > 0.95 && eRot > eRaw + 0.3,
      s"no energy compaction: raw $eRaw vs rotated $eRot")
    // the retrieval consequence: prefix-only candidates (candFactor 1 —
    // no rerank slack) recover the true top-k far better after rotation
    val queries = vecs.filter(col("vec_id") % 50 === 0)
    val exact = SimSearch.bruteForceTopK(vecs, queries, "vec_id", "embedding", 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    def recall(df: org.apache.spark.sql.DataFrame, q: org.apache.spark.sql.DataFrame) = {
      val got = SimSearch.matryoshkaTopK(df, q, "vec_id", "embedding", 5,
          prefixDim = 8, candFactor = 1)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    val rRaw = recall(vecs, queries)
    val rRot = recall(rotated, rotated.filter(col("vec_id") % 50 === 0))
    assert(rRot >= rRaw,
      s"rotation hurt matryoshka prefix recall: $rRaw -> $rRot")
    assert(rRot >= 0.9, s"rotated prefix recall only $rRot")
  }

  test("SimSearch.autoTopK: planner walks the ladder cheapest-first; executed choice meets its recall target") {
    import spark.implicits._
    val sp = SimSearch
    // pure planner decisions across the table
    assert(sp.choosePlan(1000L, 64, 0.5) == sp.BrutePlan)   // sub-cutoff corpus
    assert(sp.choosePlan(1000000L, 64, 1.0) == sp.BrutePlan) // exactness demanded
    assert(sp.choosePlan(1000000L, 64, 0.5) == sp.BqPlan(8))
    assert(sp.choosePlan(1000000L, 64, 0.65) == sp.PqRerankPlan(8, 16, 8))
    assert(sp.choosePlan(1000000L, 64, 0.85) == sp.Sq8Plan)
    sp.choosePlan(1000000L, 64, 0.93) match {
      case sp.IvfPlan(nc, np) => assert(nc == 1000 && np == 500)
      case other => fail(s"expected IvfPlan, got $other")
    }
    assert(sp.choosePlan(1000000L, 64, 0.97) == sp.BrutePlan) // above every approx floor
    // the budget axis: a 16-byte/vector cap rules out everything but
    // the 1-bit and PQ codes; an impossible (target, budget) pair
    // fails fast instead of under-delivering
    assert(sp.choosePlan(1000000L, 64, 0.5, bytesPerVector = 16L) == sp.BqPlan(8))
    assert(sp.choosePlan(1000000L, 64, 0.65, bytesPerVector = 8L) ==
      sp.PqRerankPlan(8, 16, 8))
    intercept[IllegalArgumentException] {
      sp.choosePlan(1000000L, 64, 0.97, bytesPerVector = 64L)
    }
    // a non-multiple-of-8 dim picks the largest dividing subspace count
    assert(sp.choosePlan(1000000L, 96, 0.65) == sp.PqRerankPlan(8, 16, 8))
    assert(sp.choosePlan(1000000L, 50, 0.65) == sp.PqRerankPlan(2, 16, 8))

    // executed on the planted-cluster fixture (the real-embedding
    // regime: 8 unit centers, σ=0.05): each auto-chosen tier must
    // DELIVER the recall it promised. knownN forces the planner past
    // the brute cutoff while executing at spec scale.
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(8)(Array.fill(64)(rnd.nextGaussian()))
      .map { v => val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n) }
    val clustered = (0 until 400).map { i =>
      (i.toLong, centers(i % 8).map(x => (x + 0.05 * rnd.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
    val cq = clustered.filter(col("vec_id") % 40 === 0)
    val exact = SimSearch.bruteForceTopK(clustered, cq, "vec_id", "embedding", 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    for (target <- Seq(0.6, 0.7, 0.9)) {
      val got = SimSearch.autoTopK(clustered, cq, "vec_id", "embedding", 5,
          recallTarget = target, knownN = 1000000L)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      val recall = exact.intersect(got).size.toDouble / exact.size
      assert(recall >= target,
        s"tier ${sp.lastPlan.get().tier} for target $target delivered $recall")
    }
    // the SQL surface routes through the same planner
    clustered.createOrReplaceTempView("auto_corpus")
    cq.createOrReplaceTempView("auto_queries")
    val viaSql = spark.sql(
      "SELECT * FROM graft_auto_topk('auto_corpus', 'auto_queries', 'vec_id', 'embedding', 5, 0.9)")
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val viaApi = SimSearch.autoTopK(clustered, cq, "vec_id", "embedding", 5,
        recallTarget = 0.9)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(viaSql == viaApi)
  }

  test("SimSearch.filteredIvfTopK: pre-filtered semantics, recall, pushed predicate") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val pred = col("label") === 1
    val res = SimSearch.filteredIvfTopK(emb, queries, "vec_id", "embedding",
      pred, 5, nCentroids = 8, nProbe = 4, iters = 2).cache()
    // PRE-filtered: every returned neighbor satisfies the predicate
    val allowed = emb.filter(pred).select(col("vec_id")).as[Long].collect().toSet
    val got = res.select("query_id", "vec_id").as[(Long, Long)].collect()
    assert(got.nonEmpty && got.forall { case (_, v) => allowed(v) },
      "a filtered-ANN result violates the predicate")
    // recall vs the EXACT filtered search (same predicate, brute force)
    val exact = SimSearch.bruteForceTopK(emb.filter(pred), queries,
        "vec_id", "embedding", 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(got.toSet).size.toDouble / exact.size
    assert(recall >= 0.3, s"filtered-IVF recall $recall")
    // filter-agnostic index: the same query WITHOUT the filter ranks a
    // superset pool, so filtered results are never ranked above rows the
    // predicate excludes (probe cells coincide because centroids do)
    res.unpersist()
    // the predicate reaches the parquet scan of the bucketed side
    val plan = SimSearch.filteredIvfTopK(emb, queries, "vec_id", "embedding",
      pred, 5, nCentroids = 8, nProbe = 4, iters = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(label), EqualTo(label,1)"),
      s"label predicate not pushed to the corpus scan:\n${plan.take(4000)}")
  }

  test("SimSearch.randomProject: JL dot preservation and the LSH sign tie-in") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 100)
    val outDim = 16
    val proj = SimSearch.randomProject(emb, "vec_id", "embedding", dim = 64,
        outDim = outDim)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)) }
    val raw = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def dotL(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    // JL: projected dots track raw dots in aggregate. Individual pairs
    // fluctuate (outDim=16 is aggressive); the mean absolute distortion
    // over sampled pairs is the lemma-scale quantity.
    val ids = raw.keys.toSeq.sorted
    val pairs = for (a <- ids; b <- ids if a < b && (a + b) % 7 == 0) yield (a, b)
    val dists = pairs.map { case (a, b) =>
      math.abs(dotL(raw(a), raw(b)) - dotL(proj(a), proj(b)))
    }
    val norms = ids.map(i => dotL(raw(i), raw(i))).sum / ids.size
    val meanDist = dists.sum / dists.size
    assert(meanDist < 0.5 * norms,
      s"JL distortion $meanDist vs mean sq norm $norms")
    // tie-in: LSH signature bit j == sign of projection dim j (same
    // xxhash64 hyperplane family; unitization never flips a sign)
    graft.engine.expressions.HyperplaneProbes.register(spark)
    val sigs = SimSearch.unitized(emb, "vec_id", "embedding", "vec_id", "__ne")
      .select(col("vec_id"),
        graft.engine.expressions.HyperplaneProbes.signature(col("__ne"), outDim)
          .as("sig"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    ids.foreach { id =>
      val fromProj = proj(id).map(y => if (y > 0) '1' else '0').mkString
      assert(fromProj == sigs(id),
        s"vec $id: projection signs $fromProj != LSH signature ${sigs(id)}")
    }
  }

  test("SimSearch.rpTopK: JL-compressed candidates + exact rerank recall") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val exact = SimSearch.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    def run() = SimSearch.rpTopK(emb, queries, "vec_id", "embedding", 5,
        dim = 64, outDim = 16, rerankFactor = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val rp = run()
    val recall = exact.intersect(rp).size.toDouble / exact.size
    // 64->16 on ISOTROPIC random vectors is the worst case for JL
    // ordering (all true sims ~0, so projection noise dominates the
    // margin — the same regime caveat as the PQ 0.15 floor); the gate is
    // far-above-chance (chance = k/N ~ 0.01) + deterministic + monotone
    assert(recall >= 0.2, s"rp+rerank recall $recall")
    assert(run() == rp, "rpTopK is not deterministic across runs")
    // widening the candidate pool can only help (monotone recall)
    val wide = SimSearch.rpTopK(emb, queries, "vec_id", "embedding", 5,
        dim = 64, outDim = 16, rerankFactor = 16)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val wideRecall = exact.intersect(wide).size.toDouble / exact.size
    assert(wideRecall >= recall, s"recall not monotone in rerankFactor: $wideRecall < $recall")
  }

  test("SimSearch.filteredTopKAuto: selective filters go exact, wide ones probe") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val pred = col("label") === 1
    def img(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSet
    // below the threshold: must be EXACTLY the brute-force result
    val below = SimSearch.filteredTopKAuto(emb, queries, "vec_id", "embedding",
      pred, 5, bruteThreshold = 1000000L)
    assert(img(below) ==
      img(SimSearch.bruteForceTopK(emb.filter(pred), queries, "vec_id", "embedding", 5)))
    // above the threshold: must be EXACTLY the probed IVF result
    val above = SimSearch.filteredTopKAuto(emb, queries, "vec_id", "embedding",
      pred, 5, bruteThreshold = 0L)
    assert(img(above) ==
      img(SimSearch.filteredIvfTopK(emb, queries, "vec_id", "embedding", pred, 5)))
  }

  test("SimSearch.filteredIvfTopKByIds: no eval document ever surfaces") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val edges = SimSearch.hyperplaneLshPairs(emb, "vec_id", "embedding",
        minCos = 0.3, nBits = 6).select("id_a", "id_b")
    val split = graft.ops.Sampling.leakageSafeSplit(
      emb.select(col("vec_id")), "vec_id", edges, "id_a", "id_b", 0.2)
    val trainIds = split.filter(col("split") === "train").select("vec_id")
    val res = SimSearch.filteredIvfTopKByIds(emb, trainIds,
      emb.filter(col("vec_id") % 100 === 0), "vec_id", "embedding", 5)
    val evalIds = split.filter(col("split") === "eval")
      .select("vec_id").as[Long].collect().toSet
    assert(evalIds.nonEmpty, "fixture: split produced no eval docs")
    val got = res.select("vec_id").as[Long].collect()
    assert(got.nonEmpty && got.forall(!evalIds(_)),
      "an eval document surfaced in split-aware retrieval")
  }

  test("SimSearch.ivfTopKKMeans: learned centroids, recall vs brute force") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val exact = SimSearch.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = SimSearch.ivfTopKKMeans(emb, queries, "vec_id", "embedding", 5,
        nCentroids = 8, nProbe = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    // learned centroids should do at least as well as the id-order stand-in
    assert(recall >= 0.3, s"KMeans-IVF recall $recall")
    val again = SimSearch.ivfTopKKMeans(emb, queries, "vec_id", "embedding", 5,
        nCentroids = 8, nProbe = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(approx == again) // seeded fit -> deterministic buckets
  }

  test("persisted IVF index: queryIvfIndex == ivfTopKKMeans, postings bucket-partitioned") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf").toString + "/idx"
    SimSearch.buildIvfIndex(emb, "vec_id", "embedding", path, nCentroids = 8)
    val fromIndex = SimSearch.queryIvfIndex(queries, "vec_id", "embedding", path, 5, nProbe = 4)
      .select("query_id", "vec_id", "cos_sim").as[(Long, Long, Double)].collect().toSet
    val inMemory = SimSearch.ivfTopKKMeans(emb, queries, "vec_id", "embedding", 5,
        nCentroids = 8, nProbe = 4)
      .select("query_id", "vec_id", "cos_sim").as[(Long, Long, Double)].collect().toSet
    assert(fromIndex == inMemory && fromIndex.nonEmpty)
    // the scale feature: one partition directory per posting list
    val dirs = new java.io.File(s"$path/postings").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("bucket="))
    assert(dirs.length > 1, s"expected bucket=* partition dirs, got ${dirs.mkString(",")}")
    // the Lloyd build (q313/q314's oracle-replayable variant) must be
    // bit-identical to the in-memory ivfTopKLloyd through the SAME
    // persisted layout — build-once / probe-many loses nothing
    val lp = java.nio.file.Files.createTempDirectory("graft_ivf_l").toString + "/idx"
    SimSearch.buildIvfIndexLloyd(emb, "vec_id", "embedding", lp,
      nCentroids = 8, iters = 2)
    val lloydIdx = SimSearch.queryIvfIndex(queries, "vec_id", "embedding", lp, 5, nProbe = 4)
      .select("query_id", "vec_id", "cos_sim").as[(Long, Long, Double)].collect().toSet
    val lloydMem = SimSearch.ivfTopKLloyd(emb, queries, "vec_id", "embedding", 5,
        nCentroids = 8, nProbe = 4, iters = 2)
      .select("query_id", "vec_id", "cos_sim").as[(Long, Long, Double)].collect().toSet
    assert(lloydIdx == lloydMem && lloydIdx.nonEmpty,
      "persisted Lloyd index diverged from the in-memory path")
  }

  test("hyperplaneLshPairs finds planted near-duplicate vectors, deterministically") {
    // 3 tight clusters (near-dups) + noise: near-dup pairs have cos≈1.
    val base = (0 until 3).map(c => Array.tabulate(16)(i =>
      math.sin(c * 37 + i).toFloat))
    val rows = base.zipWithIndex.flatMap { case (v, c) =>
      Seq((c * 10L, v), (c * 10L + 1, v.map(x => x * 1.01f + 0.001f)))
    } ++ (100 until 120).map(i => (i.toLong, Array.tabulate(16)(d =>
      math.cos(i * 131 + d * 17).toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val got = SimSearch.hyperplaneLshPairs(df, "vec_id", "embedding", 0.95, nBits = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // all 3 planted pairs survive bucketing + verification
    assert(Set((0L, 1L), (10L, 11L), (20L, 21L)).subsetOf(got), s"got $got")
    val again = SimSearch.hyperplaneLshPairs(df, "vec_id", "embedding", 0.95, nBits = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == again)
  }

  test("hyperplaneLshPairsMultiProbe: superset of single-probe, higher recall, deterministic") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val minCos = 0.3
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val single = pairSet(SimSearch.hyperplaneLshPairs(emb, "vec_id", "embedding", minCos, nBits = 8))
    val multi = pairSet(SimSearch.hyperplaneLshPairsMultiProbe(
      emb, "vec_id", "embedding", minCos, nBits = 8, nProbe = 3))
    // probe 0 is the unflipped signature: candidates only grow
    assert(single.subsetOf(multi),
      s"multi-probe lost single-probe pairs: ${single.diff(multi).take(3)}")
    // every emitted pair is exact-verified -> precision 1 by construction;
    // recall against the exact ground truth must not decrease (and on
    // this corpus strictly improves)
    val truth = pairSet(SimSearch.thresholdPairs(emb, "vec_id", "embedding", minCos))
    assert(multi.subsetOf(truth))
    assert(multi.size > single.size,
      s"expected extra recall from 3 probes: single=${single.size} multi=${multi.size}")
    val again = pairSet(SimSearch.hyperplaneLshPairsMultiProbe(
      emb, "vec_id", "embedding", minCos, nBits = 8, nProbe = 3))
    assert(multi == again)
  }

  test("SimSearch.sq8TopK: int8 codes, bounded reconstruction error, recall vs brute force") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val enc = SimSearch.sq8Encode(emb, "vec_id", "embedding")
    // the compression claim: codes are genuinely 1-byte
    assert(enc.schema("codes").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ByteType, containsNull = false)
      || enc.schema("codes").dataType.simpleString == "array<tinyint>")
    // per-component reconstruction error ≤ step/2 (+ float slack)
    val err = enc
      .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
      .withColumn("__d", col("embedding").cast("array<double>"))
      .withColumn("__n", sqrt(graft.engine.expressions.DotProduct.dot(col("__d"), col("__d"))))
      .withColumn("__ne", when(col("__n") === 0.0, col("__d"))
        .otherwise(transform(col("__d"), x => x / col("__n"))))
      .select(max(expr(
        """aggregate(zip_with(__ne, codes, (x, c) ->
             abs(x - (minv + step * (cast(c as int) + 128)))),
           cast(0.0 as double), (a, e) -> greatest(a, e)) - step / 2""")).as("slack"))
      .head.getDouble(0)
    assert(err <= 1e-9, s"reconstruction error exceeds step/2 by $err")
    val queries = emb.filter(col("vec_id") % 50 === 0)
    def topSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val sq = topSet(SimSearch.sq8TopK(emb, queries, "vec_id", "embedding", 10))
    val exact = topSet(SimSearch.bruteForceTopK(emb, queries, "vec_id", "embedding", 10))
    val recall = sq.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"SQ8 recall@10 = $recall")
    val again = topSet(SimSearch.sq8TopK(emb, queries, "vec_id", "embedding", 10))
    assert(sq == again)
  }

  test("HyperplaneProbes expression ≡ higher-order-function formulation, bit for bit") {
    // The HOF chain this expression replaced (per-bit aggregate/zip_with
    // folds + array_sort flip ranking) is pinned here as the oracle twin:
    // identical (id, signature) multisets on the real embeddings table.
    import graft.engine.expressions.{DotProduct, HyperplaneProbes}
    val nBits = 10
    val nProbe = 3
    DotProduct.register(spark)
    HyperplaneProbes.register(spark)
    val c = spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("__d", col("embedding").cast("array<double>"))
      .withColumn("__n", sqrt(DotProduct.dot(col("__d"), col("__d"))))
      .select(col("vec_id"),
        when(col("__n") === 0.0, col("__d"))
          .otherwise(transform(col("__d"), x => x / col("__n"))).as("__ne"))
    val signed = (0 until nBits).map { j =>
      aggregate(
        zip_with(col("__ne"), sequence(lit(0), size(col("__ne")) - 1),
          (x, i) => when(pmod(xxhash64(lit(j), i), lit(2)) === 0, x).otherwise(-x)),
        lit(0.0), (acc, x) => acc + x).as(s"__s$j")
    }
    val withSums = c.select((col("vec_id") +: signed.map(x => x)): _*)
    val bitCols = (0 until nBits).map(j =>
      when(col(s"__s$j") > 0, lit(1)).otherwise(lit(0)).cast("string"))
    val margins = array((0 until nBits).map(j =>
      struct(abs(col(s"__s$j")).as("m"), lit(j).as("j"))): _*)
    val withBase = withSums.withColumn("__base", concat(bitCols: _*))
      .withColumn("__flip", transform(array_sort(margins), s => s.getField("j")))
    val probeCols = (0 until nProbe).map { p =>
      val j = element_at(col("__flip"), p + 1)
      concat(
        col("__base").substr(lit(1), j),
        when(col("__base").substr(j + 1, lit(1)) === "1", lit("0")).otherwise(lit("1")),
        col("__base").substr(j + 2, lit(nBits)))
    }
    val hof = withBase.select(col("vec_id"),
      explode(array((col("__base") +: probeCols).map(_.cast("string")): _*)).as("__sig"))
      .as[(Long, String)].collect().toSeq.sorted
    val expr = c.select(col("vec_id"),
      explode(HyperplaneProbes.probes(col("__ne"), nBits, nProbe)).as("__sig"))
      .as[(Long, String)].collect().toSeq.sorted
    assert(expr.nonEmpty && expr == hof)
  }

  test("Multimodal.extractFeatures: deterministic histogram, L1-normalized") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(20)
    val assets = Multimodal.assetsFromDocuments(docs)
    val f1 = Multimodal.extractFeatures(assets).orderBy("asset_id").collect()
    val f2 = Multimodal.extractFeatures(assets).orderBy("asset_id").collect()
    assert(f1.sameElements(f2))
    f1.foreach { r =>
      val feats = r.getSeq[Float](3)
      assert(feats.length == Multimodal.featureDim)
      assert(math.abs(feats.sum - 1.0f) < 1e-3)
    }
  }

  test("Multimodal.MediaDecoder seam: open/close per PARTITION, decode per row, pluggable") {
    val opens = spark.sparkContext.longAccumulator("decoder-opens")
    val decodes = spark.sparkContext.longAccumulator("decoder-decodes")
    val closes = spark.sparkContext.longAccumulator("decoder-closes")
    // A counting decoder wired through the real HistogramDecoder — the
    // "real codec" stand-in, proving a custom instance plugs in and the
    // lifecycle is partition-wise (no per-row task/codec setup).
    class CountingDecoder extends Multimodal.MediaDecoder {
      val featureDim: Int = Multimodal.featureDim
      override def open(): Unit = opens.add(1)
      def decode(p: Array[Byte]): Array[Float] = {
        decodes.add(1); Multimodal.HistogramDecoder.decode(p)
      }
      override def close(): Unit = closes.add(1)
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(40)
    val assets = Multimodal.assetsFromDocuments(docs).repartition(4).cache()
    val nRows = assets.count()
    // exactly ONE action on the counting path — accumulators count one pass
    val counted = Multimodal.extractFeatures(assets, new CountingDecoder)
      .collect().sortBy(_.getLong(0))
    assert(opens.value == 4, s"open() ran ${opens.value} times for 4 partitions")
    assert(closes.value == 4, s"close() ran ${closes.value} times for 4 partitions")
    assert(decodes.value == nRows, s"decode() ran ${decodes.value} times for $nRows rows")
    // pluggable: identical output to the default-decoder path
    val viaDefault = Multimodal.extractFeatures(assets).collect().sortBy(_.getLong(0))
    assert(counted.sameElements(viaDefault))
    assets.unpersist()
  }

  test("Multimodal.ImageIoDecoder: PNG round-trip recovers the pixel formula; corrupt/empty → zeros") {
    val (w, h) = (24, 16)
    val ids = spark.range(0, 12).toDF("id")
    val assets = Multimodal.syntheticPngAssets(ids, "id", w, h)
    // payloads really are PNGs (magic bytes), metadata consistent
    val first = assets.orderBy("asset_id").head
    val png = first.getAs[Array[Byte]]("payload")
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    // decoded histogram == histogram computed from the formula directly
    val feats = Multimodal.extractFeatures(assets, Multimodal.ImageIoDecoder)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](3)).toMap
    for (id <- 0L until 12L) {
      val expected = new Array[Float](Multimodal.featureDim)
      for (y <- 0 until h; x <- 0 until w)
        expected(java.lang.Math.floorMod(id * 31 + x * 7 + y * 13, 256L).toInt >> 4) += 1f
      assert(feats(id) == expected.toSeq, s"pixel histogram mismatch for id=$id")
      assert(feats(id).map(_.toDouble).sum == w * h) // every pixel binned once
    }
    // contract corners: null, empty, and unreadable payloads → zero vector
    val zeros = Array.fill(Multimodal.featureDim)(0f).toSeq
    assert(Multimodal.ImageIoDecoder.decode(null).toSeq == zeros)
    assert(Multimodal.ImageIoDecoder.decode(Array.empty).toSeq == zeros)
    assert(Multimodal.ImageIoDecoder.decode("not a png".getBytes).toSeq == zeros)
    // a JPEG written by the JDK decodes through the same seam (lossy, so
    // just shape + mass — the exactness gate stays with lossless PNG)
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jf = Multimodal.ImageIoDecoder.decode(bos.toByteArray)
    assert(jf.length == Multimodal.featureDim && jf.map(_.toDouble).sum == 64.0)
  }

  test("Multimodal.WavDecoder: PCM round-trip recovers the sample formula; corrupt/empty → zeros") {
    val n = 400
    val ids = spark.range(0, 10).toDF("id")
    val assets = Multimodal.syntheticWavAssets(ids, "id", n)
    // payloads really are RIFF/WAVE containers
    val first = assets.orderBy("asset_id").head
    val wav = first.getAs[Array[Byte]]("payload")
    assert(new String(wav.take(4), "US-ASCII") == "RIFF" &&
      new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    // decoded amplitude histogram == histogram from the formula
    val feats = Multimodal.extractFeatures(assets, Multimodal.WavDecoder)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](3)).toMap
    for (id <- 0L until 10L) {
      val expected = new Array[Float](Multimodal.featureDim)
      for (i <- 0 until n)
        expected((java.lang.Math.floorMod(id * 31 + i * 7, 65536L) / 4096L).toInt) += 1f
      assert(feats(id) == expected.toSeq, s"amplitude histogram mismatch for id=$id")
      assert(feats(id).map(_.toDouble).sum == n)
    }
    // contract corners
    val zeros = Array.fill(Multimodal.featureDim)(0f).toSeq
    assert(Multimodal.WavDecoder.decode(null).toSeq == zeros)
    assert(Multimodal.WavDecoder.decode(Array.empty).toSeq == zeros)
    assert(Multimodal.WavDecoder.decode("not a wav".getBytes).toSeq == zeros)
    // a truncated header must not throw either
    assert(Multimodal.WavDecoder.decode(wav.take(20)).toSeq == zeros)
    // non-16-bit-signed layouts honor the "decode to zeros" contract:
    // an 8-bit WAV parses as PCM_UNSIGNED and must not be mis-binned
    val u8fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
      8000f, 8, 1, 1, 8000f, false)
    val u8bytes = Array.tabulate(64)(i => (i * 4).toByte)
    val u8out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(u8bytes), u8fmt, 64),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, u8out)
    assert(Multimodal.WavDecoder.decode(u8out.toByteArray).toSeq == zeros,
      "unsigned-PCM WAV must decode to zeros, not mis-binned samples")
  }

  test("Multimodal.aHashNearDups: planted one-pixel twins found; hash separates unrelated images") {
    import spark.implicits._
    // 20 base images (asset 2k) + a one-pixel-corrupted twin (2k+1) each
    val ids = (0L until 20L).toDF("id")
    val base = Multimodal.syntheticPngAssets(ids, "id", w = 24, h = 16, idScale = 2)
    val twins = Multimodal.syntheticPngAssets(ids, "id", w = 24, h = 16,
      idScale = 2, idOffset = 1, spot255 = true)
    val pairs = Multimodal.aHashNearDups(base.unionByName(twins),
        hamMax = 6, nBlocks = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // planted recall: a one-pixel edit flips at most the touched cell's
    // bit plus borderline cells near the global mean — nearly every
    // twin must surface within the Hamming budget
    val found = (0L until 20L).count(k => pairs.contains((2 * k, 2 * k + 1)))
    assert(found >= 18, s"only $found/20 planted twins found")
    (0L until 20L).foreach { k =>
      pairs.get((2 * k, 2 * k + 1)).foreach(h => assert(h <= 6))
    }
    // the hash DISCRIMINATES: the threshold must reject most of the
    // 780-pair space, not degenerate into all-pairs
    assert(pairs.size < 200, s"${pairs.size} pairs pass hamming<=6 — no separation")
    // contract corner: a corrupt payload decodes to the zero hash and
    // must not throw anywhere in the pipeline
    val corrupt = Seq((900L, "image", "not a png".getBytes, 24, 16),
        (901L, "image", Array.empty[Byte], 24, 16))
      .toDF("asset_id", "modality", "payload", "width", "height")
    assert(Multimodal.aHashNearDups(corrupt, hamMax = 6).count() >= 0)
  }

  test("Multimodal.resizeStub: metadata updated, payload shrunk proportionally") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(10)
    val assets = Multimodal.assetsFromDocuments(docs) // 64x48
    val resized = Multimodal.resizeStub(assets, 32, 24) // quarter area
    val r = resized.select(col("width"), col("height"),
      length(col("payload")).as("len")).collect()
    assert(r.forall(x => x.getInt(0) == 32 && x.getInt(1) == 24))
    val orig = assets.select(length(col("payload"))).collect().map(_.getInt(0))
    val news = resized.select(length(col("payload"))).collect().map(_.getInt(0))
    orig.zip(news).foreach { case (o, n) => assert(n <= o / 4 + 1 && n >= 1) }
  }

  test("TextOps.tokenizeBpe: extraction semantics, RE2-safe pattern") {
    val got = Seq("ab12 cd-ef!").toDF("t")
      .select(TextOps.tokenizeBpe(col("t"))).head.getSeq[String](0)
    assert(got == Seq("ab", "12", "cd", "-", "ef", "!"))
  }

  test("Multimodal.fakeDecode: known byte histogram") {
    val feats = Multimodal.fakeDecode("aaaa".getBytes("UTF-8")) // 'a'=97 -> bin 6
    assert(feats(6) == 1.0f)
    assert(feats.sum == 1.0f)
  }

  test("Bpe.learnMerges: greedy pairing, weighted argmax, early exhaustion") {
    // "aaaa"×3 has 3 adjacent (a,a) pairs ⇒ weight 9, beating (a,b)=5.
    // The merge must pair greedily: (a)(a)(a)(a) → (aa)(aa), so step 3
    // still finds (aa,aa)=3; after that every word is one symbol and
    // the learner stops early at 3 of the requested 6 rules.
    val words = Seq(("aaaa", 3L), ("ab", 5L)).toDF("w", "cnt")
    val got = graft.llm.Bpe.learnMerges(words, "w", "cnt", steps = 6)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == Seq((1, "a", "a", 9L), (2, "a", "b", 5L), (3, "aa", "aa", 3L)))
  }

  test("Bpe merge batching is bit-identical to one-at-a-time greedy (rules AND encodings)") {
    // A vocabulary wide enough that rounds accept multi-rule batches
    // (disjoint alphabets across word families) yet adversarial enough
    // to exercise every rejection path: shared symbols (the aaaa family
    // self-conflicts via its own new token), count ties broken
    // lexicographically, and creation ceilings (frequent pairs whose
    // neighbors are themselves frequent). batch=1 IS classic greedy —
    // the batched run must reproduce its rule sequence, counts, step
    // numbers, and final encodings exactly.
    val words = (
      (1 to 26).map(i => (s"${('a' + (i % 13)).toChar}${('n' + (i % 7)).toChar}ing", (i * 7 % 19 + 1).toLong)) ++
      Seq(("aaaa", 9L), ("aaab", 9L), ("banana", 8L), ("bandana", 8L),
          ("stream", 7L), ("streams", 7L), ("upstream", 6L),
          ("xyxyxy", 5L), ("xyxy", 5L), ("zzzz", 4L))
    ).toDF("w", "cnt")
    def rulesOf(batch: Int) =
      graft.llm.Bpe.learnMerges(words, "w", "cnt", steps = 40, batch = batch)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val sequential = rulesOf(1)
    val batched = rulesOf(64)
    assert(sequential.size == 40, s"fixture exhausted early: ${sequential.size}")
    assert(batched == sequential,
      s"batched diverged from sequential greedy:\n seq=$sequential\n bat=$batched")
    def encOf(batch: Int) =
      graft.llm.Bpe.encodeWords(words, "w", "cnt", steps = 40, batch = batch)
        .orderBy("w").collect().map(r => (r.getString(0), r.getString(2), r.getInt(3))).toSeq
    assert(encOf(64) == encOf(1), "batched encodings diverged")
    // encode output must be independent of input partitioning (r18
    // verdict item 6: the daily corpus-encode path) — the merge loop's
    // pair counts are map-side-combined sums and the argmax tie-break
    // is (count desc, lhs, rhs), none of which may see partition layout
    val enc1 = graft.llm.Bpe
      .encodeWords(words.repartition(1), "w", "cnt", steps = 40)
      .orderBy("w").collect().toSeq
    val enc7 = graft.llm.Bpe
      .encodeWords(words.repartition(7, col("cnt")), "w", "cnt", steps = 40)
      .orderBy("w").collect().toSeq
    assert(enc1 == enc7, "encode output depends on partition count/layout")
  }

  test("Bpe batching: created-string collisions cannot diverge from sequential greedy") {
    // An {a,b}-only vocabulary where merge products ALIAS each other
    // (e.g. (a)(bab) would create 'abab' while (ab)(ab) survivors are
    // around): the r17 collision guard must end a batch at such an
    // acceptance rather than let a later candidate ride a ceiling
    // argument whose never-counted premise just broke. batch=1 IS
    // classic greedy — rule sequences and counts must match exactly.
    val words = Seq(("abab", 11L), ("ababab", 9L), ("bab", 10L),
      ("aabab", 7L), ("abba", 6L), ("babab", 5L), ("aab", 4L),
      ("bb", 3L), ("abababab", 2L), ("baba", 2L)).toDF("w", "cnt")
    def rulesOf(batch: Int) =
      graft.llm.Bpe.learnMerges(words, "w", "cnt", steps = 14, batch = batch)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSeq
    val sequential = rulesOf(1)
    val batched = rulesOf(64)
    assert(batched == sequential,
      s"alias-prone batching diverged:\n seq=$sequential\n bat=$batched")
  }

  test("KmvDistinct: exact below k, bounded error above, partition-independent") {
    import graft.engine.expressions.KmvDistinct
    KmvDistinct.register(spark)
    def estimate(df: org.apache.spark.sql.DataFrame, k: Int): (Double, Int) = {
      val r = df.agg(KmvDistinct.sketch(KmvDistinct.hash60(col("v")), k).as("s"))
        .select(col("s.est"), col("s.n_kept")).head()
      (r.getDouble(0), r.getInt(1))
    }
    // below k: the sketch IS an exact distinct count (duplicates collapse)
    val small = (1 to 40).flatMap(i => Seq(s"x$i", s"x$i")).toDF("v")
    assert(estimate(small, 64) == ((40.0, 40)))
    // above k: estimator lands within 5/sqrt(k) of truth (generous vs
    // the ~1/sqrt(k-2) standard error; deterministic, so no flake)
    val n = 20000
    val big = (1 to n).map(i => s"item_$i").toDF("v")
    val k = 256
    val (est, kept) = estimate(big, k)
    assert(kept == k)
    assert(math.abs(est - n) / n < 5.0 / math.sqrt(k),
      s"estimate $est too far from $n")
    // merge order (partitioning) cannot change the bottom-k set
    assert(estimate(big.repartition(13), k) == ((est, kept)))
    assert(estimate(big.coalesce(1), k) == ((est, kept)))
  }

  test("KmvDistinct values: sorted, partition-independent, set-op accurate") {
    import graft.engine.expressions.KmvDistinct
    KmvDistinct.register(spark)
    val k = 256
    def vals(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.agg(KmvDistinct.sketch(KmvDistinct.hash60(col("v")), k).as("s"))
        .select(col("s.values")).head().getSeq[Long](0)
    // values are the sorted bottom-k, invariant under partitioning
    val big = (1 to 20000).map(i => s"item_$i").toDF("v")
    val v1 = vals(big)
    assert(v1.length == k && v1 == v1.sorted)
    assert(vals(big.repartition(13)) == v1)
    // sketch-only Jaccard: two 20k sets with true J = 1/3 (10k shared);
    // the merged-bottom-k estimator must land within 5/sqrt(k)
    val a = (1 to 20000).map(i => s"item_$i").toDF("v")
    val b = (10001 to 30000).map(i => s"item_$i").toDF("v")
    val (va, vb) = (vals(a), vals(b))
    val merged = (va ++ vb).distinct.sorted.take(k)
    val inBoth = merged.count(h => va.contains(h) && vb.contains(h))
    val jEst = inBoth.toDouble / merged.length
    assert(math.abs(jEst - 1.0 / 3) < 5.0 / math.sqrt(k),
      s"sketch Jaccard $jEst too far from ${1.0 / 3}")
  }

  test("TextOps.fleschEase: sentence runs and vowel-group syllables land the hand-computed score; degenerate floors") {
    import spark.implicits._
    // "The cat sat. The dog ran!": 6 words, 2 sentence runs, 6 vowel
    // groups -> 206.835 - 1.015·3 - 84.6·1 = 119.19
    val out = Seq("The cat sat. The dog ran!", "", "no punctuation here at all")
      .toDF("text")
      .select(graft.llm.TextOps.fleschEase(org.apache.spark.sql.functions.col("text"))
        .as("f"))
      .collect().map(r => math.rint(r.getDouble(0) * 10000) / 10000)
    assert(out(0) == 119.19, s"got ${out(0)}")
    // empty text: both counts floor at 1, zero syllables -> finite
    assert(out(1) == 205.82, s"got ${out(1)}")
    // punctuation-free: the whole text is one sentence (w/s = word
    // count), which must read strictly harder than the punctuated text
    assert(out(2) < out(0), s"one-long-sentence text should score harder: $out")
  }

  test("CorpusStats.zipfFit: two-point corpus fits slope -1 exactly; single-type vocabulary degenerates, not NaN") {
    import spark.implicits._
    // freqs (2, 1) at ranks (1, 2): both fixed-point points lie on
    // y = -x + 1e6·ln2, so OLS is exact: slope -1, intercept ln 2.
    val two = graft.llm.CorpusStats.zipfFit(Seq("a a b").toDF("text"), "text")
      .head
    assert(two.getLong(0) == 2 && two.getLong(1) == 3, s"counts: $two")
    assert(two.getDouble(2) == -1.0, s"slope ${two.getDouble(2)}")
    assert(two.getDouble(3) == 0.693147, s"intercept ${two.getDouble(3)}")
    // one type: zero x-variance -> mean model (slope 0, intercept ln 3)
    val one = graft.llm.CorpusStats.zipfFit(Seq("a a a").toDF("text"), "text")
      .head
    assert(one.getDouble(2) == 0.0 && one.getDouble(3) == 1.098612,
      s"degenerate fit: $one")
    // a skewed (roughly Zipfian) corpus must fit a negative slope
    val skew = graft.llm.CorpusStats.zipfFit(
      Seq("x x x x x x x x y y y y z z w").toDF("text"), "text").head
    assert(skew.getDouble(2) < -0.5, s"skewed corpus slope ${skew.getDouble(2)}")
  }

  test("CorpusStats.heapsFit: two-point prefix curve fits V = N/2 exactly; single doc degenerates") {
    import spark.implicits._
    // doc 1 "a a": (N, V) = (2, 1); doc 2 "b b": (4, 2) — the curve is
    // V = N/2, and both quantized points land exactly on slope 1,
    // intercept ln(1/2) (round(ln4·1e6) = 2·round(ln2·1e6)).
    val two = graft.llm.CorpusStats.heapsFit(
      Seq((1L, "a a"), (2L, "b b")).toDF("doc_id", "text"),
      "doc_id", "text").head
    assert(two.getLong(0) == 2, s"n_docs: $two")
    assert(two.getDouble(1) == 1.0, s"slope ${two.getDouble(1)}")
    assert(two.getDouble(2) == -0.693147, s"intercept ${two.getDouble(2)}")
    // one document: one point, zero x-variance -> mean model
    val one = graft.llm.CorpusStats.heapsFit(
      Seq((1L, "a a a")).toDF("doc_id", "text"), "doc_id", "text").head
    assert(one.getDouble(1) == 0.0, s"degenerate slope: $one")
    // sublinear growth: repeating the same vocabulary across docs must
    // fit a slope well below 1 (types saturate while tokens grow)
    val sat = graft.llm.CorpusStats.heapsFit(
      (1L to 8L).map(i => (i, "w x y z")).toDF("doc_id", "text"),
      "doc_id", "text").head
    assert(sat.getDouble(1) < 0.2, s"saturated slope ${sat.getDouble(1)}")
  }

  test("CountMin: overestimate-only, exact without collisions, partition-order-independent") {
    import spark.implicits._
    import graft.engine.expressions.CountMin
    CountMin.register(spark)
    val items = (Seq.fill(100)("hot") ++ Seq.fill(10)("warm") ++
      (1 to 50).map(i => s"cold$i")).toDF("x")
    def sketchOf(df: org.apache.spark.sql.DataFrame, d: Int, w: Int) =
      df.agg(CountMin.sketch(col("x"), d, w).as("sk"))
    // counters are sums: any partitioning yields the identical sketch
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Long]] =
      df.head.getSeq[scala.collection.Seq[Long]](0).map(_.toSeq)
    val a = rows(sketchOf(items.repartition(1), 4, 64))
    val b = rows(sketchOf(items.repartition(7), 4, 64))
    assert(a == b, "sketch depends on partitioning")
    // est >= exact for EVERY key (one-sided error), and a wide sketch
    // over a 52-type vocabulary is collision-free at depth 4 in
    // practice -> the heavy keys estimate exactly
    val est = items.distinct()
      .join(items.groupBy("x").agg(count(lit(1)).as("exact")), "x")
      .crossJoin(broadcast(sketchOf(items, 4, 4096)))
      .select(col("x"), col("exact"),
        CountMin.estimate(col("sk"), col("x"), 4, 4096).as("est"))
      .collect()
    est.foreach(r => assert(r.getLong(2) >= r.getLong(1),
      s"underestimate for ${r.getString(0)}: ${r.getLong(2)} < ${r.getLong(1)}"))
    val hot = est.find(_.getString(0) == "hot").get
    assert(hot.getLong(2) == 100L, s"hot estimate ${hot.getLong(2)}")
    // total mass per row is conserved: every row's counters sum to N
    a.foreach(row => assert(row.sum == 160L, s"row mass ${row.sum}"))
  }
}
