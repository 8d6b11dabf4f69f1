package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec

class RulesSpec extends SparkSuite {
  import spark.implicits._

  test("RangeJoinRewrite: BETWEEN join plans without nested loop and matches exact result") {
    val pts = (0 until 500).map(i => (i, (i * 37 % 1000).toDouble))
    val ivs = (0 until 40).map(i => (i, i * 31.0, i * 31.0 + 150.0))
    val pdf = pts.toDF("pid", "x")
    val idf = ivs.toDF("iid", "lo", "hi")
    val joined = pdf.join(idf, col("x") >= col("lo") && col("x") <= col("hi"))
      .select("pid", "iid")
    val plan = joined.queryExecution.executedPlan
    assert(plan.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      s"expected binned equi-join, got:\n$plan")
    val got = joined.collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val expected = (for {
      (pid, x) <- pts
      (iid, lo, hi) <- ivs
      if x >= lo && x <= hi
    } yield (pid, iid)).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("RangeJoinRewrite: adaptive width — skewed spans still plan binned and exact") {
    // No explicit binWidth conf: the rule must probe the interval side
    // and pick a width from the sampled spans. The distribution is
    // 500x skewed (many ~12-wide intervals, a few 6000-wide) — a width
    // mis-sized for either cluster previously degraded to
    // near-nested-loop work; the median keeps both classes binned.
    val hadConf = spark.conf.getOption("spark.graft.rangeJoin.binWidth")
    spark.conf.unset("spark.graft.rangeJoin.binWidth")
    try {
      val pts = (0 until 2000).map(i => (i, (i * 97 % 100000).toDouble))
      val ivs = (0 until 180).map(i => (i, i * 550.0, i * 550.0 + 12.0)) ++
        (180 until 200).map(i => (i, (i - 180) * 5000.0, (i - 180) * 5000.0 + 6000.0))
      val pdf = pts.toDF("pid", "x")
      val idf = ivs.toDF("iid", "lo", "hi")
      val joined = pdf.join(idf, col("x") >= col("lo") && col("x") <= col("hi"))
        .select("pid", "iid")
      val plan = joined.queryExecution.executedPlan
      assert(plan.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
        s"expected binned equi-join under adaptive width, got:\n$plan")
      val got = joined.collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      val expected = (for {
        (pid, x) <- pts
        (iid, lo, hi) <- ivs
        if x >= lo && x <= hi
      } yield (pid, iid)).toSet
      assert(got == expected && got.nonEmpty)
    } finally hadConf.foreach(v => spark.conf.set("spark.graft.rangeJoin.binWidth", v))
  }

  test("RangeJoinRewrite: leaves equi-keyed and non-range joins alone") {
    val a = Seq((1, 5.0), (2, 6.0)).toDF("k", "v")
    val b = Seq((1, 4.0, 8.0), (2, 7.0, 9.0)).toDF("k2", "lo", "hi")
    // equi key present -> untouched (plans as a hash join, results exact)
    val equi = a.join(b, col("k") === col("k2") &&
      col("v") >= col("lo") && col("v") <= col("hi"))
    assert(equi.collect().map(_.getInt(0)).toSeq == Seq(1))
    // one-sided inequality only -> no BETWEEN pattern, rule must not fire
    val half = a.join(b, col("v") >= col("lo")) // (5,4) (6,4) match; lo=7 filters both
    assert(half.count() == 2)
  }

  test("GraftSession.builder: preloaded engine config") {
    val b = graft.GraftSession.builder(cores = 2)
    // builder config is applied at getOrCreate; with a session already
    // running we just assert the settings it would apply resolve in the
    // active one built from the same extension class
    assert(spark.conf.get("spark.sql.extensions").contains("GraftExtensions"))
    assert(spark.sql("SELECT graft_dot_product(array(1.0d), array(2.0d)) v")
      .head.getDouble(0) == 2.0)
    assert(b != null)
  }

  test("GraftExtensions: F5/F6/F8 scoring kernels are SQL-callable") {
    // Each lifted function must agree with its Column-combinator twin.
    val r = spark.sql("""
      SELECT graft_haversine_score(10.0d, 20.0d, 10.0d, 20.0d) AS hv_same,
             graft_haversine_score(CAST(NULL AS DOUBLE), 20.0d, 10.0d, 20.0d) AS hv_null,
             graft_hops_score('123456', '123456') AS hp_eq,
             graft_hops_score('123456', '123499') AS hp_4,
             graft_hops_score('123456', '923456') AS hp_0,
             graft_hops_score('12345', '123456') AS hp_short,
             graft_blended_score(1.0d, 1.0d, 1.0d) AS bl_one,
             graft_blended_score(1.0d, 0.0d, 0.0d, 0.5d, 0.25d) AS bl_w
    """).head
    assert(r.getDouble(0) == 1.0) // zero distance
    assert(r.getDouble(1) == 0.5) // null coordinate -> neutral
    assert(r.getDouble(2) == 1.0)
    assert(math.abs(r.getDouble(3) - (1.0 - 2 * 2.0 / 10.0)) < 1e-12)
    assert(r.getDouble(4) == 0.0)
    assert(r.getDouble(5) == -1.0)
    assert(math.abs(r.getDouble(6) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(7) - 0.25) < 1e-12) // (1-.5-.25)*1
  }

  test("RangeJoinRewrite: fires through SQL text too") {
    spark.sql("SELECT 1 AS p, 5.0 AS x").createOrReplaceTempView("rj_pts")
    spark.sql("SELECT 10 AS iid, 1.0 AS lo, 6.0 AS hi").createOrReplaceTempView("rj_ivs")
    val df = spark.sql(
      "SELECT p, iid FROM rj_pts JOIN rj_ivs ON x BETWEEN lo AND hi")
    assert(df.collect().map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((1, 10)))
  }

  test("table functions: SQL surface == Scala API for the dedup/ANN families") {
    import graft.llm.{DedupOps, SimSearch, TextOps}
    def img(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet

    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val toks = docs.select(col("doc_id"),
      TextOps.ngramsAll(TextOps.tokenize(col("text")), 3).as("sh"))
    toks.createOrReplaceTempView("tf_docs")
    assert(img(spark.sql(
        "SELECT * FROM graft_minhash_pairs('tf_docs', 'doc_id', 'sh')")) ==
      img(DedupOps.lshCandidates(toks, "doc_id", "sh")))
    assert(img(spark.sql(
        "SELECT * FROM graft_simhash_pairs('tf_docs', 'doc_id', 'sh', 2)")) ==
      img(DedupOps.simhashNearDups(toks, "doc_id", "sh", hamMax = 2)))
    assert(img(spark.sql(
        "SELECT * FROM graft_prefix_jaccard_pairs('tf_docs', 'doc_id', 'sh', 1, 2)")) ==
      img(DedupOps.prefixJaccardPairs(toks, "doc_id", "sh", 1, 2)))

    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    emb.createOrReplaceTempView("tf_emb")
    emb.filter(col("vec_id") % 100 === 0).createOrReplaceTempView("tf_q")
    val q = spark.table("tf_q")
    assert(img(spark.sql(
        "SELECT * FROM graft_brute_topk('tf_emb', 'tf_q', 'vec_id', 'embedding', 5)")) ==
      img(SimSearch.bruteForceTopK(emb, q, "vec_id", "embedding", 5)))
    assert(img(spark.sql(
        "SELECT * FROM graft_sq8_topk('tf_emb', 'tf_q', 'vec_id', 'embedding', 5)")) ==
      img(SimSearch.sq8TopK(emb, q, "vec_id", "embedding", 5)))
    assert(img(spark.sql(
        "SELECT * FROM graft_ivfpq_topk('tf_emb', 'tf_q', 'vec_id', 'embedding', 5, 64)")) ==
      img(SimSearch.ivfPqTopK(emb, q, "vec_id", "embedding", 5, dim = 64)))

    docs.createOrReplaceTempView("tf_rawdocs")
    assert(img(spark.sql(
        "SELECT * FROM graft_winnowing_pairs('tf_rawdocs', 'doc_id', 'text', 4, 4, 50, 1)")) ==
      img(DedupOps.winnowingOverlap(docs, "doc_id", "text",
        n = 4, w = 4, maxDf = 50, minShared = 1)))
    val embL = spark.read.parquet(s"$sf/embeddings.parquet")
    embL.createOrReplaceTempView("tf_embl")
    assert(img(spark.sql(
        "SELECT * FROM graft_filtered_topk('tf_embl', 'tf_q', 'vec_id', 'embedding', 'label = 1', 5)")) ==
      img(SimSearch.filteredIvfTopK(embL, q, "vec_id", "embedding",
        col("label") === 1, 5)))
    val names = spark.read.parquet(s"$sf/part.parquet").select(col("p_name"))
    names.createOrReplaceTempView("tf_names")
    assert(img(spark.sql(
        "SELECT * FROM graft_fuzzy_pairs('tf_names', 'p_name', 'substring(p_name, 1, 1)', 0.86)")) ==
      img(graft.ops.EntityResolution.blockedFuzzyPairs(
        names, "p_name", substring(col("p_name"), 1, 1), 0.86)))
    assert(img(spark.sql(
        "SELECT * FROM graft_er_canonicalize('tf_names', 'p_name', 'substring(p_name, 1, 1)', 0.86)")) ==
      img {
        val e = names.select(col("p_name")).distinct()
        graft.ops.EntityResolution.canonicalize(e, "p_name",
          graft.ops.EntityResolution.blockedFuzzyPairs(
            e, "p_name", substring(col("p_name"), 1, 1), 0.86))
      })
    val probes = names.select(regexp_replace(col("p_name"), "[aeiou]", "").as("probe"))
    probes.createOrReplaceTempView("tf_probes")
    assert(img(spark.sql(
        "SELECT * FROM graft_fuzzy_lookup('tf_probes', 'probe', 'tf_names', 'p_name', 1, 0.7, 4)")) ==
      img(graft.ops.EntityResolution.fuzzyLookup(probes, "probe", names, "p_name",
        c => substring(c, 1, 1), 0.7, maxLenDiff = 4)))

    // round-11 additions: tiered retrieval, graph family, guarded pairs
    // (sparse-sim compares the integer projection only: the fast path's
    // plain float sums may differ in the last ulp across executions)
    def pairsImg(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b", "n_shared").collect().map(_.toString).toSet
    assert(pairsImg(spark.sql(
        "SELECT * FROM graft_sparse_sim('tf_rawdocs', 'doc_id', 'text')")) ==
      pairsImg(graft.llm.SparseSim.idfCosineJoin(docs, "doc_id", "text",
        3, 100, 0.5)))
    assert(img(spark.sql(
        "SELECT * FROM graft_bq_topk('tf_emb', 'tf_q', 'vec_id', 'embedding', 5)")) ==
      img(SimSearch.binaryHammingTopK(emb, q, "vec_id", "embedding", 5)))
    assert(img(spark.sql(
        "SELECT * FROM graft_matryoshka_topk('tf_emb', 'tf_q', 'vec_id', 'embedding', 5, 8)")) ==
      img(SimSearch.matryoshkaTopK(emb, q, "vec_id", "embedding", 5, 8)))
    val edges = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    edges.createOrReplaceTempView("tf_li")
    assert(img(spark.sql(
        "SELECT * FROM graft_group_pairs('tf_li', 'o', 'p')")) ==
      img(graft.ops.Cooccur.groupPairs(edges, "o", "p")))
    val pe = graft.ops.Cooccur.groupPairs(edges, "o", "p")
      .groupBy("pa", "pb").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 2).select("pa", "pb")
    pe.createOrReplaceTempView("tf_pe")
    assert(img(spark.sql("SELECT * FROM graft_kcore('tf_pe', 'pa', 'pb', 3, 2)")) ==
      img(graft.ops.KCore.kCore(pe, "pa", "pb", 3, 2)))
    val we = edges.groupBy(col("o").as("src")).agg(count(lit(1)).as("w"))
      .select(col("src"), (col("src") % 7).as("dst"), col("w"))
    we.createOrReplaceTempView("tf_we")
    spark.sql("SELECT 0 AS seed UNION ALL SELECT 1").createOrReplaceTempView("tf_seeds")
    assert(img(spark.sql(
        "SELECT * FROM graft_ppr('tf_we', 'src', 'dst', 'w', 'tf_seeds', 'seed', 3)")) ==
      img(graft.ops.PageRank.personalized(we, "src", "dst", "w",
        spark.table("tf_seeds"), "seed", 3)))

    // round-12 additions: overlap join, DP release, star CC, auto-ANN
    val ivA = spark.sql(
      "SELECT l_partkey AS k, l_orderkey * 10 + l_linenumber AS id_a, " +
      "datediff(l_shipdate, DATE '1992-01-01') AS lo_a, " +
      "datediff(l_shipdate, DATE '1992-01-01') + CAST(l_quantity AS INT) AS hi_a " +
      "FROM parquet.`" + sf + "/lineitem.parquet` WHERE l_orderkey % 7 = 0")
    val ivB = ivA.select(col("k"), col("id_a").as("id_b"),
      col("lo_a").as("lo_b"), col("hi_a").as("hi_b"))
    ivA.createOrReplaceTempView("tf_iva"); ivB.createOrReplaceTempView("tf_ivb")
    assert(img(spark.sql(
        "SELECT * FROM graft_interval_overlap('tf_iva', 'lo_a', 'hi_a', 'tf_ivb', 'lo_b', 'hi_b', 'k', 32.0)")) ==
      img(graft.ops.RangeJoin.intervalOverlap(ivA, "lo_a", "hi_a",
        ivB, "lo_b", "hi_b", Seq("k"), 32.0)))
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_mktsegment").as("seg"))
    cust.createOrReplaceTempView("tf_cust")
    assert(img(spark.sql(
        "SELECT * FROM graft_dp_counts('tf_cust', 'seg', 0.5, 7)")) ==
      img(graft.ops.Quality.dpGroupCounts(cust, Seq("seg"), 0.5, 7L)))
    assert(img(spark.sql(
        "SELECT * FROM graft_alternating_cc('tf_pe', 'pa', 'pb')")) ==
      img(graft.ops.ConnectedComponents.alternatingStar(pe, "pa", "pb")))
    assert(img(spark.sql(
        "SELECT * FROM graft_auto_topk('tf_emb', 'tf_q', 'vec_id', 'embedding', 5, 1.0)")) ==
      img(SimSearch.bruteForceTopK(emb, q, "vec_id", "embedding", 5)))
  }
}
