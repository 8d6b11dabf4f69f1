package graft

import org.apache.spark.sql.functions._
import graft.llm.{SetSimJoin, TextOps}
import graft.ops.ZOrder

/** Invariants for the engine-infrastructure family (q139-q143). */
class EngineQueriesSpec extends SparkSuite {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("prefix-filter join returns EXACTLY the brute-force pair set") {
    val sets = spark.read.parquet(s"$sf/documents.parquet").select(col("doc_id"),
      TextOps.ngramsAll(TextOps.tokenize(col("text")), 3).as("s"))
    val fast = SetSimJoin.prefixFilterJoin(sets, "doc_id", "s", 0.5)

    val d = sets.select(col("doc_id"), array_distinct(col("s")).as("s"))
      .filter(size(col("s")) > 0)
    val a = d.select(col("doc_id").as("a_doc"), col("s").as("sa"))
    val b = d.select(col("doc_id").as("b_doc"), col("s").as("sb"))
    val brute = a.crossJoin(b).filter(col("a_doc") < col("b_doc"))
      .select(col("a_doc"), col("b_doc"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb")))).as("jaccard"))
      .filter(col("jaccard") >= 0.5)

    assert(fast.exceptAll(brute).count() == 0)
    assert(brute.exceptAll(fast).count() == 0)
    assert(fast.count() > 0, "expected planted near-dup pairs at sf0.001")
  }

  test("prefix-filter join plans no cartesian / nested-loop join") {
    val plan = q("q139_prefix_sim_join").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
  }

  test("zValue interleaves bits exactly (deinterleave round-trips)") {
    val bits = 10
    val df = spark.range(0, 2000, 7)
      .select((col("id") % 1024).as("x"), ((col("id") * 31 + 5) % 1024).as("y"))
      .withColumn("z", ZOrder.zValue(col("x"), col("y"), bits))
    // rebuild x and y from alternating z bits
    val xBack = (0 until bits).map(i =>
      shiftleft(shiftright(col("z"), 2 * i).bitwiseAND(lit(1L)), i)).reduce(_ + _)
    val yBack = (0 until bits).map(i =>
      shiftleft(shiftright(col("z"), 2 * i + 1).bitwiseAND(lit(1L)), i)).reduce(_ + _)
    assert(df.filter(xBack =!= col("x") || yBack =!= col("y")).count() == 0)
    // SQL twin produces the identical value
    val viaSql = df.withColumn("z2", expr(
      ZOrder.zValueSql("x", "y", bits).replace("&", "&"))) // same ANSI ops in Spark SQL
    assert(viaSql.filter(col("z") =!= col("z2")).count() == 0)
  }

  test("zorder buckets bound BOTH dimensions tighter than linear bounds the other") {
    val out = q("q141_zorder_layout").collect().map(r =>
      r.getAs[String]("layout") -> (r.getAs[Double]("avg_x_span"), r.getAs[Double]("avg_y_span"))).toMap
    val (zx, zy) = out("zorder")
    val (_, ly) = out("linear")
    // linear layout leaves the non-sorted dimension unbounded; z-order
    // must bound it strictly tighter while keeping x bounded too
    assert(zy < ly, s"zorder y-span $zy should beat linear y-span $ly")
    assert(zx < 1024 && zy < 1024)
  }

  test("q140 skew profile internal consistency") {
    val rows = q("q140_skew_profile").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("max_rows") <= r.getAs[Long]("n_rows"))
      assert(r.getAs[Double]("skew_ratio") >= 1.0 - 1e-9)
      val share = r.getAs[Double]("top_share")
      assert(share > 0 && share <= 1)
    }
  }

  test("q142 dictionary encoding compresses the word-salad corpus") {
    val rows = q("q142_dict_encode").collect()
    assert(rows.nonEmpty)
    // tiny vocabulary -> 1-2 digit codes must beat multi-char words
    rows.foreach(r => assert(r.getAs[Double]("ratio") < 1.0))
  }

  test("q143 interleave schedule is fair across sources in every prefix") {
    val rows = q("q143_interleave_mix").orderBy("pos").collect()
    assert(rows.length == 100)
    // positions are 1..100 and rnk is non-decreasing along the schedule
    assert(rows.map(_.getAs[Long]("pos")).toSeq == (1L to 100L))
    val rnks = rows.map(_.getAs[Long]("rnk"))
    assert(rnks.zip(rnks.tail).forall { case (p, n) => p <= n })
    // within one rank tier, each source appears at most once
    val bySrc = rows.groupBy(_.getAs[Long]("rnk"))
    bySrc.values.foreach { tier =>
      val srcs = tier.map(_.getAs[String]("source"))
      assert(srcs.distinct.length == srcs.length)
    }
  }

  test("q153 MRR: ranks positive, rr = 1/rank, perfect queries rank 1") {
    val rows = q("q153_mrr").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rank, rr) = (r.getAs[Int]("ann_rank"), r.getAs[Double]("rr"))
      assert(rank >= 1 && rr > 0 && rr <= 1.0)
      assert(math.abs(rr - BigDecimal(1.0 / rank)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  test("q154 boolean retrieval equals the direct-scan Spark twin") {
    // the registered path answers via posting intersection; this twin
    // answers by scanning text directly — third algorithm, same result
    val viaIndex = q("q154_boolean_retrieval").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val tf = docs.select(col("doc_id"), explode(TextOps.tokenize(col("text"))).as("t"))
      .groupBy("t", "doc_id").count()
    val top2 = tf.groupBy("t").agg(countDistinct("doc_id").as("df"))
      .orderBy(col("df").desc, col("t")).limit(2).collect().map(_.getString(0))
    val scan = docs.select(col("doc_id"), TextOps.tokenize(col("text")).as("ts"))
      .filter(array_contains(col("ts"), top2(0)) && array_contains(col("ts"), top2(1)))
      .select(col("doc_id"),
        size(filter(col("ts"), x => x === top2(0))).as("tf_1"),
        size(filter(col("ts"), x => x === top2(1))).as("tf_2"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(viaIndex === scan)
  }

  test("q156 hard negatives are disjoint from the exact top-10") {
    import graft.llm.SimSearch
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val qs = emb.filter(col("vec_id") % 50 === 0)
    val exa = SimSearch.bruteForceTopK(emb, qs, "vec_id", "embedding", 10)
      .select("query_id", "vec_id")
    val neg = q("q156_hard_negatives").select("query_id", "vec_id")
    assert(neg.join(exa, Seq("query_id", "vec_id")).count() == 0)
    // exactly 5 per query, ranked 1..5
    val perQ = q("q156_hard_negatives").groupBy("query_id")
      .agg(count(lit(1)).as("n"), min("rnk").as("lo"), max("rnk").as("hi"))
      .filter(col("n") =!= 5 || col("lo") =!= 1 || col("hi") =!= 5)
    assert(perQ.count() == 0)
  }

  test("q157 co-occurrence counts are symmetric and top-5 per part") {
    val out = q("q157_item_cooccurrence").cache()
    try {
      // n_co symmetric: the pair (a,b) count equals (b,a) wherever both
      // directions survive the per-part top-5 cut
      val f = out.select(col("part_key").as("a"), col("rec_part").as("b"), col("n_co"))
      val r = out.select(col("rec_part").as("a"), col("part_key").as("b"),
        col("n_co").as("n2"))
      assert(f.join(r, Seq("a", "b")).filter(col("n_co") =!= col("n2")).count() == 0)
      assert(out.groupBy("part_key").count().filter(col("count") > 5).count() == 0)
    } finally out.unpersist()
  }

  test("q158 content hash is invariant under repartitioning") {
    val base = q("q158_dataset_manifest")
      .select("source", "content_hash").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // same aggregation over a deliberately reshuffled input
    import graft.engine.expressions.KmvDistinct.hash60
    val rehashed = spark.read.parquet(s"$sf/documents.parquet")
      .repartition(13).select(col("source"), hash60(col("text")).as("h"))
      .groupBy("source").agg(expr("bit_xor(h)").as("ch"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rehashed === base)
  }
}
