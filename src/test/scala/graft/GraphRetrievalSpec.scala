package graft

import org.apache.spark.sql.functions._
import graft.ops.{BloomPrune, PageRank, Quality}
import graft.llm.{Bm25, DedupOps, TextOps}

class GraphRetrievalSpec extends SparkSuite {
  import spark.implicits._

  test("PageRank: two-node cycle converges to uniform; sink keeps teleport mass") {
    val cycle = Seq((1L, 2L, 1L), (2L, 1L, 1L)).toDF("s", "d", "w")
    val r = PageRank.run(cycle, "s", "d", "w", iters = 10)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r(1L) - 0.5) < 1e-9 && math.abs(r(2L) - 0.5) < 1e-9)

    // 1 -> 2, 2 -> 2 (self loop): node 1 only ever holds the teleport share.
    val chain = Seq((1L, 2L, 1L), (2L, 2L, 1L)).toDF("s", "d", "w")
    val r2 = PageRank.run(chain, "s", "d", "w", iters = 20)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r2(1L) - 0.075) < 1e-9) // (1-0.85)/2
    assert(r2(2L) > 0.9)
  }

  test("PageRank: ranks sum to ~1 when no dangling mass leaks") {
    val edges = Seq((1L, 2L, 3L), (2L, 3L, 1L), (3L, 1L, 2L), (1L, 3L, 1L))
      .toDF("s", "d", "w")
    val total = PageRank.run(edges, "s", "d", "w", iters = 8)
      .agg(sum("rank")).head.getDouble(0)
    assert(math.abs(total - 1.0) < 1e-6)
  }

  test("personalized PageRank: all-seeds degenerates to classic; mass stays near seeds") {
    val edges = Seq((1L, 2L, 3L), (2L, 3L, 1L), (3L, 1L, 2L), (1L, 3L, 1L))
      .toDF("s", "d", "w")
    // seeds = every node ⇒ identical teleport + start ⇒ identical ranks
    val all = Seq(1L, 2L, 3L).toDF("seed")
    def img(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(img(PageRank.personalized(edges, "s", "d", "w", all, "seed", iters = 6))
      == img(PageRank.run(edges, "s", "d", "w", iters = 6)))
    // single-seed chain 1→2→3 (3 sinks to itself): rank decays with
    // distance from the seed; the seed holds at least the teleport share
    val chain = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 3L, 1L)).toDF("s", "d", "w")
    val ppr = img(PageRank.personalized(chain, "s", "d", "w",
      Seq(1L).toDF("seed"), "seed", iters = 20))
    assert(ppr(1L) >= 0.15 - 1e-9) // (1 - 0.85) / |S|
    // one damping step off the seed: rank(2) = d·rank(1) < rank(1);
    // the self-looping sink accumulates past both
    assert(ppr(1L) > ppr(2L), s"no decay off the seed: $ppr")
    assert(ppr(3L) > ppr(2L), s"sink did not accumulate: $ppr")
    // non-seed with no path from the seed gets exactly zero
    val split = Seq((1L, 2L, 1L), (3L, 4L, 1L)).toDF("s", "d", "w")
    val ppr2 = img(PageRank.personalized(split, "s", "d", "w",
      Seq(1L).toDF("seed"), "seed", iters = 8))
    assert(ppr2(3L) == 0.0 && ppr2(4L) == 0.0 && ppr2(1L) > 0 && ppr2(2L) > 0)
  }

  test("PageRank: deep runs stay bounded (periodic lineage truncation)") {
    // 40 iterations crosses two checkpoint windows; without periodic
    // truncation the final plan nests 40 joins and the action's
    // analysis + plan stringification dominate (or OOM). Result must
    // match the recurrence regardless of where the cuts land.
    val cycle = Seq((1L, 2L, 1L), (2L, 1L, 1L)).toDF("s", "d", "w")
    val r = PageRank.run(cycle, "s", "d", "w", iters = 40)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r(1L) - 0.5) < 1e-9 && math.abs(r(2L) - 0.5) < 1e-9)
  }

  test("label propagation: long-diameter graph crosses checkpoint rounds") {
    // A 14-edge path needs ~7 min-label rounds to converge — enough to
    // cross the every-5-rounds truncation in the distributed loop
    // (driverThreshold=0 forces it; starSwitchAfter above the round
    // count pins the PURE propagation path — the default would hand
    // off to alternatingStar at round 6). All nodes land on component 1.
    val path = (1L to 14L).map(i => (i, i + 1)).toDF("s", "d")
    val comps = graft.ops.ConnectedComponents
      .labelPropagation(path, "s", "d", maxIter = 30, driverThreshold = 0L,
        starSwitchAfter = 30)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(comps.size == 15 && comps.values.forall(_ == 1L))
  }

  test("Bm25: higher tf scores higher at equal length; rarer term outweighs common") {
    val docs = Seq(
      (1L, "cat cat cat dog"),
      (2L, "cat dog dog dog"),
      (3L, "dog dog dog dog"),
      (4L, "cat dog pig owl")).toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.tokenize(col("text")).as("toks"))
    val s = Bm25.score(docs, "doc_id", "toks", Seq("cat"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(1L) > s(2L) && s(2L) > s(3L))
    assert(s(3L) == 0.0)
    // 'pig' (df=1) must contribute more than 'cat' (df=3) at equal tf/dl.
    val two = Bm25.score(docs, "doc_id", "toks", Seq("pig"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(two(4L) > s(4L))
  }

  test("Bm25.topK: rank is contiguous and ordered by rounded score then id") {
    val docs = Seq.tabulate(20)(i => (i.toLong, if (i % 3 == 0) "hit miss" else "miss miss"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.tokenize(col("text")).as("toks"))
    val got = Bm25.topK(docs, "doc_id", "toks", Seq("hit"), 5).collect()
    assert(got.map(_.getInt(3)).toSeq == (1 to 5))
    assert(got.forall(r => r.getLong(0) % 3 == 0)) // ties broken by id: hits first
  }

  test("BloomPrune.prunedInnerJoin equals the plain join; filter actually prunes") {
    val big = spark.range(0, 10000).toDF("k")
    val small = spark.range(0, 10000).filter(col("id") % 100 === 0).toDF("sk")
    val got = BloomPrune.prunedInnerJoin(big, "k", small, "sk")
      .select("k").as[Long].collect().sorted
    assert(got.toSeq == (0L until 10000L by 100).toSeq)

    // The bloom filter alone (before the verify join) must cut the big
    // side dramatically — allow fpp slack but require real pruning.
    BloomPrune.register(spark)
    val n = small.count()
    val bits = BloomPrune.optimalNumBits(n, 0.01)
    val bf = small.select(call_function("graft_bloom_agg", col("sk"), lit(n), lit(bits)))
      .head().getAs[Array[Byte]](0)
    val kept = big.filter(call_function("graft_bloom_might_contain", lit(bf), col("k"))).count()
    assert(kept >= 100 && kept < 400, s"bloom kept $kept of 10000")
  }

  test("Quality: rowChecks counts match observed() metrics riding the same action") {
    val df = Seq((1, 10.0), (2, -5.0), (3, 200.0), (4, 30.0)).toDF("id", "v")
    val checks = Seq(
      Quality.Check("negative", col("v") < 0),
      Quality.Check("too_big", col("v") > 100))
    val viaAgg = Quality.rowChecks(df, checks)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaAgg == Map("negative" -> 1L, "too_big" -> 1L))
    val (observedDf, obs) = Quality.observed(df, checks)
    assert(observedDf.count() == 4) // the "real" action the metrics ride
    val m = obs.get
    assert(m("negative") == 1L && m("too_big") == 1L && m("n_rows") == 4L)
  }

  test("Quality.fkViolations counts orphans via anti join") {
    val child = Seq((1L, 10L), (2L, 99L), (3L, 10L), (4L, -1L)).toDF("id", "fk")
    val parent = Seq(10L, 20L).toDF("pk")
    val got = Quality.fkViolations(child, "fk", parent, "pk", "orphans").head
    assert(got.getString(0) == "orphans" && got.getLong(1) == 2L) // 99 and -1
  }

  test("DedupOps.simhash width switch: 60-bit banding keeps exact-dup recall") {
    val docs = Seq(
      (1L, Seq("a", "b", "c", "d", "e", "f")),
      (2L, Seq("f", "e", "d", "c", "b", "a")),
      (3L, Seq("q", "r", "s", "t", "u", "v"))).toDF("id", "toks")
    val pairs = DedupOps.simhashNearDups(docs, "id", "toks",
        hamMax = 3, nBits = 60, nBlocks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.contains((1L, 2L, 0)))
    // 60-bit signatures separate the disjoint doc far beyond hamming 3
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))
    // signature stays within BIGINT (bit 63 never set)
    val sh = docs.select(DedupOps.simhash(col("toks"), 60)).collect().map(_.getLong(0))
    assert(sh.forall(v => v >= 0 && v < (1L << 60)))
  }

  test("DedupOps.simhashNearDups: permuted tokens collide, disjoint docs don't") {
    val docs = Seq(
      (1L, Seq("a", "b", "c", "d", "e", "f")),
      (2L, Seq("f", "e", "d", "c", "b", "a")), // same multiset -> same simhash
      (3L, Seq("q", "r", "s", "t", "u", "v"))).toDF("id", "toks")
    val pairs = DedupOps.simhashNearDups(docs, "id", "toks")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.contains((1L, 2L, 0)))
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))
  }
}
