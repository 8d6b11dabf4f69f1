package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based tests (SURVEY.md §5.3) using ScalaCheck generators
  * driven from a fixed seed (no scalatestplus bridge in the dependency
  * set). Column expressions are evaluated through a one-row frame so the
  * tested path is the real Catalyst expression.
  */
class PropertiesSpec extends SparkSuite {
  import graft.engine.{functions => F}

  /** Deterministic sample stream from a Gen. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private def evalHops(a: String, b: String): Double =
    spark.range(1).select(F.hopsScore(lit(a), lit(b)).as("v")).head.getDouble(0)

  private val code6 = Gen.listOfN(6, Gen.numChar).map(_.mkString)

  test("hops: bounded in [-1,1], symmetric, identity=1") {
    samples(Gen.zip(code6, code6), 40).foreach { case (a, b) =>
      val v = evalHops(a, b)
      assert(v >= -1.0 && v <= 1.0)
      assert(v == evalHops(b, a))
      assert(evalHops(a, a) == 1.0)
    }
  }

  test("hops: longer shared prefix never scores lower") {
    samples(code6, 25).foreach { a =>
      val scores = (1 to 5).map { p =>
        val b = a.substring(0, p) + (if (a.charAt(p) == '9') '0' else '9') + a.substring(p + 1)
        evalHops(a, b)
      }
      assert(scores == scores.sorted, s"not monotone for $a: $scores")
    }
  }

  test("haversineScore bounded above by 1; 1 at zero distance") {
    val coord = Gen.zip(Gen.choose(-89.0, 89.0), Gen.choose(-179.0, 179.0))
    samples(Gen.zip(coord, coord), 40).foreach { case (p, q) =>
      val v = spark.range(1).select(
        F.haversineScore(lit(p._1), lit(p._2), lit(q._1), lit(q._2)).as("v"))
        .head.getDouble(0)
      assert(v <= 1.0 + 1e-12, s"$p $q -> $v")
    }
    samples(coord, 10).foreach { p =>
      val v = spark.range(1).select(
        F.haversineScore(lit(p._1), lit(p._2), lit(p._1), lit(p._2)).as("v"))
        .head.getDouble(0)
      assert(math.abs(v - 1.0) < 1e-9)
    }
  }

  test("minmax scale lands in [0,1] and keeps order") {
    import spark.implicits._
    samples(Gen.nonEmptyListOf(Gen.choose(-1e6, 1e6)), 15).foreach { xs =>
      val df = xs.toDF("x")
      val got = graft.ops.Scale.minmax(df, "x", "s")
        .select("x", "s").as[(Double, Double)].collect().sortBy(_._1)
      assert(got.forall { case (_, s) => s >= 0.0 && s <= 1.0 })
      assert(got.map(_._2).toSeq == got.map(_._2).sorted.toSeq)
    }
  }

  test("topK returns at most k rows per key, all among the true top") {
    import spark.implicits._
    val rowsGen = Gen.listOfN(50, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(0, 1000)))
    samples(rowsGen, 10).filter(_.nonEmpty).foreach { rows =>
      val df = rows.toDF("k", "v")
      val k = 3
      val got = graft.ops.TopK.exactPerKey(df, Seq("k"), Seq(col("v").desc), k)
        .select("k", "v").as[(String, Int)].collect().toSeq
      val byKey = got.groupBy(_._1)
      assert(byKey.values.forall(_.size <= k))
      byKey.foreach { case (key, kept) =>
        val all = rows.filter(_._1 == key).map(_._2).sorted.reverse
        val threshold = all.take(k).last
        assert(kept.map(_._2).min >= threshold)
      }
    }
  }

  test("as-of join preserves left cardinality and never matches later rows") {
    import spark.implicits._
    val gen = Gen.zip(Gen.choose(1, 4), Gen.choose(0L, 50L))
    samples(Gen.listOfN(30, gen), 5).foreach { rows =>
      val left = rows.zipWithIndex.map { case ((k, t), i) => (k, t, s"l$i") }
        .toDF("k", "t", "lname")
      val right = rows.zipWithIndex.map { case ((k, t), i) => (k, t + 1, s"r$i", t + 1) }
        .toDF("k", "rt", "tag", "rtime")
      val out = graft.ops.AsOfJoin.backward(left, right, Seq("k"), "t", "rt",
        Seq("tag", "rtime")).collect()
      assert(out.length == rows.length) // exactly one output row per left row
      out.foreach { r =>
        if (!r.isNullAt(r.fieldIndex("rtime")))
          assert(r.getAs[Long]("rtime") <= r.getAs[Long]("t")) // never a later match
      }
    }
  }

  test("weighted sample: subset of input, exact size, dedup-free") {
    import spark.implicits._
    samples(Gen.choose(50, 200), 3).foreach { n =>
      val df = (0 until n).map(i => (i.toLong, (i % 7 + 1).toDouble)).toDF("id", "w")
      val s = graft.ops.Sampling.weightedSample(df, "id", col("w"), 25)
        .select("id").as[Long].collect()
      assert(s.length == 25 && s.distinct.length == 25)
      assert(s.forall(i => i >= 0 && i < n))
    }
  }

  test("jaccard in [0,1]; 1 for identical non-empty sets") {
    import spark.implicits._
    val toks = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e")).map(_.distinct)
    samples(Gen.zip(toks, toks), 20).foreach { case (x, y) =>
      val v = Seq((x, y)).toDF("x", "y")
        .select(graft.llm.DedupOps.jaccard(col("x"), col("y"))).head.getDouble(0)
      assert(v >= 0.0 && v <= 1.0)
      val ident = Seq((x, x)).toDF("x", "y")
        .select(graft.llm.DedupOps.jaccard(col("x"), col("y"))).head.getDouble(0)
      assert(ident == 1.0)
    }
  }

  test("winnowing guarantee: any shared n+w-1 run is detected, for random docs") {
    import spark.implicits._
    val (n, w) = (3, 3)
    val word = Gen.choose(0, 5000).map(i => s"w$i")
    val doc = Gen.choose(20, 60).flatMap(len => Gen.listOfN(len, word))
    val run = Gen.listOfN(n + w - 1, word)                   // the planted span
    samples(Gen.zip(doc, doc, run), 12).foreach { case (d1, d2, span) =>
      val df = Seq(
        (1L, (d1 ++ span ++ d1.reverse).mkString(" ")),
        (2L, (d2 ++ span ++ d2.reverse).mkString(" "))).toDF("doc_id", "text")
      val pairs = graft.llm.DedupOps.winnowingOverlap(df, "doc_id", "text",
          n = n, w = w, maxDf = 100, minShared = 1)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(pairs.contains((1L, 2L)),
        s"planted ${span.mkString(" ")} not detected between random docs")
    }
  }

  test("leakage-safe split: cluster atomicity for random edge graphs") {
    import spark.implicits._
    val edgeGen = Gen.listOfN(30,
      Gen.zip(Gen.choose(0L, 80L), Gen.choose(0L, 80L)).suchThat(p => p._1 != p._2))
    samples(Gen.zip(edgeGen, Gen.choose(0.05, 0.9)), 8).foreach { case (es, frac) =>
      val docs = (0L until 100L).toDF("id")
      val edges = es.toDF("a", "b")
      val s = graft.ops.Sampling.leakageSafeSplit(docs, "id", edges, "a", "b", frac)
      val viol = edges
        .join(s.select(col("id").as("a"), col("root").as("ra"), col("split").as("sa")), "a")
        .join(s.select(col("id").as("b"), col("root").as("rb"), col("split").as("sb")), "b")
        .filter(col("ra") =!= col("rb") || col("sa") =!= col("sb"))
      assert(viol.count() == 0, s"edge straddles split at frac $frac: ${es.take(5)}")
      // every doc decided exactly once, roots are component minima
      assert(s.count() == 100 && s.select("id").distinct().count() == 100)
      assert(s.filter(col("root") > col("id")).count() == 0,
        "a root exceeds its member id (not the component min)")
    }
  }

  test("jaroWinkler: bounded in [0,1], symmetric, identity=1, empty=0") {
    import graft.engine.expressions.JaroWinkler
    JaroWinkler.register(spark)
    def jw(a: String, b: String): Double =
      spark.range(1).select(JaroWinkler.jaroWinkler(lit(a), lit(b)).as("v"))
        .head.getDouble(0)
    val word = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar))
      .map(_.mkString)
    samples(Gen.zip(word, word), 60).foreach { case (a, b) =>
      val v = jw(a, b)
      assert(v >= 0.0 && v <= 1.0, s"jw($a,$b)=$v out of range")
      assert(v == jw(b, a), s"asymmetric on ($a,$b)")
      assert(jw(a, a) == 1.0)
      assert(jw(a, "") == 0.0 && jw("", b) == 0.0)
    }
  }

  test("Scd2: after any update sequence, one current row per key and seamless intervals") {
    import org.apache.spark.sql.Row
    import graft.ops.Scd2
    val keys = (1L to 30L)
    val segGen = Gen.oneOf("a", "b", "c")
    // random batch: a random subset of keys with random segment values
    def batch(seed: Long) = {
      val rows = keys.flatMap { k =>
        samples(Gen.zip(Gen.choose(0, 2), segGen), 1).headOption
          .filter { case (keep, _) => (k + seed) % 3 != keep }
          .map { case (_, s) => (k, s + ((k + seed) % 2)) }
      }
      spark.createDataFrame(rows).toDF("k", "seg")
    }
    var h = Scd2.init(batch(0), 0L)
    (1L to 4L).foreach(v => h = Scd2(h, batch(v), "k", Seq("seg"), v))
    val hist = h.cache()
    // exactly one current row per key ever seen
    val cur = hist.filter(col("is_current"))
    assert(cur.count() == cur.select("k").distinct().count())
    assert(hist.select("k").distinct().count() == cur.count())
    // versions of one key never overlap: each closed row's valid_to is
    // the next row's valid_from, the last row is open
    val rows = hist.orderBy("k", "valid_from").collect()
      .groupBy(_.getLong(0)).values
    rows.foreach { versions =>
      val vs = versions.sortBy(_.getLong(2)) // valid_from at index 2
      vs.sliding(2).foreach {
        case Array(prev, next) =>
          assert(!prev.isNullAt(3) && prev.getLong(3) == next.getLong(2),
            s"gap/overlap: $prev -> $next")
        case _ => ()
      }
      assert(vs.last.isNullAt(3) && vs.last.getBoolean(4))
      assert(vs.init.forall(r => !r.getBoolean(4)))
    }
    hist.unpersist()
  }

  test("Allocate.largestRemainder: random weights — exact budget sum, within-one quotas") {
    import spark.implicits._
    val gen = for {
      k <- Gen.choose(1, 12)
      ws <- Gen.listOfN(k, Gen.choose(0L, 5000L))
      budget <- Gen.choose(1L, 100000L)
    } yield (ws, budget)
    samples(gen, 25).foreach { case (ws, budget) =>
      if (ws.sum > 0) {
        val df = ws.zipWithIndex.map { case (w, i) => (s"k$i", w) }.toDF("k", "w")
        val out = graft.ops.Allocate.largestRemainder(df, "k", "w", budget)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        assert(out.map(_._3).sum == budget, s"ws=$ws budget=$budget")
        val tw = ws.sum.toDouble
        out.foreach { case (k, w, a) =>
          val quota = budget * w / tw
          assert(a >= math.floor(quota) - 1e-9 && a <= math.ceil(quota) + 1e-9,
            s"$k: alloc $a outside [floor, ceil] of quota $quota (ws=$ws budget=$budget)")
        }
      }
    }
  }

  test("KCore: random graphs — converged output is the true k-core (all-degrees >= k, maximal)") {
    import spark.implicits._
    val edgeGen = for {
      n <- Gen.choose(6, 16)
      m <- Gen.choose(5, 30)
      es <- Gen.listOfN(m, Gen.zip(Gen.choose(0, n - 1), Gen.choose(0, n - 1)))
    } yield es.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b).toLong, math.max(a, b).toLong) }.distinct
    samples(edgeGen, 10).filter(_.nonEmpty).foreach { es =>
      val df = es.toDF("a", "b")
      val k = 2
      val core = graft.ops.KCore.kCore(df, "a", "b", k, rounds = 20)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      // reference fixpoint computed driver-side
      var alive = es.toSet
      var changed = true
      while (changed) {
        val deg = alive.toSeq.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).map { case (n2, xs) => n2 -> xs.size }
        val keep = deg.filter(_._2 >= k).keySet
        val next = alive.filter(e => keep(e._1) && keep(e._2))
        changed = next != alive
        alive = next
      }
      val refDeg = alive.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (n2, xs) => n2 -> xs.size }
        .filter(_._2 >= k)
      assert(core == refDeg, s"edges=$es core=$core ref=$refDeg")
    }
  }
}
