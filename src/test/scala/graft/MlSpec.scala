package graft

import org.apache.spark.sql.functions._
import graft.feature.FeaturePipeline
import graft.rec.AlsPipeline

class MlSpec extends SparkSuite {
  import spark.implicits._

  test("ALS recovers planted low-rank preference structure") {
    // Two user blocks × two item blocks: block users strongly prefer
    // block items (rating 5 vs 0.1 noise).
    val rows = for {
      u <- 0 until 40; i <- 0 until 20
      r = if ((u < 20) == (i < 10)) 5.0 else 0.1
    } yield (u, i, r.toFloat)
    val triples = rows.toDF("userId", "itemId", "rating")
    val model = AlsPipeline.train(triples,
      AlsPipeline.Config(rank = 4, maxIter = 10, regParam = 0.05, implicitPrefs = false))
    val recs = AlsPipeline.recommendations(model, 3)
      .select("userId", "itemId").as[(Int, Int)].collect()
    val inBlock = recs.count { case (u, i) => (u < 20) == (i < 10) }
    assert(inBlock.toDouble / recs.length > 0.9, s"in-block ratio ${inBlock.toDouble / recs.length}")
  }

  test("recommendationsDirect matches recommendForAllUsers scores") {
    val rows = for {
      u <- 0 until 40; i <- 0 until 20
      r = if ((u < 20) == (i < 10)) 5.0 else 0.1
    } yield (u, i, r.toFloat)
    val model = AlsPipeline.train(rows.toDF("userId", "itemId", "rating"),
      AlsPipeline.Config(rank = 4, maxIter = 10, regParam = 0.05, implicitPrefs = false))
    val viaMllib = AlsPipeline.recommendations(model, 3)
      .select("userId", "score").as[(Int, Float)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val direct = AlsPipeline.recommendationsDirect(model, 3)
      .select("userId", "score").as[(Int, Float)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(viaMllib.keySet == direct.keySet)
    viaMllib.foreach { case (u, scores) =>
      scores.zip(direct(u)).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1e-4f * math.max(1f, math.abs(a)),
          s"user $u: mllib $a vs direct $b")
      }
    }
  }

  test("ALS RMSE on planted structure is small") {
    val rows = for {
      u <- 0 until 40; i <- 0 until 20
      r = if ((u < 20) == (i < 10)) 4.0 else 1.0
    } yield (u, i, r.toFloat)
    val rmse = AlsPipeline.evalRmse(rows.toDF("userId", "itemId", "rating"),
      AlsPipeline.Config(rank = 4, maxIter = 10, regParam = 0.05, implicitPrefs = false))
    assert(rmse < 1.0, s"rmse $rmse")
  }

  test("percentRankRating bounds and epsilon") {
    val usage = Seq((1, 1, 10.0), (1, 1, 20.0), (1, 1, 30.0), (2, 2, 5.0))
      .toDF("u", "i", "x")
    val got = AlsPipeline.percentRankRating(usage, "u", "i", "x")
      .select("rating").as[Double].collect()
    assert(got.forall(r => r >= 1e-6 && r <= 1.0 + 1e-6))
    assert(got.count(_ == 1e-6) == 2) // first of each group
  }

  test("indexedTriples: contiguous int ids, one per entity") {
    val rated = Seq(("ca", "px", 1.0), ("cb", "px", 2.0), ("cc", "py", 3.0))
      .toDF("cust", "item", "rating")
    val t = AlsPipeline.indexedTriples(rated, "cust", "item")
    val users = t.select("userId").as[Int].collect().toSet
    val items = t.select("itemId").as[Int].collect().toSet
    assert(users == Set(0, 1, 2) && items == Set(0, 1))
  }

  test("FeaturePipeline: imputation fills nulls, scaled features in [0,1] pre-weight") {
    val df = Seq(
      (1L, Some(10.0), 1.0, "A"), (2L, None, 2.0, "B"),
      (3L, Some(30.0), 3.0, "A"), (4L, Some(20.0), 4.0, "C"))
      .toDF("id", "bal", "age", "seg")
      .withColumn("bal", col("bal").cast("double"))
    val out = FeaturePipeline.build(df, Seq("bal", "age"), "seg",
      Map("bal" -> 1.0, "age" -> 1.0), wCat = 1.0)
    val feats = out.select("features_arr").as[Seq[Double]].collect()
    assert(feats.forall(_.forall(v => v >= 0.0 && v <= 1.0)))
    // 2 numeric + 4 OHE slots (3 categories + keep-invalid slot)
    assert(feats.head.length == 2 + 4)
    // imputed row present (no NaN/null)
    assert(feats.forall(_.forall(v => !v.isNaN)))
  }

  test("FeaturePipeline: exactMedian pre-fill agrees with ml.Imputer's approx median") {
    // ml.Imputer's approxQuantile always returns an ELEMENT of the data;
    // `percentile` interpolates between the middle two at even counts.
    // The paths therefore coincide exactly when the non-null count is odd
    // (element == interpolation) — pinned here. The q41/q44 oracles do
    // not depend on this parity: they run the exact path on BOTH engines
    // (`percentile` ≡ DuckDB `median`); M1 (ml.Imputer) remains the
    // documented sketch-based path for scales where an exact sort-based
    // percentile would be a hotspot.
    val df = Seq(
      (1L, Some(10.0), 1.0, "A"), (2L, None, 2.0, "B"),
      (3L, Some(30.0), 3.0, "A"), (4L, Some(20.0), 4.0, "C"),
      (5L, Some(25.0), 5.0, "B"), (6L, Some(15.0), 6.0, "C"))
      .toDF("id", "bal", "age", "seg")
      .withColumn("bal", col("bal").cast("double"))
    def feats(exact: Boolean): Map[Long, Seq[Double]] =
      FeaturePipeline.build(df, Seq("bal", "age"), "seg",
        Map("bal" -> 0.8, "age" -> 0.2), wCat = 0.05, exactMedian = exact)
        .select(col("id"), col("features_arr")).as[(Long, Seq[Double])]
        .collect().toMap
    assert(feats(exact = true) == feats(exact = false))
  }

  test("FeaturePipeline.evenSplits covers [0, max+1] with infinities") {
    val df = Seq(1.0, 5.0, 9.0).toDF("x")
    val splits = FeaturePipeline.evenSplits(df, "x", 4)
    assert(splits.length == 5)
    assert(splits.head == Double.NegativeInfinity && splits.last == Double.PositiveInfinity)
  }

  test("HashEncoder.hashFeatures: bounded buckets, partitioning-independent, same value same bucket") {
    import graft.feature.HashEncoder
    val df = (1 to 100).map(i => (i.toLong, s"seg${i % 5}", i % 7)).toDF("id", "seg", "nat")
    val a = HashEncoder.hashFeatures(df.repartition(7), "id", Seq("seg", "nat"), 16)
    val b = HashEncoder.hashFeatures(df.repartition(2), "id", Seq("seg", "nat"), 16)
    val rows = a.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(rows == b.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet)
    assert(rows.forall { case (_, bkt, w) => bkt >= 0 && bkt < 16 && math.abs(w) <= 2 })
    // identical feature values always share a bucket: ids 1 and 6 have seg1
    val bySeg = a.join(df, "id").filter(col("seg") === "seg1")
    assert(bySeg.count() > 0)
  }

  test("HashEncoder.looTargetEncode: excludes own row, singleton group -> null") {
    import graft.feature.HashEncoder
    val df = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0), (4L, "b", 99.0))
      .toDF("id", "cat", "y")
    val m = HashEncoder.looTargetEncode(df, "id", "cat", "y")
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(m(1L).contains(25.0)) // mean(20, 30)
    assert(m(2L).contains(20.0)) // mean(10, 30)
    assert(m(3L).contains(15.0)) // mean(10, 20)
    assert(m(4L).isEmpty)        // alone in its group
  }

  test("Sampling.temperatureResample: alpha=1 no-op, alpha<1 boosts the rare stratum") {
    val df = ((1 to 900).map(i => (i.toLong, "big")) ++ (901 to 1000).map(i => (i.toLong, "small")))
      .toDF("id", "s")
    val all = graft.ops.Sampling.temperatureResample(df, "id", "s", alpha = 1.0)
    assert(all.count() == 1000) // every rate rounds to 1.0
    val t = graft.ops.Sampling.temperatureResample(df, "id", "s", alpha = 0.5)
    val rates = t.select(col("s"), col("rate")).distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates("small") == 1.0) // rarest stratum keeps everything
    assert(math.abs(rates("big") - 1.0 / 3.0) < 1e-9) // sqrt(1/9) boost ratio
    // deterministic under re-partitioning
    val t2 = graft.ops.Sampling.temperatureResample(df.repartition(13), "id", "s", 0.5)
    assert(t.select("id").collect().map(_.getLong(0)).toSet ==
      t2.select("id").collect().map(_.getLong(0)).toSet)
  }
}
