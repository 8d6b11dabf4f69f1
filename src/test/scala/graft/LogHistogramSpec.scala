package graft

import org.apache.spark.sql.functions._

import graft.ops.LogHistogram

/** The log-bucket histogram's contracts: strict bucket monotonicity
  * and the one-sided relative-error envelope lowerBound(bucket(v)) ≤ v
  * < lowerBound·(1+2^−m) across the WHOLE 62-bit domain (the test-SF
  * queries only reach ~2^9 — this spec is where the unbounded-domain
  * claim is actually exercised), plus the linear-structure properties
  * every sketch in the family pins: partition invariance and
  * merge-by-addition (union of histograms ≡ histogram of the union).
  */
class LogHistogramSpec extends SparkSuite {

  import spark.implicits._

  private val M = 5

  test("bucket is monotone and lowerBound brackets v within 2^-m relative width, up to 2^62") {
    // probe values: powers of two, their neighbors, and odd fillers
    // across the full domain — the exact boundary cases
    val probes = (0 until 62).flatMap { e =>
      val p = 1L << e
      Seq(p - 1, p, p + 1, p + (p >> 1) + 1)
    }.filter(v => v >= 0 && v < (1L << 62)).distinct.sorted
    val df = probes.toDF("v")
      .select(col("v"), LogHistogram.bucket(col("v"), M).as("b"))
      .select(col("v"), col("b"), LogHistogram.lowerBound(col("b"), M).as("lo"))
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.sliding(2).foreach { case Array((v1, b1, _), (v2, b2, _)) =>
      assert(b1 <= b2, s"bucket not monotone: $v1->$b1 vs $v2->$b2")
    }
    rows.foreach { case (v, b, lo) =>
      assert(lo <= v, s"lowerBound($b)=$lo exceeds v=$v")
      val width = math.max(lo >> M, 1L)
      assert(v < lo + (width << 1),
        s"v=$v beyond bucket envelope [lo=$lo, lo+2*width)") // 2x slack on width
      if (v < (1L << M)) assert(lo == v, s"small value $v not exact")
    }
    // negatives clamp to bucket 0
    assert(Seq(-5L).toDF("v").select(LogHistogram.bucket(col("v"), M))
      .head.getLong(0) == 0L)
  }

  test("quantiles are one-sided within relative error on a heavy-tailed column; merge-by-union equals one-shot") {
    // log-uniform-ish values spanning 9 decades, deterministic
    val vals = (1 to 20000).map { i =>
      val e = i % 30
      (1L << e) + (i * 2654435761L) % math.max(1L << e, 2L)
    }
    val sorted = vals.sorted
    val df = vals.toDF("v")
    val hist = LogHistogram.histogram(df, Nil, "v", M)
    val q = LogHistogram.quantiles(hist, Nil, Seq(50, 90, 99), M)
      .collect().map(r => r.getAs[Int]("phi_pct") ->
        (r.getAs[Long]("target_rank"), r.getAs[Long]("est_q"))).toMap
    for ((phi, (t, est)) <- q) {
      val truth = sorted((t - 1).toInt)
      assert(est <= truth, s"p$phi: est $est above truth $truth")
      assert(truth.toDouble <= est.toDouble * (1.0 + 2.0 / (1 << M)),
        s"p$phi: truth $truth beyond relative envelope of est $est")
    }
    // partition invariance + rollup: histogram of union == summed histograms
    val h1 = LogHistogram.histogram(df.repartition(7), Nil, "v", M)
    val hs = hist.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == hs,
      "histogram depends on partitioning")
    val half1 = vals.take(10000).toDF("v")
    val half2 = vals.drop(10000).toDF("v")
    val merged = LogHistogram.histogram(half1, Nil, "v", M)
      .unionByName(LogHistogram.histogram(half2, Nil, "v", M))
      .groupBy("bucket").agg(sum("cnt").as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == hs, "union-of-histograms != histogram-of-union")
  }

  test("psi: identical distributions read exactly 0; a planted scale shift crosses the 0.25 action gate") {
    import org.apache.spark.sql.functions.col
    val base = (1 to 8000).map(i => ((i * 37L) % 5000L) + 1L)
    val ref = LogHistogram.histogram(base.toDF("v"), Nil, "v", 5)
    // p = q in every bin -> every term is exactly (x - x)*ln(1) = 0
    val same = LogHistogram.psi(ref, ref).head()
    assert(same.getAs[Double]("psi") == 0.0, s"identical psi: $same")
    assert(same.getAs[Long]("n_ref") == 8000L && same.getAs[Long]("n_cur") == 8000L)
    // current = reference scaled 8x in VALUE (mass moves ~3 log-buckets
    // up): severe distribution drift, PSI far beyond the 0.25 gate
    val shifted = base.map(_ * 8L)
    val cur = LogHistogram.histogram(shifted.toDF("v"), Nil, "v", 5)
    val drift = LogHistogram.psi(ref, cur).head()
    assert(drift.getAs[Double]("psi") > 0.25,
      s"8x scale shift must breach the action gate: $drift")
    // replay the ordered double fold exactly
    def counts(vs: Seq[Long]) = vs.groupBy { v =>
      val sh = math.max(64 - java.lang.Long.numberOfLeadingZeros(v) - 1 - 5, 0)
      sh.toLong * 32 + (v >> sh)
    }.view.mapValues(_.size.toLong).toMap
    val (crm, ccm) = (counts(base), counts(shifted))
    val buckets = (crm.keySet ++ ccm.keySet).toSeq.sorted
    val b = buckets.size.toDouble; val nr = 8000.0; val nc = 8000.0
    var acc = 0.0
    buckets.foreach { k =>
      val cr = crm.getOrElse(k, 0L).toDouble; val cc = ccm.getOrElse(k, 0L).toDouble
      acc += ((cr + 1.0) / (nr + b) - (cc + 1.0) / (nc + b)) *
        math.log(((cr + 1.0) * (nc + b)) / ((cc + 1.0) * (nr + b)))
    }
    assert(math.abs(drift.getAs[Double]("psi") - acc) < 1e-6,
      s"psi ${drift.getAs[Double]("psi")} != replay $acc")
    assert(drift.getAs[Long]("n_bins") == buckets.size.toLong)
  }
}
