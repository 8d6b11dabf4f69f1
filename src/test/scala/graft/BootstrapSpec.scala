package graft

import org.apache.spark.sql.functions._
import graft.ops.Bootstrap

class BootstrapSpec extends SparkSuite {
  import spark.implicits._

  test("poissonWeight: deterministic, bounded, mean ≈ 1 over many keys") {
    val w = spark.range(100000)
      .select(Bootstrap.poissonWeight(concat(col("id").cast("string"), lit(":0")))
        .as("w"))
      .agg(min("w"), max("w"), avg("w"), sum(when(col("w") === 0, 1).otherwise(0)))
      .head()
    assert(w.getLong(0) >= 0L && w.getLong(1) <= 8L)
    assert(math.abs(w.getDouble(2) - 1.0) < 0.02,
      s"Poisson(1) mean drifted: ${w.getDouble(2)}")
    // P(w=0) = 1/e ≈ 0.368
    assert(math.abs(w.getLong(3) / 100000.0 - 0.368) < 0.01)
  }

  test("meanDiffCI is exact on constant arms, including negative means") {
    // mean of a constant is that constant for EVERY replicate with n>0,
    // so lo = hi = point — this pins the offset floor-division path on
    // both positive (10) and negative (−4) fixed-point means
    val df = (1L to 300L).map(i => (i, if (i % 2 == 0) 1 else 2,
      if (i % 2 == 0) 10000000L else -4000000L)).toDF("id", "arm", "v_fp")
    val r = Bootstrap.meanDiffCI(df, "id", "arm", "v_fp",
      reps = 50, loRank = 2, hiRank = 49).head()
    assert(r.getAs[Int]("n_reps") == 50)
    assert(r.getAs[Long]("n1") == 150L && r.getAs[Long]("n2") == 150L)
    assert(r.getAs[Long]("point_fp") == 14000000L)
    assert(r.getAs[Long]("lo_fp") == 14000000L)
    assert(r.getAs[Long]("hi_fp") == 14000000L)
  }

  test("cluster resampling widens the CI under planted intra-cluster correlation") {
    // 40 clusters × 10 rows; each cluster carries a shared ±2.0 offset —
    // rows co-move within a cluster, so unit-level resampling understates
    // the variance. Same rows, same machinery; only the resampling key
    // differs (cluster id vs row id). Deterministic (md5 draws), so the
    // widths are fixed facts, not a statistical flake.
    val rows = for {
      c <- 1L to 40L
      j <- 0L until 10L
    } yield {
      val arm = if (c % 2 == 0) 1 else 2
      val clusterShift = (if (c % 4 < 2) 2000000L else -2000000L)
      val noise = ((c * 31 + j * 7) % 11) * 100000L
      (c, c * 100 + j, arm, clusterShift + noise)
    }
    val df = rows.toDF("cluster", "row_id", "arm", "v_fp")
    def width(idCol: String): Long = {
      val r = Bootstrap.meanDiffCI(df, idCol, "arm", "v_fp",
        reps = 200, loRank = 5, hiRank = 196).head()
      r.getAs[Long]("hi_fp") - r.getAs[Long]("lo_fp")
    }
    val wCluster = width("cluster")
    val wRow = width("row_id")
    assert(wCluster > wRow,
      s"cluster CI width $wCluster must exceed row CI width $wRow when " +
        "rows co-move within clusters")
  }

  test("groupMeanCI: exact on constants; groups are independent panels") {
    // constant group → every replicate mean IS the constant → lo = hi =
    // point; and because the draw keys on (id, b) only, removing group B
    // must leave group A's CI bit-identical
    val two = ((1L to 120L).map(i => ("A", i, 5000000L)) ++
      (1000L to 1150L).map(i => ("B", i, -2000000L))).toDF("g", "id", "v_fp")
    val both = Bootstrap.groupMeanCI(two, "g", "id", "v_fp",
      reps = 60, loRank = 2, hiRank = 59).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("point_fp"),
        r.getAs[Long]("lo_fp"), r.getAs[Long]("hi_fp")))).toMap
    assert(both("A") == ((5000000L, 5000000L, 5000000L)))
    assert(both("B") == ((-2000000L, -2000000L, -2000000L)))
    val noisy = (1L to 300L).map(i =>
      (if (i % 3 == 0) "A" else "B", i, ((i * 37) % 100) * 10000L))
      .toDF("g", "id", "v_fp")
    def rowA(df: org.apache.spark.sql.DataFrame) =
      Bootstrap.groupMeanCI(df, "g", "id", "v_fp", 100, 3, 98)
        .filter(col("g") === "A").head()
    val full = rowA(noisy)
    val alone = rowA(noisy.filter(col("g") === "A"))
    assert(full.getAs[Long]("lo_fp") == alone.getAs[Long]("lo_fp") &&
      full.getAs[Long]("hi_fp") == alone.getAs[Long]("hi_fp"),
      "group A's CI must not depend on group B's presence")
  }

  test("meanDiffCI: percentile interval brackets the point estimate on noisy arms") {
    // deterministic (hash-driven) so this is a fixed fact, not a flake
    val df = (1L to 400L).map { i =>
      val arm = if (i % 2 == 0) 1 else 2
      val v = ((i * 7919) % 1000) * 10000L + (if (arm == 1) 3000000L else 0L)
      (i, arm, v)
    }.toDF("id", "arm", "v_fp")
    val r = Bootstrap.meanDiffCI(df, "id", "arm", "v_fp",
      reps = 200, loRank = 5, hiRank = 196).head()
    val (lo, hi, pt) = (r.getAs[Long]("lo_fp"), r.getAs[Long]("hi_fp"),
      r.getAs[Long]("point_fp"))
    assert(lo < hi, s"degenerate interval [$lo, $hi]")
    assert(lo <= pt && pt <= hi, s"point $pt outside [$lo, $hi]")
    assert(r.getAs[Int]("n_reps") == 200)
  }

  test("meanDiffCI: an absent arm fails fast instead of nulling") {
    val oneArm = (1L to 50L).map(i => (i, 1, i * 1000L)).toDF("id", "arm", "v_fp")
    val ex = intercept[Exception] {
      Bootstrap.meanDiffCI(oneArm, "id", "arm", "v_fp",
        reps = 50, loRank = 2, hiRank = 49).collect()
    }
    assert(ex.getMessage.contains("arm has no rows") ||
      ex.getMessage.contains("surviving replicates"),
      s"expected an emptiness guard, got: ${ex.getMessage}")
  }

  test("jackknifeRatio: exact BigInt replay; homogeneous buckets give a tight CI") {
    // 400 units, clicks/views planted so the true ratio is ~0.25 with
    // mild per-unit variation; replay recomputes the exact fixed-point
    // leave-one-out moments and the double readout formula
    val rows = (1L to 400L).map(u => (u, (u % 3) + 1L, 4L + (u % 5)))
    val df = rows.toDF("id", "clicks", "views")
    def hashRankLong(key: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(key.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 1000003L + 1L
    }
    val b = 50
    val byB = rows.groupBy(r => hashRankLong(r._1.toString) % b)
      .map { case (k, g) => k -> (g.map(_._2).sum, g.map(_._3).sum) }
    val nt = byB.values.map(_._1).sum; val dt = byB.values.map(_._2).sum
    val off = BigInt(graft.ops.Bootstrap.OffsetFp)
    val rfps = byB.values.toSeq.map { case (nb, db) =>
      (BigInt(nt - nb) * 1000000000L + BigInt(dt - db) * off) / BigInt(dt - db) - off
    }
    val bcnt = rfps.size.toDouble
    val s1 = rfps.sum; val s2 = rfps.map(x => x * x).sum
    val se = math.sqrt((bcnt - 1.0) / bcnt *
      (s2.toDouble - s1.toDouble * s1.toDouble / bcnt)) / 1e9
    val got = graft.ops.Bootstrap.jackknifeRatio(df, "id", "clicks", "views", b)
      .head()
    assert(got.getAs[Long]("n_buckets") == rfps.size.toLong)
    assert(got.getAs[Long]("num_total") == nt && got.getAs[Long]("den_total") == dt)
    assert(got.getAs[Double]("ratio") == math.rint(nt.toDouble / dt * 1e6) / 1e6)
    assert(math.abs(got.getAs[Double]("se_jk") - se) < 2e-6,
      s"se ${got.getAs[Double]("se_jk")} != replay $se")
    assert(got.getAs[Double]("lo") < got.getAs[Double]("ratio") &&
      got.getAs[Double]("ratio") < got.getAs[Double]("hi"))
    // homogeneous buckets: the jackknife se must be small vs the ratio
    assert(got.getAs[Double]("se_jk") < 0.05 * got.getAs[Double]("ratio"))
  }

  test("jackknifeRatio: an empty leave-one-out denominator fails fast") {
    // all views land in whichever single bucket id=1 hashes to ->
    // removing that bucket empties the denominator
    val df = Seq((1L, 3L, 10L), (1L, 2L, 5L)).toDF("id", "clicks", "views")
    val ex = intercept[Exception] {
      graft.ops.Bootstrap.jackknifeRatio(df, "id", "clicks", "views", 50).collect()
    }
    assert(ex.getMessage.contains("leave-one-out denominator"),
      s"expected the denominator guard, got: ${ex.getMessage}")
  }

  test("groupMeanCI: a group too small to retain hiRank replicates errors") {
    // a 1-unit group drops every replicate whose single Poisson weight
    // is 0 (~37%), so n_reps < hiRank = reps is near-certain; before
    // the guard this silently returned NULL CI bounds
    val df = ((1L to 60L).map(i => ("big", i, i * 1000L)) :+ (("tiny", 999L, 5000L)))
      .toDF("g", "id", "v_fp")
    val ex = intercept[Exception] {
      Bootstrap.groupMeanCI(df, "g", "id", "v_fp",
        reps = 100, loRank = 3, hiRank = 98).collect()
    }
    assert(ex.getMessage.contains("surviving replicates"),
      s"expected the per-group replicate guard, got: ${ex.getMessage}")
  }
}
