package graft

import org.apache.spark.sql.functions._
import graft.ops.Robust

class TheilSenSpec extends SparkSuite {
  import spark.implicits._

  private val Scale = 1000L
  // the q286 production offset — exercised here so the spec replay and
  // the registered query share the exact floor-division regime
  private val Offset = 100000000000000000L

  /** In-spec sequential replay of the exact fixed-point median rule. */
  private def refSlope(pts: Seq[(Long, Long)]): Long = {
    val slopes = for {
      (x1, y1) <- pts; (x2, y2) <- pts if x2 > x1
    } yield {
      val dy = y2 - y1; val dx = x2 - x1
      (Math.floorDiv(dy * Scale + dx * Offset, dx) - Offset, x1, x2)
    }
    val sorted = slopes.sortBy(identity)
    sorted((sorted.size + 1) / 2 - 1)._1
  }

  test("theilSen matches the sequential replay and shrugs off a wild outlier") {
    // clean line y = 3x + 7 (slope_fp = 3000 at scale 1000)
    val clean = (0L until 12L).map(x => (x, 3 * x + 7))
    val got = Robust.theilSen(clean.toDF("x", "y"), "x", "y", Scale, Offset)
      .head()
    assert(got.getAs[Long]("n_points") == 12L)
    assert(got.getAs[Long]("n_pairs") == 66L)
    assert(got.getAs[Long]("slope_fp") == 3000L)
    assert(got.getAs[Long]("slope_fp") == refSlope(clean))

    // one wild point (+10^6 at x=5): 11 of 66 pairwise slopes are
    // contaminated — the median moves by at most one order statistic,
    // while the OLS slope would swing by thousands
    val dirty = clean.map { case (x, y) => if (x == 5) (x, y + 1000000L) else (x, y) }
    val d = Robust.theilSen(dirty.toDF("x", "y"), "x", "y", Scale, Offset).head()
    assert(d.getAs[Long]("slope_fp") == refSlope(dirty))
    assert(math.abs(d.getAs[Long]("slope_fp") - 3000L) < 100L,
      s"median slope ${d.getAs[Long]("slope_fp")} dragged by a single outlier")
  }

  test("theilSen: negative slopes floor-divide identically to the replay") {
    val pts = (0L until 9L).map(x => (x, 100L - 7 * x + (x % 3)))
    val got = Robust.theilSen(pts.toDF("x", "y"), "x", "y", Scale, Offset).head()
    assert(got.getAs[Long]("slope_fp") == refSlope(pts))
    assert(got.getAs[Long]("slope_fp") < 0L)
  }

  test("theilSen: violated offset contract fails fast, not a wrapped median") {
    // |dy|·scale = 5e6·1000 = 5e9 over dx = 1 — an offset of 10^6 is
    // far below the required max|dy·scale/dx| and would have produced a
    // silently-wrong floor division before the guard
    val pts = Seq((0L, 0L), (1L, 5000000L), (2L, 5000001L))
    val ex = intercept[Exception] {
      Robust.theilSen(pts.toDF("x", "y"), "x", "y", Scale, 1000000L).collect()
    }
    assert(ex.getMessage.contains("offset too small"),
      s"expected the offset guard, got: ${ex.getMessage}")

    // dy·scale + dx·offset > Long.MAX: overflow must error, not wrap —
    // dx=92 puts dx·offset at 9.2e18 (so the offset check passes:
    // |dy|·scale = 1e18 < 9.2e18) while the summed numerator reaches
    // 1.02e19 > 2^63−1
    val big = Seq((0L, 0L), (92L, 1000000000000000L))
    val ex2 = intercept[Exception] {
      Robust.theilSen(big.toDF("x", "y"), "x", "y", Scale, Offset).collect()
    }
    assert(ex2.getMessage.contains("Long range"),
      s"expected the overflow guard, got: ${ex2.getMessage}")
  }

  test("mannWhitney matches an exact BigInt replay on a tie-heavy fixture") {
    // many ties (values mod 7) so the doubled-rank and tie-correction
    // arithmetic is genuinely exercised; arm 1 shifted by +2
    val rows = (1 to 300).map { i =>
      val arm = if (i % 2 == 0) 1 else 2
      (arm, (i * 13 % 7).toLong + (if (arm == 1) 2L else 0L))
    }
    def replay(rs: Seq[(Int, Long)]): (Long, Long, Long, Double, Boolean) = {
      val n1 = rs.count(_._1 == 1).toLong; val n2 = rs.size - n1
      val n = n1 + n2
      val byV = rs.groupBy(_._2).toSeq.sortBy(_._1)
      var below = 0L; var r2x = BigInt(0); var tsum = BigInt(0)
      byV.foreach { case (_, g) =>
        val ct = g.size.toLong; val c1 = g.count(_._1 == 1).toLong
        r2x += BigInt(c1) * (2 * below + ct + 1)
        tsum += BigInt(ct) * ct * ct - ct
        below += ct
      }
      val u2x = r2x - BigInt(n1) * (n1 + 1)
      val z = (u2x.toDouble - n1.toDouble * n2.toDouble) /
        math.sqrt(n1.toDouble * n2.toDouble / 3.0 *
          ((n.toDouble + 1.0) - tsum.toDouble / (n.toDouble * (n.toDouble - 1.0))))
      val lhs = (u2x - BigInt(n1) * n2).pow(2) * 3 * 10000 * (BigInt(n) * (n - 1))
      val rhs = BigInt(38416) * n1 * n2 * ((BigInt(n) + 1) * (BigInt(n) * (n - 1)) - tsum)
      (n1, n2, u2x.toLong, math.rint(z * 1e6) / 1e6, lhs > rhs)
    }
    val got = graft.ops.Robust.mannWhitney(rows.toDF("arm", "v"), "arm", "v").head()
    val (n1, n2, u2x, _, sig) = replay(rows)
    assert(got.getAs[Long]("n1") == n1 && got.getAs[Long]("n2") == n2)
    assert(got.getAs[Long]("u2x") == u2x, s"u2x ${got.getAs[Long]("u2x")} != $u2x")
    assert(got.getAs[Boolean]("significant") == sig)
    assert(sig, "planted +2 shift on a 0..6 tie lattice should be significant")
    assert(math.abs(got.getAs[Double]("z") - replay(rows)._4) < 2e-6)

    // identical arms: U sits at its null center exactly, not significant
    val nullRows = (1 to 200).map(i => (if (i % 2 == 0) 1 else 2, (i % 5).toLong))
    val g0 = graft.ops.Robust.mannWhitney(nullRows.toDF("arm", "v"), "arm", "v").head()
    assert(g0.getAs[Long]("u2x") == 100L * 100L,
      "symmetric arms must center 2U at n1*n2")
    assert(!g0.getAs[Boolean]("significant"))
  }

  test("ksTest: sees a pure VARIANCE shift the rank test centers on zero; exact replay") {
    // arm 2 = arm 1 stretched 3x around the same center: medians equal
    // (Mann-Whitney-invisible by symmetry), but the ECDFs separate in
    // the shoulders — KS must fire. 300 units per arm, deterministic.
    val rows = (1 to 600).map { i =>
      val arm = if (i % 2 == 0) 1 else 2
      val base = ((i / 2 * 7) % 101).toLong - 50   // symmetric in [-50, 50]
      (arm, if (arm == 1) base else base * 3)
    }
    def replay(rs: Seq[(Int, Long)]): (Long, Boolean) = {
      val n1 = rs.count(_._1 == 1).toLong; val n2 = rs.size - n1
      var c1 = 0L; var c2 = 0L; var best = BigInt(0)
      rs.groupBy(_._2).toSeq.sortBy(_._1).foreach { case (_, g) =>
        c1 += g.count(_._1 == 1); c2 += g.count(_._1 == 2)
        val gap = (BigInt(c1) * n2 - BigInt(c2) * n1).abs
        if (gap > best) best = gap
      }
      val sig = best.pow(2) * 1000000 >
        BigInt(1844164) * (n1 + n2) * n1 * n2
      (best.toLong, sig)
    }
    val df = rows.toDF("arm", "v")
    val got = graft.ops.Robust.ksTest(df, "arm", "v").head()
    val (dnum, sig) = replay(rows)
    assert(got.getAs[Long]("d_num") == dnum,
      s"d_num ${got.getAs[Long]("d_num")} != replay $dnum")
    assert(got.getAs[Boolean]("significant") == sig && sig,
      "a 3x variance stretch must separate the ECDFs")
    // the same arms under Mann-Whitney: centered, silent (the pairing
    // that motivates carrying BOTH tests)
    val mw = graft.ops.Robust.mannWhitney(df, "arm", "v").head()
    assert(!mw.getAs[Boolean]("significant"),
      "rank test should not fire on a symmetric variance shift")

    // truly identical arms (every value mirrored once per arm): D = 0
    val same = (1 to 100).flatMap(i => Seq((1, (i % 7).toLong), (2, (i % 7).toLong)))
    val g0 = graft.ops.Robust.ksTest(same.toDF("arm", "v"), "arm", "v").head()
    assert(g0.getAs[Long]("d_num") == 0L && !g0.getAs[Boolean]("significant"))
  }

  test("mannWhitney/ksTest: stray arms are dropped, not counted as arm 2") {
    // r17 advice: a row whose arm is 3 (or null) is NOT part of the
    // 1-vs-2 comparison — silently folding it into arm 2 shifts every
    // rank. The noisy input must produce the clean input's readout.
    val clean = (1 to 120).map(i => (if (i % 2 == 0) 1 else 2,
      (i * 13 % 11).toLong + (if (i % 2 == 0) 1L else 0L)))
    val noisy = clean ++ (1 to 50).map(i => (3, 9999L + i))
    def mw(rs: Seq[(Int, Long)]) =
      graft.ops.Robust.mannWhitney(rs.toDF("arm", "v"), "arm", "v").head()
    def ks(rs: Seq[(Int, Long)]) =
      graft.ops.Robust.ksTest(rs.toDF("arm", "v"), "arm", "v").head()
    assert(mw(noisy) == mw(clean), "stray arm 3 leaked into Mann-Whitney")
    assert(ks(noisy) == ks(clean), "stray arm 3 leaked into KS")
    // null arms likewise drop (a join miss upstream must not become
    // phantom arm-2 mass)
    val withNull = clean.map { case (a, v) => (Option(a), v) } ++
      Seq((Option.empty[Int], 50L), (Option.empty[Int], 51L))
    val gn = graft.ops.Robust.mannWhitney(
      withNull.toDF("arm", "v"), "arm", "v").head()
    assert(gn == mw(clean), "null arm leaked into Mann-Whitney")
  }

  test("mannWhitney/ksTest: degenerate inputs fail fast instead of emitting NaN") {
    // all values tied: the rank variance is exactly zero — the z
    // denominator would be 0/0; the msprt-style guard must raise
    val tied = (1 to 40).map(i => (if (i % 2 == 0) 1 else 2, 7L))
    val exTied = intercept[Exception] {
      graft.ops.Robust.mannWhitney(tied.toDF("arm", "v"), "arm", "v").collect()
    }
    assert(exTied.getMessage.contains("zero rank variance"),
      s"expected the all-tied guard, got: ${exTied.getMessage}")
    // one arm absent entirely
    val oneArm = (1 to 20).map(i => (1, i.toLong))
    val exMw = intercept[Exception] {
      graft.ops.Robust.mannWhitney(oneArm.toDF("arm", "v"), "arm", "v").collect()
    }
    assert(exMw.getMessage.contains("both arms need data"))
    val exKs = intercept[Exception] {
      graft.ops.Robust.ksTest(oneArm.toDF("arm", "v"), "arm", "v").collect()
    }
    assert(exKs.getMessage.contains("both arms need data"))
  }

  test("approx modes: agree with exact away from the boundary; exact fails fast past its domain") {
    // agreement: identical n1/n2/u2x/z and the same decision on the
    // tie-heavy fixture (the approx decision only differs inside a
    // 1e-9 band around the critical value)
    val rows = (1 to 400).map(i =>
      (if (i % 2 == 0) 1 else 2, (i * 13 % 41).toLong + (if (i % 2 == 0) 3L else 0L)))
    val df = rows.toDF("arm", "v")
    val ex = graft.ops.Robust.mannWhitney(df, "arm", "v").head()
    val ap = graft.ops.Robust.mannWhitneyApprox(df, "arm", "v").head()
    assert(ex == ap, s"approx must match exact away from the boundary: $ex vs $ap")
    val ks = graft.ops.Robust.ksTest(df, "arm", "v").head()
    val ksA = graft.ops.Robust.ksTestApprox(df, "arm", "v").head()
    assert(ks == ksA, s"KS approx must match exact: $ks vs $ksA")
    // past the exact domain (2e7 rows: the decision's n⁴·n₁n₂ product
    // overflows decimal(38,0)) the exact mode must RAISE, not return
    // garbage — and the approx mode must read the same cell out fine
    val big = spark.range(0, 20000000L)
      .select(((col("id") % 2) + 1).cast("int").as("arm"),
        ((col("id") % 9973 + col("id") % 313) % 500).cast("long").as("v"))
    val exBig = intercept[Exception] {
      graft.ops.Robust.mannWhitney(big, "arm", "v").collect()
    }
    assert(exBig.getMessage.toLowerCase.contains("cannot be represented as decimal")
      || exBig.getMessage.toLowerCase.contains("overflow"),
      s"expected decimal overflow past the domain, got: ${exBig.getMessage.take(200)}")
    val apBig = graft.ops.Robust.mannWhitneyApprox(big, "arm", "v").head()
    assert(apBig.getAs[Long]("n1") == 10000000L
      && apBig.getAs[Long]("n2") == 10000000L)
    assert(!apBig.getAs[Double]("z").isNaN)
  }

  test("mannWhitney/ksTest rank stage is the two-phase scan, not a single-task window") {
    // r17 advice: Window.orderBy with no partitionBy ships every
    // distinct metric value through ONE task. The rank/ECDF cumulative
    // now rides PrefixSum's per-partition scan — the final plan must
    // carry no Window operator at all.
    val rows = (1 to 300).map(i => (if (i % 2 == 0) 1 else 2, (i * 17 % 97).toLong))
    val df = rows.toDF("arm", "v")
    val mwPlan = graft.ops.Robust.mannWhitney(df, "arm", "v")
      .queryExecution.executedPlan.toString
    assert(!mwPlan.contains("Window"), s"Mann-Whitney still plans a window:\n$mwPlan")
    val ksPlan = graft.ops.Robust.ksTest(df, "arm", "v")
      .queryExecution.executedPlan.toString
    assert(!ksPlan.contains("Window"), s"KS still plans a window:\n$ksPlan")
  }
}
