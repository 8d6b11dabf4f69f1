package graft

import graft.ops.Survival

class SurvivalSpec extends SparkSuite {
  import spark.implicits._

  test("Kaplan-Meier matches the hand-computed textbook curve with censoring") {
    // 10 subjects: deaths at t=1 (2), t=3 (1), t=5 (2); censored at
    // t=2 (1), t=4 (1), t=5 (3, the observation edge).
    // n(1)=10, S(1) = 8/10
    // t=2: censoring only, S unchanged, risk drops to 7 after
    // n(3)=7,  S(3) = S(1) * 6/7
    // t=4: censoring only; n(5)=5, S(5) = S(3) * 3/5
    val subjects = Seq(
      (1L, false), (1L, false), (2L, true), (3L, false), (4L, true),
      (5L, false), (5L, false), (5L, true), (5L, true), (5L, true)
    ).toDF("t", "cen")
    val r = Survival.kaplanMeier(subjects, "t", "cen")
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(r(1L) == ((10L, 2L, 0L, 800000000L)))
    // fold: floor(8e8 * floor(1e9) / 1e9) = 8e8; t=2 factor = 7/7 = 1e9
    assert(r(2L) == ((8L, 0L, 1L, 800000000L)))
    // t=3: factor floor(6e9/7) = 857142857; S = floor(8e8 * 857142857 / 1e9)
    val s3 = 800000000L * 857142857L / 1000000000L
    assert(r(3L) == ((7L, 1L, 0L, s3)), s"got ${r(3L)} want S=$s3")
    assert(r(4L)._4 == s3, "censoring-only time must not move S")
    // t=5: n=5, d=2 -> factor 6e8; S = floor(s3 * 6e8 / 1e9)
    val s5 = s3 * 600000000L / 1000000000L
    assert(r(5L) == ((5L, 2L, 3L, s5)))
    // the 6-dp display column tracks the fp column
    val disp = Survival.kaplanMeier(subjects, "t", "cen")
      .collect().map(x => x.getLong(0) -> x.getDouble(5)).toMap
    assert(math.abs(disp(5L) - s5.toDouble / 1e9) < 5e-7)
  }

  test("Greenwood band: hand-computed variance terms, clamped CI, degenerate S=0 point") {
    // same 10-subject fixture as the curve test; Greenwood terms
    // d·10¹⁸ div (n(n−d)) replayed by hand:
    //   t=1: 2/(10·8)  → 25000000000000000
    //   t=2: censoring only → 0
    //   t=3: 1/(7·6)   → floor(1e18/42)
    //   t=5: 2/(5·3)   → floor(2e18/15)
    val subjects = Seq(
      (1L, false), (1L, false), (2L, true), (3L, false), (4L, true),
      (5L, false), (5L, false), (5L, true), (5L, true), (5L, true)
    ).toDF("t", "cen")
    val r = Survival.kaplanMeierGreenwood(subjects, "t", "cen")
      .collect().map(x => x.getLong(0) ->
        (x.getDouble(4), x.getDouble(5), x.getDouble(6), x.getDouble(7)))
      .toMap
    val g1 = 25000000000000000L
    val se1 = 0.8 * math.sqrt(g1.toDouble / 1e18)
    assert(math.abs(r(1L)._1 - 0.8) < 5.1e-7)
    assert(math.abs(r(1L)._2 - se1) < 5.1e-7, s"se(1) ${r(1L)._2} != $se1")
    assert(math.abs(r(1L)._3 - (0.8 - 1.96 * se1)) < 5.1e-7)
    assert(r(1L)._4 == 1.0, s"upper band must clamp to 1: ${r(1L)._4}")
    // censoring-only point: S, se, and the band are all unchanged
    assert(r(2L) == r(1L), "censoring must not move the band")
    // t=3 and t=5: exact fixed-point replay of Σ and S feeding the se
    val g3 = g1 + 1000000000000000000L / 42L
    val s3fp = 800000000L * 857142857L / 1000000000L
    val se3 = (s3fp.toDouble / 1e9) * math.sqrt(g3.toDouble / 1e18)
    assert(math.abs(r(3L)._2 - se3) < 5.1e-7, s"se(3) ${r(3L)._2} != $se3")
    val g5 = g3 + 2000000000000000000L / 15L
    val s5fp = s3fp * 600000000L / 1000000000L
    val se5 = (s5fp.toDouble / 1e9) * math.sqrt(g5.toDouble / 1e18)
    assert(math.abs(r(5L)._2 - se5) < 5.1e-7, s"se(5) ${r(5L)._2} != $se5")
    assert(math.abs(r(5L)._3 - (s5fp / 1e9 - 1.96 * se5)) < 5.1e-7)
    assert(math.abs(r(5L)._4 - (s5fp / 1e9 + 1.96 * se5)) < 5.1e-7)
    // everyone at risk churns at the end (n = d, S = 0): the undefined
    // Greenwood increment freezes to 0 and the band collapses to [0,0]
    val all = Seq((1L, false), (2L, false)).toDF("t", "cen")
    val last = Survival.kaplanMeierGreenwood(all, "t", "cen")
      .collect().map(x => x.getLong(0) ->
        (x.getDouble(4), x.getDouble(5), x.getDouble(6), x.getDouble(7)))
      .toMap
    assert(last(2L) == ((0.0, 0.0, 0.0, 0.0)),
      s"S=0 point must carry a zero band: ${last(2L)}")
  }

  test("logRank: hand-computed hypergeometric moments, mirrored arms read zero, guards") {
    // planted difference: arm 1 all censored at t=10, arm 2 all dead at
    // t=1. Only t=1 contributes (d=5, n1t=n2t=5, n=10):
    //   E1 = 5*5/10 = 2.5 exactly, V = 5*25*5/(100*9) = 0.694444444
    //   chi2 = (0-2.5)^2/V = 9.0 > 3.841 -> significant
    val planted = (1 to 5).map(_ => (1, 10L, true)) ++
      (1 to 5).map(_ => (2, 1L, false))
    val r = Survival.logRank(planted.toDF("arm", "t", "cen"),
      "arm", "t", "cen").head()
    assert(r.getAs[Long]("n1") == 5L && r.getAs[Long]("n2") == 5L)
    assert(r.getAs[Long]("o1") == 0L)
    assert(math.abs(r.getAs[Double]("e1") - 2.5) < 1e-9)
    val vExact = (BigInt(5) * 5 * 5 * 5 * 1000000000L) / (10L * 10L * 9L)
    val chi2 = 2.5 * 2.5 / (vExact.toDouble / 1e9)
    assert(math.abs(r.getAs[Double]("chi2") - chi2) < 5.1e-7,
      s"chi2 ${r.getAs[Double]("chi2")} != $chi2")
    assert(r.getAs[Boolean]("significant"))
    // stray arm 3 must not perturb anything (the mannWhitney rule)
    val noisy = planted ++ (1 to 4).map(_ => (3, 2L, false))
    assert(Survival.logRank(noisy.toDF("arm", "t", "cen"),
      "arm", "t", "cen").head() == r)
    // a lone arm-1 death at an n = 1 time counts in the CONVENTIONAL
    // o1/e1 readout (r18 advice): d1 and e1 = n1t·d/n both contribute
    // exactly 1 there, so O1 − E1 and V (guarded to 0 at n = 1) are
    // what the old n > 1-filtered sum read. Hand-computed: arm 2 dies
    // at t=1 (n=2: E1 = 0.5, V = 0.25), arm 1 dies alone at t=5
    // (n = 1: o1 += 1, e1 += 1, v += 0) → o1 = 1, e1 = 1.5,
    // chi2 = (1 − 1.5)² / 0.25 = 1.0, silent.
    val lateDeath = Seq((1, 5L, false), (2, 1L, false))
    val rl = Survival.logRank(lateDeath.toDF("arm", "t", "cen"),
      "arm", "t", "cen").head()
    assert(rl.getAs[Long]("o1") == 1L, s"n=1 death must count in o1: $rl")
    assert(math.abs(rl.getAs[Double]("e1") - 1.5) < 1e-9)
    assert(math.abs(rl.getAs[Double]("chi2") - 1.0) < 1e-9, s"chi2: $rl")
    assert(!rl.getAs[Boolean]("significant"))
    // the approximate mode (staged fixed-point V + double decision)
    // must agree with exact away from the 3.841459 boundary — here the
    // staged division even lands on the identical v_fp grid point
    assert(Survival.logRankApprox(planted.toDF("arm", "t", "cen"),
      "arm", "t", "cen").head() == r,
      "logRankApprox must match logRank away from the boundary")
    // mirrored arms: O1 = E1 exactly at every time (all divisions land
    // on integers), chi2 = 0, silent
    val same = Seq(1L -> false, 2L -> false, 3L -> false, 4L -> true,
      4L -> true).flatMap { case (t, c) => Seq((1, t, c), (2, t, c)) }
    val r0 = Survival.logRank(same.toDF("arm", "t", "cen"),
      "arm", "t", "cen").head()
    assert(r0.getAs[Double]("chi2") == 0.0 && !r0.getAs[Boolean]("significant"),
      s"mirrored arms must read exactly null: $r0")
    // one arm absent fails fast
    val oneArm = (1 to 5).map(_ => (1, 3L, false))
    val ex = intercept[Exception] {
      Survival.logRank(oneArm.toDF("arm", "t", "cen"),
        "arm", "t", "cen").collect()
    }
    assert(ex.getMessage.contains("both arms need subjects"))
  }

  test("no censoring tracks the empirical survival function within the documented fold drift") {
    // 8 subjects, one death per t=1..8: true S(t) = (8-t)/8. The
    // defined estimator compounds PRE-FLOORED per-step factors, so it
    // may sit up to (steps) ulps of 1e-9 below the real product —
    // pinned here both ways: exact equality against the defined fold's
    // BigInt replay, and closeness to the real-valued curve.
    val subjects = (1L to 8L).map(t => (t, false)).toDF("t", "cen")
    val r = Survival.kaplanMeier(subjects, "t", "cen")
      .collect().map(x => x.getLong(0) -> x.getLong(4)).toMap
    var acc = BigInt(1000000000L)
    (1L to 8L).foreach { t =>
      val n = 8L - (t - 1); val f = BigInt((n - 1) * 1000000000L / n)
      acc = acc * f / 1000000000L
      assert(r(t) == acc.toLong, s"t=$t: ${r(t)} != defined fold $acc")
      val truth = (8L - t).toDouble / 8.0 * 1e9
      assert(r(t) <= truth && truth - r(t) <= 8,
        s"t=$t: fold ${r(t)} drifted >8 ulps from true $truth")
    }
  }
}
