package graft

import org.apache.spark.sql.functions._
import graft.ops.Sequential

class SequentialSpec extends SparkSuite {
  import spark.implicits._

  // deterministic two-arm daily stream: `days` days, `perDay` units per
  // arm per day, value = 1000 + bounded pseudo-noise (+ `effect` on arm 1)
  private def stream(days: Int, perDay: Int, effect: Long) =
    (for {
      d <- 1 to days; arm <- 1 to 2; i <- 1 to perDay
    } yield (f"d$d%02d", arm,
      1000L + (((d * 131 + i * 7) % 21) - 10) * 5 +
        (if (arm == 1) effect else 0L)))
      .toDF("day", "arm", "v")

  test("planted effect: always-valid p is monotone, crosses alpha, and stays crossed") {
    val r = Sequential.msprt(stream(12, 50, effect = 30L), "day", "arm", "v")
      .orderBy("day").collect()
    assert(r.length == 12)
    val ps = r.map(_.getAs[Double]("p_av"))
    assert(ps.zip(ps.tail).forall { case (a, b) => b <= a + 1e-9 },
      s"p_av not monotone non-increasing: ${ps.mkString(",")}")
    assert(r.last.getAs[Boolean]("rejected"),
      s"planted 3% lift never rejected: final p=${ps.last}")
    // once rejected, later checkpoints stay rejected (monotone p)
    val firstRej = r.indexWhere(_.getAs[Boolean]("rejected"))
    assert(r.drop(firstRej).forall(_.getAs[Boolean]("rejected")))
    // the mean diff readout sees the planted effect in metric units
    assert(math.abs(r.last.getAs[Double]("mean_diff") - 30.0) < 5.0)
  }

  test("null effect: no rejection at any checkpoint (the peeking guarantee)") {
    // identical per-index noise in both arms -> exact zero diff; the
    // mixture term makes ln_lambda negative, p_av pinned at 1
    val r = Sequential.msprt(stream(12, 50, effect = 0L), "day", "arm", "v")
      .collect()
    assert(r.forall(!_.getAs[Boolean]("rejected")),
      "null stream rejected — always-valid guarantee broken")
    assert(r.forall(_.getAs[Double]("p_av") == 1.0))
  }

  test("constant metric (zero pooled variance) fails fast") {
    val flat = (for { d <- 1 to 3; arm <- 1 to 2; i <- 1 to 10 }
      yield (f"d$d%02d", arm, 500L)).toDF("day", "arm", "v")
    val ex = intercept[Exception] {
      Sequential.msprt(flat, "day", "arm", "v").collect()
    }
    assert(ex.getMessage.contains("pooled variance is zero"),
      s"expected the variance guard, got: ${ex.getMessage}")
  }

  test("mde: hand-replayed first checkpoint, monotone shrink, planted-vs-null detectable") {
    val r = Sequential.mde(stream(12, 50, effect = 30L), "day", "arm", "v")
      .orderBy("day").collect()
    assert(r.length == 12)
    // equal daily batches: vn ~ 1/t, so the MDE strictly shrinks
    val mdes = r.map(_.getAs[Double]("mde"))
    assert(mdes.zip(mdes.tail).forall { case (a, b) => b < a },
      s"mde not shrinking: ${mdes.mkString(",")}")
    // hand replay of checkpoint 1 from the exact integer moments
    val day1 = (for { arm <- 1 to 2; i <- 1 to 50 } yield (arm,
      1000L + (((131 + i * 7) % 21) - 10) * 5 + (if (arm == 1) 30L else 0L)))
    val s = day1.groupBy(_._1).view.mapValues(_.map(x => BigInt(x._2)).sum).toMap
    val ss = day1.groupBy(_._1).view
      .mapValues(_.map(x => BigInt(x._2) * x._2).sum).toMap
    val varU2 = (BigInt(100) * (ss(1) + ss(2))
      - (s(1) + s(2)) * (s(1) + s(2))) / BigInt(10000)
    val vn = varU2.toDouble * 100.0 / (50.0 * 50.0)
    val want = 2.801585 * math.sqrt(vn)
    assert(math.abs(mdes.head - want) < 5.1e-7,
      s"day-1 mde ${mdes.head} != replay $want")
    // the 30-unit planted effect eventually clears its own MDE...
    assert(r.last.getAs[Boolean]("detectable"),
      s"planted effect never detectable: mde=${mdes.last}")
    // ...and an exactly-null effect never does
    val r0 = Sequential.mde(stream(12, 50, effect = 0L), "day", "arm", "v")
      .collect()
    assert(r0.forall(!_.getAs[Boolean]("detectable")))
  }

  test("srmCheck: fires exactly at the chi-square critical boundary, per segment") {
    // n = 1000 per segment; chi2 = d^2/n crosses 3.841459 between
    // d = 61 (3.721) and d = 62 (3.844) — the exact-integer flag must
    // agree with that boundary with no float in the decision
    def seg(name: String, n1: Int, n2: Int) =
      (1 to n1).map(_ => (name, 1)) ++ (1 to n2).map(_ => (name, 2))
    val df = (seg("ok", 500, 500) ++ seg("близко", 530, 470) ++
      seg("srm", 531, 469)).toDF("g", "arm")
    val r = graft.ops.Sequential.srmCheck(df, "g", "arm")
      .collect().map(x => x.getString(0) ->
        (x.getAs[Double]("chi2"), x.getAs[Boolean]("srm"))).toMap
    assert(!r("ok")._2 && r("ok")._1 == 0.0)
    assert(!r("близко")._2, s"d=60 must not flag: chi2=${r("близко")._1}")
    assert(r("srm")._2, s"d=62 must flag: chi2=${r("srm")._1}")
    assert(math.abs(r("srm")._1 - 62.0 * 62.0 / 1000.0) < 1e-9)
  }

  test("chiSquareIndependence: planted dependence fires, independence stays silent; exact fold") {
    // dependent: outcome skews hard with the row label (df=1, crit
    // 3.841459 -> critFp 3841459)
    val dep = ((1 to 90).map(_ => ("a", "x")) ++ (1 to 10).map(_ => ("a", "y")) ++
      (1 to 30).map(_ => ("b", "x")) ++ (1 to 70).map(_ => ("b", "y")))
      .toDF("r", "c")
    val d = graft.ops.Sequential.chiSquareIndependence(dep, "r", "c", 3841459L)
      .head()
    assert(d.getAs[Long]("df") == 1L && d.getAs[Boolean]("dependent"),
      s"planted 90/10-vs-30/70 split must be dependent: $d")
    // exact BigInt replay of the fixed-point fold
    val cells = Seq(("a","x",90L), ("a","y",10L), ("b","x",30L), ("b","y",70L))
    val n = BigInt(200); val rm = Map("a" -> BigInt(100), "b" -> BigInt(100))
    val cm = Map("x" -> BigInt(120), "y" -> BigInt(80))
    val want = cells.map { case (r, c, o) =>
      val num = BigInt(o) * n - rm(r) * cm(c)
      num * num * 1000000 / (n * rm(r) * cm(c))
    }.sum
    assert(math.abs(d.getAs[Double]("chi2") - want.toDouble / 1e6) < 1e-9)
    // independent: identical outcome mix in both rows -> chi2 == 0
    val ind = ((1 to 60).map(_ => ("a", "x")) ++ (1 to 40).map(_ => ("a", "y")) ++
      (1 to 30).map(_ => ("b", "x")) ++ (1 to 20).map(_ => ("b", "y")))
      .toDF("r", "c")
    val i = graft.ops.Sequential.chiSquareIndependence(ind, "r", "c", 3841459L)
      .head()
    assert(i.getAs[Double]("chi2") == 0.0 && !i.getAs[Boolean]("dependent"),
      s"proportional table must read exactly zero: $i")
  }

  test("cusum: prefix-sum form equals the classic recursion; planted shift alarms, baseline does not") {
    // 10 flat days at 1000, then a +60 level shift (kappa = 20,
    // h = 150): S+ accumulates 40/day post-shift -> alarm on day 14
    val xs = (1 to 10).map(_ => 1000L) ++ (11 to 20).map(_ => 1060L)
    val daily = xs.zipWithIndex.map { case (x, i) => (f"d${i + 1}%02d", x) }
      .toDF("day", "x_fp")
    val params = Seq((1000L, 20L, 150L)).toDF("mu0_fp", "kappa_fp", "h_fp")
    val r = graft.ops.Sequential.cusum(daily, "day", "x_fp", params)
      .orderBy("day").collect()
    // classic recursion replay
    var sHi = 0L; var sLo = 0L
    val want = xs.map { x =>
      sHi = math.max(0L, sHi + (x - 1000L - 20L))
      sLo = math.max(0L, sLo - (x - 1000L + 20L))
      (sHi, sLo, sHi > 150L || sLo > 150L)
    }
    r.zip(want).zipWithIndex.foreach { case ((row, (whi, wlo, walarm)), i) =>
      assert(row.getAs[Long]("s_hi_fp") == whi,
        s"day ${i + 1}: s_hi ${row.getAs[Long]("s_hi_fp")} != replay $whi")
      assert(row.getAs[Long]("s_lo_fp") == wlo)
      assert(row.getAs[Boolean]("alarm") == walarm)
    }
    assert(!r(9).getAs[Boolean]("alarm"), "alarm before the shift")
    assert(r.indexWhere(_.getAs[Boolean]("alarm")) == 13,
      "expected first alarm on day 14 (4 days x 40 excess > 150)")
    // downward drift trips the LOW side
    val down = (1 to 6).map(i => (f"d$i%02d", 900L)).toDF("day", "x_fp")
    val rd = graft.ops.Sequential.cusum(down, "day", "x_fp", params)
      .orderBy("day").collect()
    assert(rd.last.getAs[Long]("s_lo_fp") == 6L * 80L)
    assert(rd.last.getAs[Boolean]("alarm"))
  }

  test("a day where one arm is silent still carries cumulative stats forward") {
    val base = stream(6, 20, effect = 25L)
    // drop arm 2 entirely on day 3: the dense grid must carry arm 2's
    // cumulative counts so day >= 3 checkpoints remain monitorable
    val gappy = base.filter(!(col("day") === "d03" && col("arm") === 2))
    val r = Sequential.msprt(gappy, "day", "arm", "v").orderBy("day").collect()
    assert(r.length == 6, s"expected all 6 checkpoints, got ${r.length}")
    val n2 = r.map(_.getAs[Long]("n2"))
    assert(n2(2) == n2(1), "silent day should not grow arm 2's count")
    assert(n2(3) > n2(2), "arm 2's count must resume growing after the gap")
  }
}
