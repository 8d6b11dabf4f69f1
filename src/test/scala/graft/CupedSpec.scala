package graft

import org.apache.spark.sql.functions._
import graft.ops.Cuped

class CupedSpec extends SparkSuite {
  import spark.implicits._

  test("CUPED removes planted per-unit level imbalance from the arm diff") {
    // 400 units with PERSISTENT levels (base_u appears in both the
    // pre-period covariate and the outcome) whose spread dominates the
    // planted arm imbalance (so pooled θ ≈ 1); arm 1's units carry an
    // +8.0 level imbalance — the raw diff reads imbalance + effect,
    // CUPED must recover ~the true effect (10.0). Deterministic; fixed
    // point 10^6 per unit.
    val effectFp = 10000000L
    val rows = (1L to 400L).map { u =>
      val arm = if (u % 2 == 0) 1 else 2
      val base = ((u * 13) % 97) * 2000000L +
        (if (arm == 1) 8000000L else 0L)          // planted imbalance
      val noiseX = ((u * 29) % 11) * 100000L
      val noiseY = ((u * 31) % 11) * 100000L
      (u, arm, base + noiseX, base + noiseY + (if (arm == 1) effectFp else 0L))
    }
    val r = Cuped.adjustedDiff(rows.toDF("u", "arm", "x", "y"),
      "arm", "x", "y").head()
    val theta = r.getAs[Long]("theta_fp")
    val raw = r.getAs[Long]("raw_diff_fp")
    val adj = r.getAs[Long]("adj_diff_fp")
    assert(math.abs(theta - 1000000L) < 50000L, s"theta_fp $theta should be ~1e6")
    // the op's means are 10^6 x the INPUT unit (which is itself 10^6 x
    // the logical unit here), so diffs come back at 10^12 per logical
    val effectOut = effectFp * 1000000L
    // raw diff is contaminated by the planted 8.0 imbalance (+ effect)
    assert(raw > effectOut + 6000000L * 1000000L,
      s"raw $raw should carry the imbalance")
    // adjusted diff recovers the true effect within the noise floor
    assert(math.abs(adj - effectOut) < 1500000L * 1000000L,
      s"adjusted $adj should be ~the true effect $effectOut (raw was $raw)")
  }

  test("adjustedDiff matches an exact BigInt replay, including negative values") {
    // mixed-sign covariates and outcomes exercise every positivity
    // offset (theta, both means, the adjustment term); the replay uses
    // the same lift-then-divide formulas, so equality is exact
    val rows = (1L to 120L).map { u =>
      val arm = if (u % 2 == 0) 1 else 2
      val x = (((u * 7) % 31) - 15) * 700000L
      val y = (((u * 11) % 29) - 14) * 600000L + x / 2
      (u, arm, x, y)
    }
    def refAdjusted(rs: Seq[(Long, Int, Long, Long)]): (Long, Long, Long) = {
      val n = BigInt(rs.size)
      val sx = rs.map(r => BigInt(r._3)).sum
      val sy = rs.map(r => BigInt(r._4)).sum
      val sxx = rs.map(r => BigInt(r._3) * r._3).sum
      val sxy = rs.map(r => BigInt(r._3) * r._4).sum
      val covn = n * sxy - sx * sy
      val varn = n * sxx - sx * sx
      val cTh = BigInt("1000000000000")
      val theta = (covn * 1000000 + varn * cTh) / varn - cTh
      val cM = BigInt("10000000000000000")
      def mean(s: BigInt, c: BigInt) = (s * 1000000 + c * cM) / c - cM
      def armStats(a: Int) = {
        val g = rs.filter(_._2 == a)
        (BigInt(g.size), g.map(r => BigInt(r._3)).sum, g.map(r => BigInt(r._4)).sum)
      }
      val (n1, sx1, sy1) = armStats(1); val (n2, sx2, sy2) = armStats(2)
      val dy = mean(sy1, n1) - mean(sy2, n2)
      val dx = mean(sx1, n1) - mean(sx2, n2)
      val cA = BigInt("1000000000000000")
      val adjTerm = (theta * dx + cA * 1000000) / 1000000 - cA
      (theta.toLong, dy.toLong, (dy - adjTerm).toLong)
    }
    val r = Cuped.adjustedDiff(rows.toDF("u", "arm", "x", "y"),
      "arm", "x", "y").head()
    val (theta, raw, adj) = refAdjusted(rows)
    assert(r.getAs[Long]("theta_fp") == theta)
    assert(r.getAs[Long]("raw_diff_fp") == raw)
    assert(r.getAs[Long]("adj_diff_fp") == adj)
  }

  test("diffInDiff recovers a planted effect under group levels AND a period shock") {
    // group level +400 on treated, common period shock +150 on post,
    // true effect +70 on treated-post only; noise identical across
    // cells so the interaction is EXACT: did_fp = 70 * 10^6
    val rows = (for {
      g <- Seq(0, 1); p <- Seq(0, 1); i <- 1 to 50
    } yield {
      val noise = ((i * 17) % 13).toLong - 6
      (g, p, 1000L + noise + (if (g == 1) 400L else 0L) +
        (if (p == 1) 150L else 0L) + (if (g == 1 && p == 1) 70L else 0L))
    }).toDF("g", "p", "y")
    val r = graft.ops.Cuped.diffInDiff(rows, "g", "p", "y").head()
    assert(r.getAs[Long]("n_t_pre") == 50L && r.getAs[Long]("n_c_post") == 50L)
    // identical noise per cell cancels exactly in every difference
    assert(r.getAs[Long]("pre_gap_fp") == 400L * 1000000L)
    assert(r.getAs[Long]("post_gap_fp") == 470L * 1000000L)
    assert(r.getAs[Long]("did_fp") == 70L * 1000000L,
      s"did_fp ${r.getAs[Long]("did_fp")} != 70e6")
  }

  test("diffInDiff fails fast when a group x period cell is empty") {
    val rows = Seq((1, 0, 10L), (1, 1, 12L), (0, 0, 9L)).toDF("g", "p", "y")
    val ex = intercept[Exception] {
      graft.ops.Cuped.diffInDiff(rows, "g", "p", "y").collect()
    }
    assert(ex.getMessage.contains("four group x period cells"),
      s"expected the empty-cell guard, got: ${ex.getMessage}")
  }

  test("constant covariate (var(x)=0) fails fast instead of nulling") {
    val rows = (1L to 40L).map(u => (u, if (u % 2 == 0) 1 else 2, 5L, u * 3))
    val ex = intercept[Exception] {
      Cuped.adjustedDiff(rows.toDF("u", "arm", "x", "y"),
        "arm", "x", "y").collect()
    }
    assert(ex.getMessage.contains("var(x) > 0"),
      s"expected the var(x) guard, got: ${ex.getMessage}")
  }
}
