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
}
