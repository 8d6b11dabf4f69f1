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
