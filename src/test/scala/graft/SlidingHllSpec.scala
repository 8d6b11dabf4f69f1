package graft

import org.apache.spark.sql.functions._
import graft.engine.expressions.Hll

class SlidingHllSpec extends SparkSuite {
  import spark.implicits._

  test("sliding window register-max fold == direct sketch of the window's ids") {
    // idempotence is what makes OVERLAPPING windows foldable from daily
    // sketch rows: consecutive windows share 6 of 7 days and the max
    // fold double-counts nothing
    val rows = for {
      d <- 0 until 20
      u <- 0 until (50 + 13 * d)
    } yield (d, s"u${u % (30 + d)}_${u % 7}")
    val df = rows.toDF("day", "uid")
    Hll.register(spark)
    val daily = df.groupBy("day").agg(Hll.sketch(col("uid"), 8).as("sk"))
    val days = daily.select(col("day").as("gday"))
    val folded = daily.join(broadcast(days),
        col("gday") - col("day") >= 0 && col("gday") - col("day") <= 6)
      .groupBy("gday").agg(Hll.merge(col("sk"), 8).as("sk"))
      .select(col("gday"), round(Hll.estimate(col("sk"), 8), 4).as("est"))
    val direct = df.as("l").join(broadcast(days),
        col("gday") - col("day") >= 0 && col("gday") - col("day") <= 6)
      .groupBy("gday").agg(Hll.sketch(col("uid"), 8).as("sk"))
      .select(col("gday"), round(Hll.estimate(col("sk"), 8), 4).as("est"))
    val mismatch = folded.as("f").join(direct.as("d"), Seq("gday"))
      .filter(col("f.est") =!= col("d.est"))
    assert(mismatch.count() == 0,
      "window fold of daily sketches must be bit-identical to a direct window sketch")
    assert(folded.count() == 20)
  }
}
