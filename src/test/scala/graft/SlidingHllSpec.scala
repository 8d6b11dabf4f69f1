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

  test("sliding window SUM fold of daily quantile grids == direct grid of the window's rows") {
    // the dual witness to the HLL case: days are DISJOINT row
    // partitions, so rank mass is additive and the sum fold is exact
    // for overlapping windows — it was the distinct-count METRIC, not
    // the fold, that was non-additive in q282
    import graft.engine.expressions.QuantileSketch
    QuantileSketch.register(spark)
    val rows = for {
      d <- 0 until 15
      k <- 0 until 40
    } yield (d, ((d * 997 + k * 131) % 70000).toLong)
    val df = rows.toDF("day", "v")
      .select(col("day"),
        least(greatest(col("v"), lit(0L)), lit(65535L)).as("v"))
    val daily = df.groupBy("day").agg(QuantileSketch.sketch(col("v")).as("sk"))
    val days = daily.select(col("day").as("gday"))
    def winJoin(base: org.apache.spark.sql.DataFrame) =
      base.join(broadcast(days),
        col("gday") - col("day") >= 0 && col("gday") - col("day") <= 6)
    val folded = winJoin(daily).groupBy("gday")
      .agg(QuantileSketch.merge(col("sk")).as("sk"))
    val direct = winJoin(df).groupBy("gday")
      .agg(QuantileSketch.sketch(col("v")).as("sk"))
    val cmp = folded.as("f").join(direct.as("d"), Seq("gday"))
      .filter(col("f.sk") =!= col("d.sk"))
    assert(cmp.count() == 0,
      "sum fold of disjoint-day grids must be bit-identical to the direct window grid")
  }
}
