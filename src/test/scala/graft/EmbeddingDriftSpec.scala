package graft

import org.apache.spark.sql.functions._

class EmbeddingDriftSpec extends SparkSuite {
  import spark.implicits._

  private def drift(df: org.apache.spark.sql.DataFrame) = {
    val x = df.select(col("label"), posexplode(col("embedding")))
      .select(col("label"), col("pos").as("dim"),
        round(col("col").cast("double") * 1000000, 0).cast("long").as("v"))
    val lm = x.groupBy("label", "dim").agg(count(lit(1)).as("n"), sum("v").as("s"))
    val g = lm.groupBy("dim").agg(sum("n").as("gn"), sum("s").as("gs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("dim").orderBy(col("dev").desc, col("label").asc)
    lm.join(g, "dim")
      .withColumn("lmean", expr("(s + n * 10000000000) div n - 10000000000"))
      .withColumn("gmean", expr("(gs + gn * 10000000000) div gn - 10000000000"))
      .withColumn("dev", abs(col("lmean") - col("gmean")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
  }

  test("planted per-label shift on one dimension dominates that dim's deviation") {
    // 3 labels × 60 vectors of dim 8, values from a deterministic grid;
    // label 2's dim 5 carries a +0.4 shift — the drift monitor must
    // flag label 2 on dim 5 with a deviation near the planted shift
    // (2/3 of it: the global mean absorbs 1/3 of a one-of-three-label
    // shift), and stay near zero on the unshifted dims
    val rows = for (l <- 0 until 3; k <- 0 until 60) yield {
      val base = Array.tabulate(8)(d => (((l * 60 + k) * 13 + d * 7) % 21 - 10) / 100.0f)
      if (l == 2) base(5) = base(5) + 0.4f
      (l, base.toSeq)
    }
    val got = drift(rows.toDF("label", "embedding"))
      .select("dim", "dev", "label").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getInt(2))))
      .toMap
    val (dev5, lab5) = got(5)
    assert(lab5 == 2, s"dim 5 flagged label $lab5, expected the shifted label 2")
    assert(math.abs(dev5 - 266667L) < 20000L,
      s"dim 5 deviation $dev5 should be ~2/3 of the planted 0.4 shift (266667 fp)")
    (0 until 8).filter(_ != 5).foreach { d =>
      assert(got(d)._1 < 50000L,
        s"unshifted dim $d deviation ${got(d)._1} should stay small")
    }
  }
}
