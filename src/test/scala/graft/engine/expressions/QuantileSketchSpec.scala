package graft.engine.expressions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The dyadic quantile sketch is a LINEAR sketch: every cell is a sum
  * of a pure per-row function, so grids must be bit-identical under
  * any partitioning and any merge tree, rollups must equal one-shot
  * sketches, and — because identity levels are exact and Count-Min
  * only ever overcounts — rank estimates are ONE-SIDED: est ≥ truth,
  * which in turn makes the quantile descent return a value at or
  * below the true quantile. Those invariants (not just error bounds)
  * are what the DuckDB oracle leans on, so they are pinned here.
  */
class QuantileSketchSpec extends SparkSuite {

  import spark.implicits._

  private def nested(df: DataFrame): Seq[Seq[Seq[Long]]] =
    df.head.getSeq[scala.collection.Seq[scala.collection.Seq[Long]]](0)
      .map(_.map(_.toSeq).toSeq).toSeq

  private def sk(df: DataFrame, colName: String = "v"): DataFrame = {
    QuantileSketch.register(spark)
    df.agg(QuantileSketch.sketch(col(colName)).as("sk"),
      count(col(colName)).as("n"))
  }

  test("bucket recipe matches the literal md5-hex parse (oracle twin)") {
    for ((r, l, p, w) <- Seq((0, 0, 42L, 1024), (2, 5, 65535L, 1024),
        (1, 3, 0L, 512), (3, 15, 7L, 4096))) {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$r:$l:$p".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val want = (java.lang.Long.parseLong(hex.take(15), 16) % w).toInt
      assert(QuantileSketch.bucket(r, l, p, w) == want,
        s"bucket($r,$l,$p,$w) diverged from the md5-hex recipe")
    }
  }

  test("grid is partition- and merge-tree-invariant; layout shape is jagged as documented") {
    val rows = (0 until 5000).map(i => (i * 13L) % 60000L).toDF("v")
    val a = nested(sk(rows.repartition(1)))
    val b = nested(sk(rows.repartition(7)))
    assert(a == b, "grid depends on partitioning")
    assert(a.size == 16, "expected 16 levels")
    (0 until 6).foreach { l =>
      assert(a(l).size == 3 && a(l).forall(_.size == 1024),
        s"hashed level $l not 3x1024")
    }
    (6 until 16).foreach { l =>
      assert(a(l).size == 1 && a(l).head.size == (1 << (16 - l)),
        s"identity level $l not 1x${1 << (16 - l)}")
    }
    // mass conservation: every identity level holds n once; every
    // hashed ROW holds n once (each item increments one bucket per row)
    (6 until 16).foreach(l =>
      assert(a(l).head.sum == 5000L, s"identity level $l mass lost"))
    (0 until 6).foreach(l =>
      assert(a(l).map(_.sum) == Seq(5000L, 5000L, 5000L),
        s"hashed level $l row mass wrong"))
  }

  test("merge aggregate and mergeCols both equal the one-shot sketch of the union") {
    QuantileSketch.register(spark)
    val x = (0 until 2000).map(i => ("a", (i * 7L) % 3000L)).toDF("g", "v")
    val y = (0 until 1000).map(i => ("b", (i * 31L) % 50000L)).toDF("g", "v")
    val per = x.union(y).groupBy("g")
      .agg(QuantileSketch.sketch(col("v")).as("sk"))
    val rolled = nested(per.agg(QuantileSketch.merge(col("sk")).as("sk")))
    val direct = nested(x.union(y).agg(QuantileSketch.sketch(col("v")).as("sk")))
    assert(rolled == direct, "merge-aggregate rollup != one-shot sketch")
    val pair = per.filter(col("g") === "a").select(col("sk").as("ska"))
      .crossJoin(per.filter(col("g") === "b").select(col("sk").as("skb")))
    val folded = nested(pair.select(
      QuantileSketch.mergeCols(col("ska"), col("skb")).as("sk")))
    assert(folded == direct, "mergeCols fold != one-shot sketch")
  }

  test("rank is one-sided (est >= truth) and tight; corners are exact") {
    val vals = (0 until 10000).map(i => (i * 37L + 11) % 60000L)
    val df = vals.toDF("v")
    val s = sk(df).cache()
    val probes = Seq(0L, 100L, 5000L, 30000L, 59999L, 65535L)
    val got = s.select(probes.map(x =>
      QuantileSketch.rank(col("sk"), lit(x), col("n")).as(s"r$x")): _*).head
    probes.zipWithIndex.foreach { case (x, i) =>
      val truth = vals.count(_ <= x).toLong
      val est = got.getLong(i)
      assert(est >= truth, s"rank($x): est $est under truth $truth")
      assert(est - truth <= 600, // 6 hashed levels * n/width = 6*10000/1024 ~ 59 expected; 10x slack
        s"rank($x): est $est too far above truth $truth")
    }
    assert(s.select(QuantileSketch.rank(col("sk"), lit(-1L), col("n")))
      .head.getLong(0) == 0L, "rank(-1) != 0")
    assert(s.select(QuantileSketch.rank(col("sk"), lit(65535L), col("n")))
      .head.getLong(0) == 10000L, "rank(domain max) != n")
    s.unpersist()
  }

  test("quantile descent: value at or below the true quantile, within rank tolerance; out-of-range targets hit the edges") {
    val vals = (0 until 10000).map(i => (i * 37L + 11) % 60000L)
    val sorted = vals.sorted
    val df = vals.toDF("v")
    val s = sk(df).cache()
    for (t <- Seq(1L, 100L, 5000L, 9000L, 9900L, 10000L)) {
      val est = s.select(QuantileSketch.quantile(col("sk"), lit(t)))
        .head.getLong(0)
      val truth = sorted((t - 1).toInt)
      assert(est <= truth, s"t=$t: overcounting must pull the estimate DOWN, got $est > $truth")
      val rankAtEst = vals.count(_ <= est).toLong
      assert(t - rankAtEst <= 600 && rankAtEst <= t + 600,
        s"t=$t: est value $est has true rank $rankAtEst, target $t")
    }
    assert(s.select(QuantileSketch.quantile(col("sk"), lit(0L)))
      .head.getLong(0) == 0L, "t<=0 should return 0")
    assert(s.select(QuantileSketch.quantile(col("sk"), lit(1000000L)))
      .head.getLong(0) == 65535L, "t>n should walk to the domain cap")
    s.unpersist()
  }

  test("adversarial heavy-tail error regime: overcount FIRES, stays one-sided, and respects the documented bound") {
    // Every prior gate (and every testdata SF) lands in the exact-answer
    // regime; this is the distribution a 10^9-row heavy-tailed column
    // actually presents: ALL 65536 domain values occur (so every hashed
    // level carries 2x-64x more distinct prefixes than its 1024-bucket
    // width and Count-Min collisions are structural, not incidental),
    // with Zipf mass concentrated at small v. Deterministic — the md5
    // grid makes the worst-case error a fixed, measurable number.
    QuantileSketch.register(spark)
    val df = spark.range(65536).select(
      col("id").as("v"),
      explode(sequence(lit(1L),
        expr("greatest(1L, 2000L div (id + 1))"))).as("__rep"))
      .select(col("v")).repartition(8)
    val s = sk(df).cache()
    // exact ranks from the per-value counts (65536 rows — bounded)
    val cnt = new Array[Long](65536)
    df.groupBy("v").count().collect()
      .foreach(r => cnt(r.getLong(0).toInt) = r.getLong(1))
    val cum = cnt.scanLeft(0L)(_ + _).tail // cum(x) = count of v <= x
    val n = cum.last
    assert(n > 75000L, s"fixture shrank: n=$n")
    // the documented expected bound: hashedLevels * n / width, pre-min.
    // The min-of-3 reduction keeps the deterministic measured worst far
    // inside it (reported via info below; recorded in SCALE.md r16) —
    // pinned at the documented bound itself, no extra slack.
    val bound = 6L * n / 1024L
    val probes = Seq(0L, 1L, 7L, 63L, 255L, 1023L, 2047L, 8191L,
      20000L, 40000L, 65534L)
    val got = s.select(probes.map(x =>
      QuantileSketch.rank(col("sk"), lit(x), col("n")).as(s"r$x")): _*).head
    val errs = probes.zipWithIndex.map { case (x, i) =>
      val est = got.getLong(i)
      val truth = cum(x.toInt)
      assert(est >= truth, s"rank($x): est $est under truth $truth — one-sidedness broken")
      assert(est - truth <= bound,
        s"rank($x): overcount ${est - truth} exceeds hashedLevels*n/width = $bound")
      est - truth
    }
    assert(errs.max > 0L,
      "no probe overcounted — the adversarial fixture failed to leave the exact regime")
    info(s"measured worst rank overcount: ${errs.max} of bound $bound (n=$n)")
    // quantile descent (q278's read path) under the same distribution:
    // overcount pulls the returned value DOWN, never up, and its exact
    // rank stays within the same rank-error envelope of the target
    val sorted = cum // cum is the rank function; invert by search
    for (phi <- Seq(50, 90, 99, 999)) {
      val t = if (phi == 999) (999L * n + 999) / 1000 else (phi * n + 99) / 100
      val est = s.select(QuantileSketch.quantile(col("sk"), lit(t)))
        .head.getLong(0)
      val truth = sorted.indexWhere(_ >= t).toLong
      assert(est <= truth,
        s"phi=$phi t=$t: est $est above true quantile $truth")
      val rankAtEst = if (est < 0) 0L else cum(est.toInt)
      assert(t - rankAtEst <= bound,
        s"phi=$phi t=$t: est $est true-ranks $rankAtEst, > $bound under target")
    }
    s.unpersist()
  }

  test("values clamp to the domain; nulls are skipped") {
    QuantileSketch.register(spark)
    val df = Seq[java.lang.Long](-50L, 0L, 70000L, 65535L, null)
      .toDF("v")
    val s = df.agg(QuantileSketch.sketch(col("v")).as("sk"),
      count(col("v")).as("n"))
    assert(s.head.getLong(1) == 4L)
    // level 15 (identity, 2 cells): clamped -50 and 0 land in cell 0;
    // clamped 70000 and 65535 in cell 1
    val top = nested(s.select(col("sk"), col("n")))(15).head
    assert(top == Seq(2L, 2L), s"clamping distributed mass wrong: $top")
  }

  test("merge aggregate fails fast on a shape-mismatched sketch") {
    QuantileSketch.register(spark)
    val good = (0 until 10).map(_.toLong).toDF("v")
      .agg(QuantileSketch.sketch(col("v"), 16, 3, 1024).as("sk"))
    val err = intercept[Exception] {
      good.select(QuantileSketch.merge(col("sk"), 16, 3, 512).as("sk"))
        .collect()
    }
    assert(err.getMessage != null)
  }
}
