package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only mega-hub stressor for the coreness fold: a power-law-style
  * graph no test SF produces — ONE hub adjacent to `hubDeg` leaves
  * (default 2M) on top of a band of overlapping 8-cliques (so the
  * h-index iteration runs several genuine rounds, not one) — timed at
  * a caller-chosen core count. Under the pre-r15 per-neighbor
  * row_number fold, round 1 sorted the hub's 2M-row slice in ONE task
  * (the funnel the r14 VERDICT flagged); the count-threshold fold
  * collapses those rows map-side to ≤ #distinct-values per partition,
  * so wall time should SCALE with cores instead of pinning at the
  * hub's single-task sort. Run at 4/8/16/32 via SPARK_GRAFT_CPUS for
  * the strong-scaling row in SCALE.md.
  */
object ProfileHub {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val hubDeg = sys.env.getOrElse("SPARK_GRAFT_HUB_DEG", "2000000").toLong
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // hub 0 — leaves 1..hubDeg; plus overlapping 8-cliques over nodes
    // [hubDeg+1, hubDeg+40001): node i links i+1..i+7 (stride 4), so
    // interior nodes sit in two cliques and coreness peels in >1 round
    val star = spark.range(1, hubDeg + 1)
      .select(lit(0L).as("src"), col("id").as("dst"))
    val cliqueBase = spark.range(hubDeg + 1, hubDeg + 40001, 4)
    val clique = cliqueBase.select(col("id"),
        explode(sequence(lit(1), lit(7))).as("i"))
      .select(col("id").as("a"), (col("id") + col("i")).as("b"))
      .select(col("a").as("src"), col("b").as("dst"))
    // a few leaves also join the clique band so the hub's neighbor
    // VALUES stay non-degenerate across rounds (distinct vals > 2)
    val bridge = spark.range(1, 2001)
      .select(col("id").as("src"), (col("id") + hubDeg).as("dst"))
    val edges = star.unionByName(clique).unionByName(bridge)
      .repartition(cpus.toInt).cache()
    println(s"[hub] edges = ${edges.count()} (hub degree $hubDeg), cores = $cpus")

    def once(): Double = {
      val t0 = System.nanoTime()
      val n =
        if (sys.env.get("SPARK_GRAFT_HUB_OLD").contains("true"))
          oldFoldCoreness(edges).count()
        else graft.ops.KCore.coreness(edges, "src", "dst").count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[hub] coreness over ${n} nodes in $t%.2f s")
      t
    }
    val t = math.min(once(), once())
    val variant = if (sys.env.get("SPARK_GRAFT_HUB_OLD").contains("true"))
      "old-rownum-fold" else "count-threshold"
    println(f"[hub] cores=$cpus variant=$variant min=$t%.2f s")
    spark.stop()
  }

  /** The PRE-r15 h-index fold, kept here (dev-only) as the A/B
    * baseline: row_number over EVERY neighbor row per node — the
    * mega-hub serializes one task sorting its full adjacency slice.
    */
  private def oldFoldCoreness(edges: org.apache.spark.sql.DataFrame)
  : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = edges.select(col("src").as("__a"), col("dst").as("__b"))
      .unionByName(edges.select(col("dst").as("__a"), col("src").as("__b")))
      .localCheckpoint(eager = false)
    var v = e.groupBy(col("__a").as("node"))
      .agg(count(lit(1)).cast("int").as("val"))
      .localCheckpoint(eager = false)
    def valSum(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(coalesce(sum(col("val")), lit(0L))).head.getLong(0)
    var prevSum = valSum(v)
    var converged = prevSum == 0L
    var i = 0
    while (!converged && i < 64) {
      val nb = e.join(v, e("__b") === v("node"))
        .select(e("__a").as("node"), col("val"))
      val w = Window.partitionBy("node").orderBy(col("val").desc)
      val next = nb.withColumn("__rn", row_number().over(w))
        .groupBy("node")
        .agg(max(least(col("val"), col("__rn"))).cast("int").as("val"))
        .localCheckpoint(eager = false)
      val s = valSum(next)
      converged = s == prevSum
      prevSum = s
      v = next
      i += 1
    }
    v.select(col("node"), col("val").as("coreness"))
  }
}
