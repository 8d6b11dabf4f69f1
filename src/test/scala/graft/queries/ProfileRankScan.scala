package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: Mann-Whitney / KS rank-stage scaling on a HIGH-CARDINALITY
  * metric — the workload the r17 verdict flagged against the old
  * unpartitioned-window cumulative (every distinct value through one
  * task). After the PrefixSum rewire the rank stage is a two-phase
  * per-partition scan; this measures wall-clock across distinct-value
  * octaves (rows 2x the distinct count, two arms interleaved) so
  * SCALE.md can record the shape. The registered q292/q299 workload is
  * ~1.1M distinct cents values; the top cell here is ~20x that.
  */
object ProfileRankScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm-up
    spark.range(1000000).select(pmod(col("id") * 2654435761L, lit(1000L)))
      .groupBy("pmod((id * 2654435761), 1000)").count().count()
    for (n <- Seq(1000000L, 4000000L, 16000000L, 40000000L)) {
      val distinct = n / 2
      // Weyl-style multiplicative spread: ~n/2 distinct values, each
      // hit ~twice, arms interleaved — non-degenerate, tie-bearing
      val df = spark.range(n).select(
        (pmod(col("id"), lit(2L)) + 1).cast("int").as("arm"),
        pmod(col("id") * 2654435761L, lit(distinct)).as("v"))
      def time(tag: String)(body: => Unit): Unit = {
        val t0 = System.nanoTime()
        body
        println(f"[rank] n=$n%-9d distinct~$distinct%-9d $tag%-4s " +
          f"${(System.nanoTime() - t0) / 1e9}%7.2f s")
      }
      // Mann-Whitney's exact significance decimal carries the n ≲ a
      // few 10⁶ per-cell contract (COVERAGE.md table) — profile it
      // in-domain only; KS's ~10⁸/arm contract covers every cell, and
      // both ops share the identical PrefixSum rank stage, so the KS
      // top cell is the 10⁷-distinct funnel-removal evidence.
      if (n <= 4000000L)
        time("mw") { graft.ops.Robust.mannWhitney(df, "arm", "v").collect() }
      time("ks") { graft.ops.Robust.ksTest(df, "arm", "v").collect() }
    }
    spark.stop()
  }
}
