package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scaling probe for the a-priori family, driven by the
  * round-14 finding: ProfileScaling replays q259 VERBATIM at x8, but
  * q259 pins minSupport = 3 customers ABSOLUTE — at 8× the baskets
  * (same item universe) every support roughly octuples, the effective
  * relative threshold drops 8×, the frequent-pair frame explodes, and
  * the candidate-triple join spilled the machine's disk to death. The
  * workload-correct scale-up of frequency mining holds RELATIVE
  * support: minSupport = 3 × mult. This main measures exactly that —
  * frequentTriples at x1/x4/x8 with support scaled alongside the data
  * — which is the number SCALE.md reports (with the absolute-support
  * blowup documented as the lesson, not a bug: the operator did what
  * a 8×-looser threshold asks).
  */
object ProfileItemsets {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mults = sys.env.get("SPARK_GRAFT_MULTS")
      .map(_.split(",").toSeq.map(_.toInt)).getOrElse(Seq(8, 4, 1))
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (mult <- mults) {
      val dir = if (mult == 1) src else s"/tmp/graft_scale_x$mult"
      require(mult == 1 || java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$dir/lineitem.parquet")),
        s"build x$mult with ProfileScaling first")
      def baskets = {
        val li = spark.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        val ord = spark.read.parquet(s"$dir/orders.parquet")
          .select(col("o_orderkey").as("o"), col("o_custkey").as("c"))
        li.join(ord, "o").select("c", "p").distinct()
      }
      def once(sup: Int): (Double, Long) = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = graft.GraftSession.withQueryCaches(spark) {
          graft.ops.Itemsets.frequentTriples(baskets, "c", "p",
            minSupport = sup).count()
        }
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val sup = 3 * mult
      val (t1, n1) = once(sup)
      val (t2, _) = once(sup)
      println(f"[itemsets] x$mult%-2d minSupport=$sup%-3d " +
        f"${math.min(t1, t2)}%7.2f s  triples=$n1")
    }
    spark.stop()
  }
}
