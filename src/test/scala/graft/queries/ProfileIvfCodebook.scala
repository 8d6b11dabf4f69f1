package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: n = 1 IVF centroid-assignment cost vs codebook size
  * (r18 verdict item 1 — "measure at production codebook sizes and add
  * the switch point").
  *
  * Three forms over the same synthetic corpus (500k rows × 64 dims,
  * deterministic LCG):
  *  - flat:    the production fast path — ONE flattened codebook
  *             literal scanned by the codegen'd NearestCentroid loop
  *             (constant generated-code size at any nCentroids)
  *  - unroll:  the r18 shape — one `dot(emb, lit(cᵢ))` expression node
  *             per centroid + array_max/array_position (generated code
  *             grows O(nCentroids); expected to fall over at 4k)
  *  - join:    broadcast crossJoin + per-id group-limit (the n > 1 /
  *             oversized-codebook fallback; shuffles |corpus| rows)
  */
object ProfileIvfCodebook {

  private val Dim = 64

  private def vec(seed: Long): Array[Double] = {
    var s = seed * 6364136223846793005L + 1442695040888963407L
    Array.fill(Dim) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 40) % 2048).toDouble / 1024.0 - 1.0
    }
  }

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(500000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    graft.engine.expressions.DotProduct.register(spark)
    graft.engine.expressions.NearestCentroid.register(spark)
    import graft.engine.expressions.DotProduct.dot

    val corpus = spark.range(rows)
      .select(col("id"), expr(
        s"transform(sequence(1, $Dim), i -> " +
          "cast(pmod(xxhash64(id, i), 2048) as double) / 1024.0 - 1.0)")
        .cast("array<double>").as("emb"))
      .cache()
    corpus.count()

    def time(name: String)(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      val n = df.agg(sum(col("bucket").cast("long"))).head().getLong(0)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $name%-24s $s%7.2f s  (checksum $n)")
      s
    }

    for (nCent <- Seq(16, 256, 4096)) {
      val centRows = (0 until nCent).map(j => (j.toLong, vec(j)))
      val cents = centRows.toDF("cent_id", "cent_emb").cache()
      cents.count()
      println(s"== nCentroids = $nCent ==")
      // warm + measure (2nd run) each form
      def flat() = graft.llm.SimSearch.nearestBuckets(
        corpus, cents, "id", "emb", 1)
      def join() = {
        spark.conf.set("spark.graft.ivf.maxCodebookLiteralDoubles", "1")
        try graft.llm.SimSearch.nearestBuckets(corpus, cents, "id", "emb", 1)
        finally spark.conf.unset("spark.graft.ivf.maxCodebookLiteralDoubles")
      }
      def unroll() = {
        val dotsArr = array(centRows.map(c =>
          dot(col("emb"), lit(c._2))): _*)
        val cidArr = array(centRows.map(c => lit(c._1)): _*)
        corpus.select(col("id"),
          element_at(cidArr,
            array_position(dotsArr, array_max(dotsArr)).cast("int"))
            .as("bucket"))
      }
      time("flat warm")(flat()); time("flat")(flat())
      if (nCent <= 4096) { // unroll at 4k: expect codegen pain, still try
        try { time("unroll warm")(unroll()); time("unroll")(unroll()) }
        catch { case e: Throwable =>
          println(s"[profile] unroll FAILED: ${e.getClass.getSimpleName}: " +
            e.getMessage.take(120))
        }
      }
      time("join warm")(join()); time("join")(join())
      cents.unpersist()
    }
    spark.stop()
  }
}
