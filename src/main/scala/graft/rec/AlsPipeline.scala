package graft.rec

import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.Indexing

/** ALS collaborative filtering (SURVEY.md §2.8 M10-M12, §3.2), the
  * reference's `recommender_prod_rec.py` flow re-expressed:
  *
  *  1. usage → percent_rank rating per (user, item) (W1, `:170-179`)
  *  2. accumulate intensity (A2, `:181-185`)
  *  3. deterministic surrogate int ids (`:187-206`, zipWithIndex replaced
  *     by ordered row_number)
  *  4. ALS train + grid search + RMSE eval (`:212-259`)
  *  5. recommendForAllUsers → explode → join entity maps back (`:261-269`)
  */
object AlsPipeline {

  case class Config(rank: Int = 15, maxIter: Int = 5, regParam: Double = 0.001,
                    implicitPrefs: Boolean = true, seed: Long = 0L, topK: Int = 5,
                    numBlocks: Int = 8,
                    // Storage for ALS's per-iteration factor/block RDDs.
                    // The default stays MLlib's spill-safe MEMORY_AND_DISK:
                    // under executor memory pressure an evicted MEMORY_ONLY
                    // block silently recomputes the whole iteration chain —
                    // the wrong library default. Benchmarks / memory-sized
                    // local runs pass MEMORY_ONLY explicitly (~2x faster
                    // cold, no spill-file serialization).
                    intermediateStorage: String = "MEMORY_AND_DISK")

  /** W1 preprocessing: percent_rank of intensity within user+item, plus
    * epsilon (`recommender_prod_rec.py:171-176`).
    */
  def percentRankRating(usage: DataFrame, user: String, item: String,
                        intensity: String): DataFrame = {
    val w = Window.partitionBy(user, item).orderBy(col(intensity))
    usage.withColumn("rating", percent_rank().over(w) + lit(1e-6))
      .filter(col("rating").isNotNull)
  }

  /** A2 accumulation: total intensity per (user, item). */
  def accumulate(usage: DataFrame, user: String, item: String,
                 intensity: String): DataFrame =
    usage.groupBy(user, item).agg(sum(col(intensity)).as("rating"))

  /** Deterministic surrogate ids + (userId, itemId, rating) triples.
    * The ratings input feeds three plan branches (triples + both entity
    * distincts) — CALLERS should `.cache()` it so the upstream pipeline
    * runs once, and unpersist it after `train` (an eager fit that
    * materializes the factors) rather than leaking it for the session —
    * caching here would pin a frame this function can never release.
    */
  def indexedTriples(ratings: DataFrame, user: String, item: String): DataFrame = {
    val r = ratings
    // USER ids: distributed assignment (sort + zipWithIndex), not the
    // single-task window form — a ratings fact table's user universe is
    // itself fact-sized (10^8+ distinct at production scale). MLlib ALS
    // ids are Int; past 2^31 distinct values the row-level raise_error
    // fails the job fast (zero extra jobs/actions) instead of silently
    // truncating ids into collisions.
    def ids(c: String, out: String) =
      Indexing.zipWithIndexOrdered(r.select(col(c)).distinct(), out, Seq(col(c).asc))
        .withColumn(out,
          when(col(out) > Int.MaxValue.toLong,
            raise_error(concat(lit(s"$out exceeds Int range at id "), col(out))))
            .otherwise(col(out)).cast("int"))
    val users = ids(user, "userId")
    // Item universes are catalog-dimension scale (brands/SKUs), not
    // fact scale — the single-task window is the documented dimension
    // path and skips a distinct-shuffle + range-sort + zip job. The id
    // assignment (0-based over ascending sort) is identical to the
    // zipWithIndexOrdered form, so swapping paths never changes ids.
    val items = Indexing.withRowIndex(r.select(col(item)).distinct(), "itemId",
      Seq(col(item).asc))
    r.join(users, user).join(items, item)
      .select(col("userId"), col("itemId"), col("rating").cast("float").as("rating"))
      // Pin the physical layout: hash-partitioned on a FIXED count and
      // sorted within partitions, so the row order entering ALS's
      // blockifier is a pure function of the data (an explicit partition
      // count keeps AQE from re-coalescing it). This removes the
      // INPUT-side nondeterminism only: MLlib's blockify/solver stages
      // still accumulate floats in shuffle-fetch order, so factor BITS
      // wobble at ULP level run to run even on identical input
      // (measured round 8 — two same-JVM fits on bit-identical triples
      // produced different factor hashes). Scores survive rounding to
      // coarse precision almost always, but not provably: q40 is
      // rows-only in the oracle gate for exactly this reason.
      .repartition(8, col("userId"))
      .sortWithinPartitions("userId", "itemId")
  }

  def train(triples: DataFrame, cfg: Config): ALSModel =
    new ALS()
      .setRank(cfg.rank).setMaxIter(cfg.maxIter).setRegParam(cfg.regParam)
      .setImplicitPrefs(cfg.implicitPrefs).setNonnegative(true)
      .setColdStartStrategy("drop").setSeed(cfg.seed)
      // Block count sized to the ratings volume, not defaultParallelism:
      // 32 blocks over ~150k ratings is all scheduling overhead. On a
      // real cluster callers raise this with data volume.
      .setNumUserBlocks(cfg.numBlocks).setNumItemBlocks(cfg.numBlocks)
      .setIntermediateStorageLevel(cfg.intermediateStorage)
      .setUserCol("userId").setItemCol("itemId").setRatingCol("rating")
      .fit(triples)

  /** M11: RMSE on a held-out split (`recommender_prod_rec.py:234-241`). */
  def evalRmse(triples: DataFrame, cfg: Config): Double = {
    val Array(train8, test2) = triples.randomSplit(Array(0.8, 0.2), cfg.seed)
    val model = train(train8, cfg)
    val pred = model.transform(test2)
    new RegressionEvaluator().setMetricName("rmse")
      .setLabelCol("rating").setPredictionCol("prediction")
      .evaluate(pred)
  }

  /** Grid search over (rank, maxIter, regParam) by held-out RMSE
    * (reference grid is a single point, `recommender_prod_rec.py:244-246`).
    */
  def gridSearch(triples: DataFrame, grid: Seq[Config]): (Config, Double) =
    grid.map(c => c -> evalRmse(triples, c)).minBy(_._2)

  /** M12 + F11/F12: top-K recommendations, exploded to rows — struct
    * field access replaces the reference's Python UDFs (§2.9).
    */
  def recommendations(model: ALSModel, k: Int): DataFrame =
    model.recommendForAllUsers(k)
      .select(col("userId"), posexplode(col("recommendations")).as(Seq("rec_rank", "rec")))
      .select(col("userId"), col("rec.itemId").as("itemId"),
        col("rec.rating").as("score"), (col("rec_rank") + 1).as("rec_rank"))

  /** [[recommendations]] fast path for SMALL item universes (the
    * engine's brand-level item space): broadcast the item factors, score
    * every (user, item) with one codegen'd float dot product, keep top-k
    * per user via WindowGroupLimit. `recommendForAllUsers` blockifies
    * both factor sides into BLAS gemm batches + per-block priority
    * queues — the right shape when ITEMS are millions, pure overhead
    * when they fit in a broadcast (measured ~4x here). Scores match
    * MLlib to float precision; ranking ties broken by itemId.
    */
  def recommendationsDirect(model: ALSModel, k: Int): DataFrame = {
    val users = model.userFactors.select(col("id").as("userId"), col("features").as("uf"))
    val items = model.itemFactors.select(col("id").as("itemId"), col("features").as("if"))
    val scored = users.join(broadcast(items))
      .select(col("userId"), col("itemId"),
        aggregate(zip_with(col("uf"), col("if"), (a, b) => a * b),
          lit(0.0f), (acc, x) => acc + x).as("score"))
    graft.ops.TopK.exactPerKey(scored, Seq("userId"),
        Seq(col("score").desc, col("itemId").asc), k, "rec_rank")
      .select(col("userId"), col("itemId"), col("score"),
        col("rec_rank").cast("int").as("rec_rank"))
  }
}
