package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Largest-remainder (Hamilton) apportionment: split an integer
  * `budget` across keys proportionally to integer weights, exactly.
  * Every key gets floor(budget·w/Σw); the Σ leftover units (< #keys)
  * go one each to the largest fractional remainders (ties by key asc).
  * Guarantees: allocations sum to EXACTLY `budget`, and each is within
  * one unit of its real-valued quota — the standard way a curation run
  * turns "mix sources 37.2% / 41.5% / 21.3%" into whole documents or
  * shard counts without drift (q205; complements q127's greedy
  * selection and q169's temperature resampling).
  *
  * All arithmetic is integer (base = (budget·w) div Σw, remainder =
  * (budget·w) mod Σw) so any engine replays it bit-for-bit. The
  * ranking window is unpartitioned BUT runs on the key-level frame
  * (one row per key — vocabulary scale, the q151 caveat), never on
  * data rows. budget·w must fit a long (enforced by a fail-fast
  * multiplyHigh overflow check on budget·Σw, which bounds every
  * per-row product) — at 100 TB token weights, allocate in units
  * (thousands of docs, whole shards) rather than raw tokens, or
  * pre-divide weights by their gcd.
  */
object Allocate {

  def largestRemainder(weights: DataFrame, keyCol: String, weightCol: String,
                       budget: Long): DataFrame = {
    val tot = weights.agg(sum(col(weightCol)).cast("long").as("__tw"))
    // fail fast on Σw = 0 (or an empty input, where sum is null):
    // div/mod by zero would silently NULL every allocation, breaking
    // the sums-to-budget guarantee downstream
    val twRow = tot.head
    val tw = if (twRow.isNullAt(0)) 0L else twRow.getLong(0)
    require(tw > 0, s"largestRemainder needs positive total weight, got $tw")
    require(budget >= 0, s"largestRemainder needs a nonnegative budget, got $budget")
    // budget·w rides on exact long arithmetic; w ≤ Σw, so checking
    // budget·Σw covers every per-row product. multiplyHigh sees the
    // wrap the doc comment could only warn about — fail fast instead
    // of silently corrupting every allocation.
    require(java.lang.Math.multiplyHigh(budget, tw) == 0 && budget * tw >= 0,
      s"budget*totalWeight overflows Long (budget=$budget, totalWeight=$tw) — " +
        "allocate in coarser units (shards/thousands) or pre-divide weights by their gcd")
    // `div`, not `/`: Spark's / is always DOUBLE division — exactness
    // here rides on integral div/mod end to end
    val based = weights.crossJoin(broadcast(tot))
      .select(col(keyCol), col(weightCol).cast("long").as("__w"), col("__tw"))
      .select(col(keyCol), col("__w"),
        expr(s"($budget * __w) div __tw").as("__base"),
        expr(s"($budget * __w) % __tw").as("__rem"))
    val leftover = based.agg((lit(budget) - sum(col("__base"))).as("__lo"))
    based.crossJoin(broadcast(leftover))
      .withColumn("__rk",
        row_number().over(Window.orderBy(col("__rem").desc, col(keyCol).asc)))
      .select(col(keyCol), col("__w").as("weight"),
        (col("__base") + when(col("__rk") <= col("__lo"), 1L).otherwise(0L))
          .as("alloc"))
  }
}
