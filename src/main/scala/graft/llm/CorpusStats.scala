package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level statistical diagnostics. The reference pipeline
  * (`prod-recommendation-pyspark`) has no corpus analytics at all;
  * these are the health checks a 100 TB training-data pipeline runs
  * AFTER curation (q104-q145 filter documents; this family asks
  * whether what survived still looks like natural language).
  */
object CorpusStats {

  /** Zipf's-law fit: OLS of ln(frequency) on ln(rank) over the whole
    * vocabulary. Natural text slopes near −1 (Zipf 1949); a corpus
    * whose slope drifts far from it after curation is a red flag —
    * too shallow means boilerplate flooding the head, too steep means
    * deduplication ate the tail.
    *
    * Determinism discipline — the axes are LOGS, so their sums would
    * be unordered float accumulation (engine-dependent addend order).
    * Instead both coordinates are FIXED-POINT longs, x = round(1e6 ·
    * ln rank), y = round(1e6 · ln freq): ln of an exact integer is one
    * correctly-rounded libm call on each engine, the 1e6 quantization
    * forgives sub-1e-6 library disagreement everywhere except a
    * measure-zero boundary set, and from there every moment
    * (Σx, Σy, Σxy, Σx²) is an EXACT integer sum in 128-bit/decimal(38)
    * arithmetic — partial-aggregated, order-free. The slope is scale
    * invariant (both axes carry the same 1e6), the intercept rescales
    * by 1e6 once; each is a fixed float expression over exact
    * integers, rounded once at 6 (the q244 discipline).
    *
    * Ranks come from [[graft.ops.GlobalRank.withRowNumber]] (sort +
    * zipWithIndex), NOT an unpartitioned window — vocabulary is
    * Heaps-sublinear but still millions of types at corpus scale, and
    * a single-task window over it is exactly the funnel the op
    * exists to avoid. Ties rank deterministically by (freq desc,
    * token asc).
    *
    * A single-type vocabulary has no x-variance; the fit degenerates
    * to slope 0 / intercept = mean ln freq rather than NaN.
    *
    * @return one row: (n_types, n_tokens, slope, intercept)
    */
  def zipfFit(docs: DataFrame, textCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val counts = docs
      .select(explode(TextOps.tokenize(col(textCol))).as("__tok"))
      .groupBy(col("__tok")).agg(count(lit(1)).as("__n"))
    val ranked = graft.ops.GlobalRank.withRowNumber(
      counts, "__rnk", Seq(col("__n").desc, col("__tok").asc))
    val fixed = ranked.select(
      round(log(col("__rnk").cast("double")) * 1e6, 0).cast("long").as("__x"),
      round(log(col("__n").cast("double")) * 1e6, 0).cast("long").as("__y"),
      col("__n"))
    val s = fixed.agg(
      count(lit(1)).as("n_types"), sum(col("__n")).as("n_tokens"),
      sum(col("__x").cast(dec)).as("__sx"),
      sum(col("__y").cast(dec)).as("__sy"),
      sum(col("__x").cast(dec) * col("__y").cast(dec)).as("__sxy"),
      sum(col("__x").cast(dec) * col("__x").cast(dec)).as("__sxx"))
    val num = (col("n_types").cast(dec) * col("__sxy") -
      col("__sx") * col("__sy")).cast("double")
    val den = (col("n_types").cast(dec) * col("__sxx") -
      col("__sx") * col("__sx")).cast("double")
    val slope = when(den === 0.0, 0.0).otherwise(num / den)
    s.select(col("n_types"), col("n_tokens"),
      round(slope, 6).as("slope"),
      round((col("__sy").cast("double") - slope * col("__sx").cast("double")) /
        (col("n_types").cast("double") * 1e6), 6).as("intercept"))
  }
}
