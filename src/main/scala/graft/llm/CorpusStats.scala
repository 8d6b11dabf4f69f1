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
    val counts = docs
      .select(explode(TextOps.tokenize(col(textCol))).as("__tok"))
      .groupBy(col("__tok")).agg(count(lit(1)).as("__n"))
    rankSizeFit(counts, "__n", "__tok", "n_types",
      Seq(sum(col("__n")) -> "n_tokens"))
  }

  /** General rank-size law fit (Gabaix QJE'99 discipline: rank the
    * units by a positive integer size, fit ln(size) on ln(rank)) — the
    * same estimator as [[zipfFit]] with the unit left to the caller:
    * customers by order count, suppliers by shipment count, hosts by
    * document count. Slope near −1 = a Zipfian workload whose head
    * dominates (the regime where [[graft.ops.SkewProfile]]'s hub
    * routing pays for itself); a shallow slope = a balanced workload.
    * Same fixed-point-log exact-moment determinism; ranks via
    * GlobalRank; ties broken by `tieCol` ascending.
    *
    * @return one row: (countName, extras…, slope, intercept)
    */
  def rankSizeFit(units: DataFrame, sizeCol: String, tieCol: String,
                  countName: String = "n_units",
                  extras: Seq[(org.apache.spark.sql.Column, String)] = Seq.empty)
  : DataFrame = {
    val ranked = graft.ops.GlobalRank.withRowNumber(
      units, "__rnk", Seq(col(sizeCol).desc, col(tieCol).asc))
    fixedLogOls(ranked, col("__rnk"), col(sizeCol), countName, extras)
  }

  /** Heaps'-law fit: OLS of ln(cumulative vocabulary) on ln(cumulative
    * tokens) over the doc-id-ordered corpus prefix curve — the
    * companion diagnostic to [[zipfFit]] (natural text grows V ≈ K·N^β
    * with β ≈ 0.4–0.6; a near-1 slope after curation means the corpus
    * is still absorbing boilerplate/noise vocabularies, near-0 means
    * dedup collapsed its sources).
    *
    * Distributed construction of the prefix curve: each type's FIRST
    * document (one min-aggregate), new-type counts per document (one
    * count), then both cumulative sums ride
    * [[graft.ops.PrefixSum.withRunningSum]] — never an unpartitioned
    * running-sum window over the corpus. The fit is the same
    * fixed-point-log exact-moment OLS as [[zipfFit]].
    *
    * @return one row: (n_docs, slope, intercept)
    */
  def heapsFit(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("__doc"),
      TextOps.tokenize(col(textCol)).as("__t"))
    val perDoc = toks.select(col("__doc"), size(col("__t")).cast("long").as("__ntok"))
    val firstDoc = toks.select(col("__doc"), explode(col("__t")).as("__tok"))
      .groupBy(col("__tok")).agg(min(col("__doc")).as("__fd"))
    val newPerDoc = firstDoc.groupBy(col("__fd").as("__doc"))
      .agg(count(lit(1)).as("__nnew"))
    val joined = perDoc.join(newPerDoc, Seq("__doc"), "left")
      .select(col("__doc"), col("__ntok"),
        coalesce(col("__nnew"), lit(0L)).as("__nnew"))
    val withN = graft.ops.PrefixSum.withRunningSum(
      joined, "__ntok", "__cn0", Seq(col("__doc")))
    val withV = graft.ops.PrefixSum.withRunningSum(
      withN, "__nnew", "__cv0", Seq(col("__doc")))
    val curve = withV.select(
      (col("__cn0") + col("__ntok")).as("__cn"),
      (col("__cv0") + col("__nnew")).as("__cv"))
      .filter(col("__cn") >= 1 && col("__cv") >= 1)
    fixedLogOls(curve, col("__cn"), col("__cv"), "n_docs", Seq.empty)
  }

  /** Shared exact-moment OLS of ln(yRaw) on ln(xRaw): quantize both
    * logs to 1e6 fixed-point longs, accumulate Σx/Σy/Σxy/Σx² as exact
    * decimal(38) integer sums, emit (countName, extras…, slope,
    * intercept) — the single definition of the determinism discipline
    * both fits share.
    */
  private def fixedLogOls(pts: DataFrame,
                          xRaw: org.apache.spark.sql.Column,
                          yRaw: org.apache.spark.sql.Column,
                          countName: String,
                          extras: Seq[(org.apache.spark.sql.Column, String)])
  : DataFrame = {
    val dec = "decimal(38,0)"
    val fixed = pts.withColumn("__x",
        round(log(xRaw.cast("double")) * 1e6, 0).cast("long"))
      .withColumn("__y",
        round(log(yRaw.cast("double")) * 1e6, 0).cast("long"))
    val s = fixed.agg(
      count(lit(1)).as(countName),
      extras.map { case (c, n) => c.as(n) } ++ Seq(
        sum(col("__x").cast(dec)).as("__sx"),
        sum(col("__y").cast(dec)).as("__sy"),
        sum(col("__x").cast(dec) * col("__y").cast(dec)).as("__sxy"),
        sum(col("__x").cast(dec) * col("__x").cast(dec)).as("__sxx")): _*)
    val num = (col(countName).cast(dec) * col("__sxy") -
      col("__sx") * col("__sy")).cast("double")
    val den = (col(countName).cast(dec) * col("__sxx") -
      col("__sx") * col("__sx")).cast("double")
    val slope = when(den === 0.0, 0.0).otherwise(num / den)
    s.select(Seq(col(countName)) ++ extras.map { case (_, n) => col(n) } ++
      Seq(round(slope, 6).as("slope"),
        round((col("__sy").cast("double") - slope * col("__sx").cast("double")) /
          (col(countName).cast("double") * 1e6), 6).as("intercept")): _*)
  }
}
