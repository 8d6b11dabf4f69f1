package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the validation gate every
  * large-scale ingest pipeline runs before training data is trusted.
  *
  * All row-level constraints evaluate in ONE pass over the table (each
  * check is a conditional-count aggregate in the same projection — no
  * per-check scans); referential checks are anti-join counts. Output is
  * one row per check: (check, n_violations, n_rows) — tiny, joinable
  * into a run report, and SQL-oracle-able.
  */
object Quality {

  /** One named row-level constraint: `violated` flags BAD rows. */
  final case class Check(name: String, violated: Column)

  /** Evaluate row-level checks in a single aggregation pass. */
  def rowChecks(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val total = count(lit(1))
    val aggs = checks.map(c =>
      sum(when(c.violated, 1L).otherwise(0L)).as(c.name)) :+ total.as("__n")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot to (check, n_violations, n_rows)
    val pairs = checks.flatMap(c => Seq(lit(c.name), col(c.name)))
    wide.select(explode(map(pairs: _*)).as(Seq("check", "n_violations")),
      col("__n").as("n_rows"))
  }

  /** Zero-extra-pass variant: attach the checks to `df` as an
    * `observe()` metric set. The violation counts ride along with
    * WHATEVER action the caller runs next (the write, the count) —
    * validation without a second scan of a 100 TB input. Read
    * `observation.get` after the action completes.
    */
  def observed(df: DataFrame, checks: Seq[Check],
               name: String = "graft_quality"): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation(name)
    val aggs = checks.map(c =>
      sum(when(c.violated, 1L).otherwise(0L)).as(c.name)) :+ count(lit(1)).as("n_rows")
    (df.observe(obs, aggs.head, aggs.tail: _*), obs)
  }

  /** Referential-integrity violation count: rows of `child` whose
    * `fk` has no match in `parent.pk` (null FKs excluded — use a
    * row check for null-rate). Plans as a broadcast/shuffled anti join.
    */
  def fkViolations(child: DataFrame, fk: String,
                   parent: DataFrame, pk: String, name: String): DataFrame = {
    val orphans = child.filter(col(fk).isNotNull)
      .join(parent.select(col(pk)), col(fk) === col(pk), "left_anti")
    orphans.agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check"), col("n_violations"),
        lit(null).cast("long").as("n_rows"))
  }

  /** k-anonymity enforcement by full suppression: every row whose
    * quasi-identifier combination (`qiCols` — the columns an attacker
    * could link on) is shared by fewer than `k` rows gets those columns
    * nulled; rows in groups of ≥ k are released unchanged. The privacy
    * gate a person-identifiable training-data release runs before shipping
    * (k-anonymity, Sweeney 2002 — the suppression-only special case).
    *
    * Appends `grp_n` (the QI group size, pre-suppression) and
    * `suppressed`. One shuffle on the QI key (a partitioned window
    * count — no global order, parallel in the number of QI groups; at
    * 100 TB the QI key is the natural partitioner and heavy groups are
    * exactly the releasable ones, so skew is benign).
    */
  def kAnonymize(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    val clash = df.columns.toSet.intersect(Set("grp_n", "suppressed"))
    require(clash.isEmpty,
      s"kAnonymize appends grp_n/suppressed; input already has ${clash.mkString(", ")}")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(qiCols.map(col): _*)
    val withN = df.withColumn("grp_n", count(lit(1)).over(w))
    val masked = qiCols.foldLeft(withN) { (d, c) =>
      d.withColumn(c, when(col("grp_n") >= k, col(c)))
    }
    masked.withColumn("suppressed", col("grp_n") < k)
  }

  /** ε-differentially-private group counts (Laplace mechanism, Dwork
    * et al. 2006): exact per-group counts released with additive
    * Laplace(1/ε) noise — counting queries have sensitivity 1, so the
    * release satisfies ε-DP for the standard add/remove-one-row
    * neighborhood. The aggregate-statistics companion to [[kAnonymize]]
    * for training-data reporting: composition tables, source counts,
    * label distributions that must not leak any individual row.
    *
    * The noise is DETERMINISTICALLY SEEDED — u = md5-uniform(seed ‖ group)
    * via [[Sampling.hashUniform]]'s fold, then the inverse-CDF
    * transform noise = −(1/ε)·sign(u−½)·ln(1−2·|u−½|) — so results are
    * pure functions of (data, seed): reproducible across engines,
    * partitionings and reruns, and replayable by the DuckDB oracle
    * (q220) from the same md5 formula. Rotate `seed` per release; a
    * REUSED seed across overlapping releases leaks correlated noise
    * exactly like publishing twice, and the determinism means this is
    * a protocol decision, not an accident of RNG state.
    *
    * THE SEED IS PART OF THE PRIVACY BARRIER. Because the noise is a
    * pure function of (seed, group), any release consumer who learns
    * the seed can subtract the exact noise and recover exact counts —
    * the ε-DP guarantee holds only against consumers who never see the
    * seed (treat it like a key: generate per release, store with the
    * raw data's access controls, never alongside the release). True
    * randomness would make noise unrecoverable but also unreproducible
    * and un-oracle-able; this engine chooses replayability and states
    * the resulting trust boundary.
    *
    * GROUP PRESENCE IS ITSELF A SECRET when the group domain is not
    * public: with `domain = None` only non-empty groups are emitted,
    * so a group's appearance in the release reveals ≥ 1 row existed —
    * a direct, un-noised disclosure if that group could be one person.
    * Pass `domain` (the PUBLIC list of releasable group keys, e.g. the
    * fixed label vocabulary or region list) and every domain group is
    * released with noise whether empty or not, closing the presence
    * channel; groups outside the domain are dropped (they were not
    * releasable anyway).
    *
    * One hash shuffle on the group keys (partial-aggregated counts);
    * the noise is a per-GROUP projection after aggregation — zero
    * extra exchange, vocabulary-scale rows. The domain join is a
    * broadcast (domains are vocabulary-sized by construction).
    *
    * @param domain optional PUBLIC group domain: a frame with exactly
    *        `groupCols`; when set, the release has one row per domain
    *        key (empty groups get noise around 0) and is restricted to
    *        the domain
    * @return group keys + `noisy_count` (rounded to 6; may be negative
    *         or fractional — the unbiased raw release; clamp/round
    *         downstream if the consumer needs integers)
    */
  def dpGroupCounts(df: DataFrame, groupCols: Seq[String], epsilon: Double,
                    seed: Long, domain: Option[DataFrame] = None): DataFrame = {
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    domain.foreach { d =>
      require(d.columns.toSeq == groupCols,
        s"domain columns ${d.columns.toSeq} must equal groupCols $groupCols")
    }
    val key = concat_ws("|", lit(seed.toString) +: groupCols.map(c => col(c).cast("string")): _*)
    val u = Sampling.hashUniform(key)
    val noise = -(lit(1.0) / epsilon) * signum(u - 0.5) *
      log(lit(1.0) - lit(2.0) * abs(u - 0.5))
    val counts = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    val based = domain match {
      case None => counts
      case Some(d) => broadcast(d.distinct())
        .join(counts, groupCols, "left")
        .withColumn("__n", coalesce(col("__n"), lit(0L)))
    }
    based.select(groupCols.map(col) :+
      round(col("__n") + noise, 6).as("noisy_count"): _*)
  }

  /** Benford first-significant-digit expectation, scaled 10⁻⁹
    * (p_d = log10(1 + 1/d)) — FIXED integer literals shared with any
    * SQL twin, so the audit's arithmetic is exact end to end; the
    * irrational logs are frozen here once, not recomputed by either
    * engine.
    */
  val BenfordP9: Seq[Long] = Seq(301029996L, 176091259L, 124938737L,
    96910013L, 79181246L, 66946790L, 57991947L, 51152522L, 45757491L)

  /** Benford's-law audit of a positive integer-grained column — the
    * classic forensic screen for fabricated or truncated numeric data
    * (Benford 1938; Nigrini's fraud-audit practice): multi-decade
    * natural amounts put digit d first with probability log10(1+1/d),
    * and a chi-square against that expectation flags synthetic,
    * capped, or re-priced populations. Counts are exact (one
    * map-side-combinable aggregate over the column); the expected
    * masses ride the frozen [[BenfordP9]] integers, so both the
    * chi-square readout and its decision input (obs·10⁹ − n·p_d) are
    * engine-replayable; only the final display division is a double.
    *
    * ALWAYS 9 rows: observed counts join onto a fixed 1..9 digit spine
    * with observed = 0 for absent digits — a digit that never occurs
    * is the STRONGEST fraud signal (its full n·p_d mass lands in the
    * chi-square), so an observed-only frame that silently dropped its
    * term would understate the statistic exactly where it matters
    * (r17 advice).
    *
    * @return 9 rows: digit, observed, expected_fp (count × 10⁹ scale),
    *         chi2_term (6 dp); plus the caller sums chi2_term against
    *         the df=8 critical value
    */
  def benford(df: DataFrame, valCol: String): DataFrame = {
    val v = df.select(col(valCol).cast("long").as("v")).filter(col("v") > 0)
    val observed = v
      .select(substring(col("v").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("observed"))
    val spine = v.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"))
    val digits = spine.join(observed, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("observed"), lit(0L)).as("observed"))
    val pLit = BenfordP9.zipWithIndex
      .map { case (p, i) => s"when digit = ${i + 1} then ${p}L" }
      .mkString("case ", " ", " end")
    digits
      .crossJoin(broadcast(v.agg(count(lit(1)).as("n"))))
      .withColumn("p9", expr(pLit))
      // expected count at 10^9 scale — exact long/decimal product
      .withColumn("expected_fp",
        col("n").cast("decimal(38,0)") * col("p9"))
      // chi2 term (obs - n·p)^2 / (n·p): numerator exact at 10^9 scale,
      // one double division at the readout
      .withColumn("chi2_term", round(expr(
        """cast((cast(observed as decimal(38,0)) * 1000000000 - expected_fp)
                * (cast(observed as decimal(38,0)) * 1000000000 - expected_fp)
                as double)
           / (cast(expected_fp as double) * 1000000000.0)"""), 6))
      .select(col("digit"), col("observed"),
        col("expected_fp").cast("long").as("expected_fp"),
        col("chi2_term"))
      .orderBy("digit")
  }
}
