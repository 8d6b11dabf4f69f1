package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CUPED — Controlled-experiment Using Pre-Experiment Data (Deng, Xu,
  * Kohavi & Walker, WSDM 2013): adjust each unit's outcome by its
  * pre-period covariate, Y′ = Y − θ(X − X̄) with θ = cov(X,Y)/var(X),
  * so persistent per-unit level differences cancel out of the arm
  * comparison and the experiment's variance drops by the factor
  * (1 − ρ²) — the standard sensitivity lever of large experimentation
  * platforms, where weeks of extra traffic are the alternative.
  *
  * Determinism discipline: inputs are exact integer fixed point; all
  * moments accumulate in decimal(38,0) (sums of squares overflow Long
  * at plausible unit counts), and θ, the per-arm means, and the
  * adjustment term ride positivity-offset floor divisions — an
  * external engine replays every intermediate bit for bit (HUGEINT
  * `//` twins Spark's decimal `div` on the offset-positive
  * numerators). Scale shape: one aggregate over units for the pooled
  * moments, one two-group aggregate for the arms — nothing after the
  * per-unit frame is larger than a handful of rows.
  */
object Cuped {

  /** Adjusted arm-1 − arm-2 mean-outcome difference. Input: one row
    * per unit with `arm` ∈ {1, 2} and exact integer `x` (pre-period
    * covariate) / `y` (outcome). Fixed point: θ at 10⁶, means at 10⁶ ×
    * the input unit. Returns one row:
    * (n1, n2, theta_fp, raw_diff_fp, adj_diff_fp).
    */
  def adjustedDiff(per: DataFrame, armCol: String, xCol: String,
                   yCol: String): DataFrame = {
    val p = per.select(col(armCol).as("arm"), col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y"))
    val theta = p.agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(col("x")).cast("decimal(38,0)").as("sx"),
      sum(col("y")).cast("decimal(38,0)").as("sy"),
      sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
      sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"))
      // var(x)=0 (constant covariate) must FAIL, not null: Spark's
      // decimal div would yield a silent NULL row here while an exact
      // replay in another engine (the DuckDB oracle) raises a
      // division-by-zero error — fail fast so both engines agree on
      // degenerate input (r16 advice).
      .select(expr("""case when (n * sxx - sx * sx) <= 0
                      then cast(raise_error(
                        'CUPED requires var(x) > 0: constant pre-period covariate')
                        as decimal(38,0))
                      else (((n * sxy - sx * sy) * 1000000
                             + (n * sxx - sx * sx) * 1000000000000)
                            div (n * sxx - sx * sx)) - 1000000000000 end""")
        .as("theta_fp"))
    val wide = p.groupBy("arm")
      .agg(count(lit(1)).as("na"), sum("x").as("sxa"), sum("y").as("sya"))
      // sums are offset-lifted so negative covariates/outcomes still
      // floor-divide identically across engines
      .select(col("arm"), col("na"),
        expr("""(cast(sxa as decimal(38,0)) * 1000000
                 + cast(na as decimal(38,0)) * 10000000000000000) div na
                - 10000000000000000""").as("mx"),
        expr("""(cast(sya as decimal(38,0)) * 1000000
                 + cast(na as decimal(38,0)) * 10000000000000000) div na
                - 10000000000000000""").as("my"))
      .agg(max(when(col("arm") === 1, col("na"))).as("n1"),
        max(when(col("arm") === 2, col("na"))).as("n2"),
        (max(when(col("arm") === 1, col("my")))
          - max(when(col("arm") === 2, col("my")))).as("dy"),
        (max(when(col("arm") === 1, col("mx")))
          - max(when(col("arm") === 2, col("mx")))).as("dx"))
    wide.crossJoin(broadcast(theta))
      .withColumn("adj_term",
        expr("""((cast(theta_fp as decimal(38,0)) * dx
                  + cast(1000000000000000 as decimal(38,0)) * 1000000)
                 div 1000000) - 1000000000000000"""))
      .select(col("n1"), col("n2"), col("theta_fp").cast("long").as("theta_fp"),
        col("dy").cast("long").as("raw_diff_fp"),
        (col("dy") - col("adj_term")).cast("long").as("adj_diff_fp"))
  }

  /** Difference-in-differences — the quasi-experimental panel
    * estimator (Card & Krueger 1994 canonical form): when assignment
    * is NOT randomized, the treated−control gap confounds with
    * pre-existing level differences; under parallel trends the
    * interaction δ = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre)
    * removes both group levels and the common period shock. The
    * complement of [[adjustedDiff]]: CUPED needs randomized arms and
    * reduces variance; DiD needs no randomization and removes bias.
    *
    * Same exactness discipline: one two-key aggregate over rows, four
    * cell means via positivity-offset floor division in decimal(38,0),
    * δ as their exact integer combination.
    *
    * @return one row: n_t_pre, n_t_post, n_c_pre, n_c_post,
    *         pre_gap_fp, post_gap_fp, did_fp (value units × 10⁶)
    */
  def diffInDiff(rows: DataFrame, groupCol: String, postCol: String,
                 yCol: String): DataFrame = {
    val cells = rows.select(col(groupCol).cast("int").as("g"),
        col(postCol).cast("int").as("p"), col(yCol).cast("long").as("y"))
      .groupBy("g", "p")
      .agg(count(lit(1)).as("n"), sum(col("y")).cast("decimal(38,0)").as("s"))
      .withColumn("m_fp", expr(
        """(s * 1000000 + cast(n as decimal(38,0)) * 10000000000000000) div n
           - 10000000000000000"""))
    cells.agg(
        max(when(col("g") === 1 && col("p") === 0, col("n"))).as("n_t_pre"),
        max(when(col("g") === 1 && col("p") === 1, col("n"))).as("n_t_post"),
        max(when(col("g") === 0 && col("p") === 0, col("n"))).as("n_c_pre"),
        max(when(col("g") === 0 && col("p") === 1, col("n"))).as("n_c_post"),
        max(when(col("g") === 1 && col("p") === 0, col("m_fp"))).as("mtp0"),
        max(when(col("g") === 1 && col("p") === 1, col("m_fp"))).as("mtp1"),
        max(when(col("g") === 0 && col("p") === 0, col("m_fp"))).as("mcp0"),
        max(when(col("g") === 0 && col("p") === 1, col("m_fp"))).as("mcp1"))
      // all four cells must exist: a missing one silently NULLs delta
      // where a SQL replay may instead surface an empty aggregate —
      // the family's fail-fast parity rule
      .select(
        expr("""case when n_t_pre is null or n_t_post is null
                       or n_c_pre is null or n_c_post is null
                then cast(raise_error(
                  'diffInDiff: all four group x period cells must be non-empty')
                  as bigint)
                else n_t_pre end""").as("n_t_pre"),
        col("n_t_post"), col("n_c_pre"), col("n_c_post"),
        (col("mtp0") - col("mcp0")).cast("long").as("pre_gap_fp"),
        (col("mtp1") - col("mcp1")).cast("long").as("post_gap_fp"),
        ((col("mtp1") - col("mtp0")) - (col("mcp1") - col("mcp0")))
          .cast("long").as("did_fp"))
  }
}
