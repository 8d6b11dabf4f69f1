package graft.queries

/** DuckDB twin of [[graft.engine.expressions.QuantileSketch]]'s read
  * path, generated rather than hand-unrolled (the q266 discipline —
  * builder-authored CTE chains so the level count cannot drift from
  * the engine's constant). Callers define a `vals(<groupCols...>, v)`
  * CTE upstream (v already clamped to [0, 65535] with the SAME
  * least/greatest the sketch applies), splice in [[ctes]], and select
  * from `st0`, which carries one row per (group, phi): the exact n,
  * the integer rank target t = ceil(phi·n/100), and the descent
  * result s (the estimated quantile value).
  *
  * The rebuild is cell-for-cell the aggregate's definition: exact
  * per-(level, prefix) counts; hashed levels (< 6) re-bucket each
  * prefix with the md5("r:level:prefix") recipe and sum; identity
  * levels read the exact count. The descent then unrolls domainBits
  * CTE steps of the same integer CASE walk the engine folds with
  * `aggregate` — every op integer, so the gate is a full hash match.
  */
private[queries] object QuantileOracle {

  private val DomainBits = 16
  private val HashedLevels = 6 // DomainBits - log2(Width)
  private val Width = 1024
  private val Depth = 3

  /** The grid-rebuild CTEs `nn, pfx, hcell` shared by the descent
    * ([[ctes]]) and the literal-decomposition rank oracle
    * ([[rankCtes]]).
    */
  private def gridCtes(g: Seq[String]): Seq[String] = {
    def cols(a: String) =
      if (g.isEmpty) "" else g.map(c => s"$a.$c").mkString(", ") + ", "
    def bare = if (g.isEmpty) "" else g.mkString(", ") + ", "
    def byFirst(k: Int) = (1 to k).mkString(", ")

    // count(v) / WHERE v IS NOT NULL: the sketch's imperative fold
    // skips NULL inputs, so the oracle's n (hence every rank target)
    // and every grid cell must share that null-skipping semantics —
    // count(*) would diverge on the first NULL row.
    val nn =
      if (g.isEmpty) "nn AS (SELECT CAST(count(v) AS BIGINT) AS n FROM vals)"
      else s"nn AS (SELECT ${g.mkString(", ")}, CAST(count(v) AS BIGINT) AS n " +
        s"FROM vals GROUP BY ${byFirst(g.size)})"

    val pfx = s"""pfx AS MATERIALIZED (
      SELECT ${bare}lv.lvl, v >> lv.lvl AS p, CAST(count(*) AS BIGINT) AS c
      FROM vals CROSS JOIN (SELECT unnest(range(0, $DomainBits)) AS lvl) lv
      WHERE v IS NOT NULL
      GROUP BY ${byFirst(g.size + 2)})"""

    val hcell = s"""hcell AS MATERIALIZED (
      SELECT ${cols("p")}p.lvl, rw.r,
             ('0x' || substr(md5(CAST(rw.r AS VARCHAR) || ':' ||
               CAST(p.lvl AS VARCHAR) || ':' || CAST(p.p AS VARCHAR)),
               1, 15))::BIGINT % $Width AS b,
             CAST(sum(p.c) AS BIGINT) AS cv
      FROM pfx p CROSS JOIN (SELECT unnest(range(0, $Depth)) AS r) rw
      WHERE p.lvl < $HashedLevels
      GROUP BY ${byFirst(g.size + 3)})"""

    Seq(nn, pfx, hcell)
  }

  /** Point-estimate SQL at a LITERAL (level, prefix) — identity levels
    * read the exact pfx cell; hashed levels take the min of depth
    * md5-bucket lookups whose md5 arguments are full literals.
    */
  private def estLiteral(l: Int, p: Long): String =
    if (l >= HashedLevels)
      s"coalesce((SELECT p2.c FROM pfx p2 WHERE p2.lvl = $l AND p2.p = $p), 0)"
    else
      "least(" + (0 until Depth).map { r =>
        s"coalesce((SELECT hc.cv FROM hcell hc WHERE hc.lvl = $l " +
          s"AND hc.r = $r AND hc.b = ('0x' || " +
          s"substr(md5('$r:$l:$p'), 1, 15))::BIGINT % $Width), 0)"
      }.mkString(", ") + ")"

  /** The canonical dyadic decomposition of [0, x] — the literal
    * (level, prefix) pieces [[graft.engine.expressions.QuantileSketch.rank]]
    * folds at runtime, precomputed here because the oracle's probes
    * are constants.
    */
  private[queries] def rankPieces(x: Long): Seq[(Int, Long)] = {
    val b = x + 1
    (DomainBits - 1 to 0 by -1)
      .filter(l => ((b >> l) & 1L) == 1L)
      .map(l => (l, 2L * (b >> (l + 1))))
  }

  /** CTE chain `nn, pfx, hcell, rk` for GLOBAL rank probes at literal
    * points: rk(probe, est_rank) with est_rank the sum of the probe's
    * literal decomposition pieces — no descent needed.
    */
  def rankCtes(probes: Seq[Long]): String = {
    require(probes.forall(x => x >= 0 && x < (1L << DomainBits) - 1),
      "rank probes must sit strictly inside the domain")
    val rows = probes.map { x =>
      val sum = rankPieces(x).map { case (l, p) => estLiteral(l, p) }
        .mkString(" + ")
      s"SELECT CAST($x AS BIGINT) AS probe, CAST($sum AS BIGINT) AS est_rank"
    }.mkString("\n      UNION ALL ")
    (gridCtes(Nil) :+ s"rk AS (\n      $rows)").mkString(",\n      ")
  }

  /** CTE chain `nn, pfx, hcell, tgt, st16..st0` (no WITH keyword, no
    * leading/trailing comma) over an upstream `vals` CTE.
    *
    * @param groupCols vals' group columns (empty = one global sketch)
    * @param phis      integer percents, e.g. Seq(50, 90, 99)
    */
  def ctes(groupCols: Seq[String], phis: Seq[Int]): String = {
    val g = groupCols
    def cols(a: String) =
      if (g.isEmpty) "" else g.map(c => s"$a.$c").mkString(", ") + ", "
    def bare = if (g.isEmpty) "" else g.mkString(", ") + ", "
    def gMatch(a: String) = g.map(c => s" AND $a.$c = st.$c").mkString

    val tgt = s"""tgt AS (
      SELECT ${cols("nn")}ph.phi_pct, nn.n,
             (ph.phi_pct * nn.n + 99) // 100 AS t
      FROM nn CROSS JOIN (SELECT unnest([${phis.mkString(", ")}]) AS phi_pct) ph)"""

    val st16 = s"st$DomainBits AS (SELECT *, CAST(0 AS BIGINT) AS c, " +
      "CAST(0 AS BIGINT) AS s FROM tgt)"

    val steps = (DomainBits - 1 to 0 by -1).map { l =>
      val e =
        if (l >= HashedLevels)
          s"coalesce((SELECT p2.c FROM pfx p2 WHERE p2.lvl = $l " +
            s"AND p2.p = (st.s >> $l)${gMatch("p2")}), 0)"
        else
          "least(" + (0 until Depth).map { r =>
            s"coalesce((SELECT hc.cv FROM hcell hc WHERE hc.lvl = $l " +
              s"AND hc.r = $r${gMatch("hc")} AND hc.b = ('0x' || " +
              s"substr(md5('$r:$l:' || CAST(st.s >> $l AS VARCHAR)), 1, 15)" +
              s")::BIGINT % $Width), 0)"
          }.mkString(", ") + ")"
      s"""st$l AS (
      SELECT ${bare}phi_pct, n, t,
             CASE WHEN c + e >= t THEN c ELSE c + e END AS c,
             CASE WHEN c + e >= t THEN s ELSE s + (CAST(1 AS BIGINT) << $l) END AS s
      FROM (SELECT st.*, $e AS e FROM st${l + 1} st))"""
    }

    (gridCtes(g) ++ Seq(tgt, st16) ++ steps).mkString(",\n      ")
  }
}
