package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve for multi-dimensional data clustering.
  *
  * The layout lever the reference leaves on the table: its parquet is
  * written in arrival order (`src/search_ranking_peers.py:161-164` reads
  * whatever landed), so a scan filtered on ANY key reads every file.
  * Sorting by one key prunes that key only; interleaving the bits of two
  * keys gives a total order in which every contiguous run of rows is a
  * small rectangle in (x, y) space — file-level min/max statistics then
  * prune scans filtered on EITHER dimension (the Delta/Iceberg OPTIMIZE
  * ZORDER idea, public since Tarin Gamberini's Morton-order literature
  * and the Databricks/Iceberg docs).
  *
  * Pure column arithmetic (shifts + masks), whole-stage-codegen'd, no
  * UDF; the same formula is emitted as ANSI SQL for the DuckDB oracle by
  * [[zValueSql]] — one source of truth for both engines.
  */
object ZOrder {

  /** Interleave the low `bits` bits of x (even positions) and y (odd
    * positions) into a z-value: z = Σ_i x_i·4^i·1 + y_i·4^i·2.
    * Inputs are masked to `bits` bits first, so callers bound the
    * domain explicitly (e.g. `pmod(key, 1024)` for 10 bits).
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits in [1,31], got $bits")
    val xs = x.cast("long").bitwiseAND(lit((1L << bits) - 1))
    val ys = y.cast("long").bitwiseAND(lit((1L << bits) - 1))
    (0 until bits).map { i =>
      val xb = shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i)
      val yb = shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xb + yb
    }.reduce(_ + _)
  }

  /** The same z-value as a DuckDB SQL expression over column names —
    * generated from the identical bit positions so the oracle cannot
    * drift from the Spark side.
    */
  def zValueSql(x: String, y: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits in [1,31], got $bits")
    val mask = (1L << bits) - 1
    val terms = (0 until bits).flatMap { i =>
      Seq(
        s"(((CAST($x AS BIGINT) & $mask) >> $i) & 1) * ${1L << (2 * i)}",
        s"(((CAST($y AS BIGINT) & $mask) >> $i) & 1) * ${1L << (2 * i + 1)}")
    }
    terms.mkString("(", " + ", ")")
  }
}
