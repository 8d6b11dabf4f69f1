package graft.engine.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, element_at, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sign-random-projection LSH signature of a unit vector, plus its
  * `nProbe` multi-probe perturbations, in ONE pass over the array.
  *
  * Semantically identical to the higher-order-function formulation it
  * replaces (per bit `j`: `aggregate(zip_with(ne, sequence(0, n-1),
  * (x, i) -> ±x by pmod(xxhash64(j, i), 2)), 0.0, +)`, then flip the
  * `nProbe` lowest-|margin| bits one at a time), but:
  *  - the ±1 hyperplane sign depends only on (bit, dimension), so it is
  *    computed ONCE per operator instance — by evaluating the very same
  *    Catalyst `XxHash64(Seq(Literal(j), Literal(i)), 42L)` the lambda
  *    ran per element — and cached, instead of two xxhash64 evaluations
  *    per element × per bit × per ROW,
  *  - one compiled traversal accumulates all `nBits` signed sums
  *    (element order per bit is unchanged, so the IEEE-754 partial sums
  *    — and therefore every signature bit — are bit-identical),
  *  - higher-order functions are interpreted (no whole-stage codegen);
  *    at real widths (1024-dim × 16 bits) the old form is ~32k
  *    interpreted expression evaluations per row, this is one compiled
  *    multiply-add loop,
  *  - emitting base + probes from ONE expression sidesteps the
  *    CollapseProject re-evaluation hazard documented on
  *    [[MinHashSignatures]] (an `element_at(sums, j)` per bit would be
  *    collapsed into `nBits` copies of the whole sum loop).
  *
  * Output: array of (1 + nProbe) signature strings; element 1 is the
  * unflipped base signature (`nProbe = 0` → just the base). Rows whose
  * embedding is empty or contains a null element return null — such
  * rows produced no verified pair under the old form either (their
  * exact-dot cosine was null and failed the threshold), so pair-level
  * results are unchanged.
  *
  * CodegenFallback: one boxed call per row around a compiled loop; the
  * loop dominates.
  *
  * Reference behavior mirrored: embedding near-dup banding per
  * prod-recommendation-pyspark's candidate generation
  * (`search_ranking_peers.py`), re-expressed as sign-LSH per Charikar
  * (STOC'02) + Lv et al. (VLDB'07) multi-probe.
  */
case class HyperplaneProbes(child: Expression, nBits: Int, nProbe: Int)
    extends UnaryExpression with CodegenFallback {

  require(nBits > 0, s"nBits must be positive, got $nBits")
  require(nProbe >= 0 && nProbe <= nBits, s"nProbe must be in [0, $nBits]")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "hyperplane_probes"

  /** Null even for non-null children: empty arrays and arrays with null
    * elements evaluate to null (see nullSafeEval), so the default
    * child.nullable would violate Catalyst's nullability contract when
    * the input column is non-nullable.
    */
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  /** signs(j)(i) = ±1.0, grown monotonically to the widest row seen. */
  @transient private var signCache: Array[Array[Double]] = _

  private def signs(dim: Int): Array[Array[Double]] = {
    var c = signCache
    if (c == null || c(0).length < dim) {
      c = Array.tabulate(nBits) { j =>
        Array.tabulate(dim) { i =>
          val h = XxHash64(Seq(Literal(j), Literal(i)), 42L)
            .eval(null).asInstanceOf[Long]
          if (((h % 2) + 2) % 2 == 0) 1.0 else -1.0 // pmod(h, 2) == 0 -> +x
        }
      }
      signCache = c
    }
    c
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    var e = 0
    while (e < n) {
      if (arr.isNullAt(e)) return null
      e += 1
    }
    val sg = signs(n)
    val sums = new Array[Double](nBits)
    e = 0
    while (e < n) {
      val x = arr.getDouble(e)
      var j = 0
      while (j < nBits) { sums(j) += sg(j)(e) * x; j += 1 }
      e += 1
    }
    val baseChars = new Array[Char](nBits)
    var j = 0
    while (j < nBits) { baseChars(j) = if (sums(j) > 0) '1' else '0'; j += 1 }
    val out = new Array[AnyRef](1 + nProbe)
    out(0) = UTF8String.fromString(new String(baseChars))
    if (nProbe > 0) {
      // flip order = struct sort by (|margin|, bit) ascending — the same
      // lexicographic struct ordering array_sort used in the HOF form
      val order = (0 until nBits).sortBy(b => (math.abs(sums(b)), b))
      var p = 0
      while (p < nProbe) {
        val b = order(p)
        val cs = baseChars.clone()
        cs(b) = if (cs(b) == '1') '0' else '1'
        out(p + 1) = UTF8String.fromString(new String(cs))
        p += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneProbes {
  private val name = "graft_hyperplane_probes"

  /** Idempotent session registration (public extension point). */
  def register(spark: SparkSession): Unit =
    graft.engine.Registration.once(spark, name)(
      exprs => HyperplaneProbes(exprs.head,
        exprs(1).eval().asInstanceOf[Int],
        if (exprs.length > 2) exprs(2).eval().asInstanceOf[Int] else 0))

  /** Column API: base signature + `nProbe` single-bit-flip probes. */
  def probes(emb: Column, nBits: Int, nProbe: Int): Column =
    call_function(name, emb, lit(nBits), lit(nProbe))

  /** Column API: just the unflipped base signature string. */
  def signature(emb: Column, nBits: Int): Column =
    element_at(probes(emb, nBits, 0), 1)
}
