package graft.engine.expressions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** LSH band signatures from Broder-style universal-hash MinHash, in one
  * pass over the shingle set.
  *
  * Per element: ONE md5, reduced to a 60-bit value v (first 15 hex chars,
  * exactly `('0x' || substr(md5(x),1,15))::BIGINT` in DuckDB), then the k
  * MinHash values are mins of the affine family
  * `h_i(v) = (A_i * (v % P) + B_i) % P` with P = 2^31-1. This replaces
  * k salted md5 digests per element with one digest + k multiplications —
  * the digest dominates, so the signature pass is ~k× cheaper while
  * keeping the same (1/jaccard-sensitive) collision statistics.
  *
  * Output: `numHashes / rowsPerBand` band signatures, each the '_'-joined
  * decimal rendering of `rowsPerBand` consecutive MinHash values (null
  * when the shingle set is empty — null band sigs never join).
  *
  * All constants are fixed and public so a SQL oracle can reproduce the
  * signatures bit-for-bit (see [[MinHashBands.hashParams]] /
  * [[MinHashBands.sqlMinhash]]).
  *
  * CodegenFallback: the md5 call dominates; compiled loop bookkeeping
  * would not pay for the codegen complexity.
  */
case class MinHashBands(child: Expression, numHashes: Int, rowsPerBand: Int)
    extends UnaryExpression with CodegenFallback {

  require(numHashes % rowsPerBand == 0,
    s"numHashes ($numHashes) must be a multiple of rowsPerBand ($rowsPerBand)")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_bands"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  @transient private lazy val params: Array[(Long, Long)] =
    MinHashBands.hashParams(numHashes).toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = MessageDigest.getInstance("MD5")
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var any = false
    var e = 0
    while (e < n) {
      val s = arr.getUTF8String(e)
      if (s != null) {
        any = true
        md.reset()
        val d = md.digest(s.getBytes)
        // First 15 hex chars == first 60 bits: 8 bytes as unsigned >>> 4.
        var v64 = 0L
        var i = 0
        while (i < 8) { v64 = (v64 << 8) | (d(i) & 0xffL); i += 1 }
        val v = (v64 >>> 4) % MinHashBands.P
        i = 0
        while (i < numHashes) {
          val h = (params(i)._1 * v + params(i)._2) % MinHashBands.P
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      e += 1
    }
    val bands = numHashes / rowsPerBand
    val out = new Array[AnyRef](bands)
    var b = 0
    while (b < bands) {
      out(b) = if (!any) null else {
        val sb = new java.lang.StringBuilder(12 * rowsPerBand)
        var r = 0
        while (r < rowsPerBand) {
          if (r > 0) sb.append('_')
          sb.append(mins(b * rowsPerBand + r))
          r += 1
        }
        UTF8String.fromString(sb.toString)
      }
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashBands {
  /** Modulus of the affine family: the Mersenne prime 2^31-1 — products
    * `A_i * v` stay under 2^62, so both Spark and DuckDB evaluate them in
    * exact int64 arithmetic.
    */
  val P: Long = 2147483647L

  /** Fixed affine coefficients (A_i, B_i), i-th member of the family.
    * Arbitrary but deterministic LCG-flavored constants, nonzero A.
    */
  def hashParams(k: Int): Seq[(Long, Long)] =
    (0 until k).map { i =>
      val a = (1664525L * (i + 1) + 1013904223L) % P
      val b = (22695477L * (2 * i + 1) + 1L) % P
      (if (a == 0) 1L else a, b)
    }

  /** DuckDB SQL computing MinHash value i over a list column expression —
    * bit-for-bit the expression's per-salt value.
    */
  def sqlMinhash(listExpr: String, i: Int): String = {
    val (a, b) = hashParams(i + 1)(i)
    s"""list_min(list_transform($listExpr, x ->
        ($a * (('0x' || substr(md5(x), 1, 15))::BIGINT % $P) + $b) % $P))"""
  }

  private val name = "graft_minhash_bands"

  /** Idempotent session registration (public extension point). */
  def register(spark: SparkSession): Unit =
    graft.engine.Registration.once(spark, name)(
      exprs => MinHashBands(exprs.head,
        exprs(1).eval().asInstanceOf[Int],
        exprs(2).eval().asInstanceOf[Int]))

  /** Column API: array of `bands` LSH band signatures, each covering
    * `rowsPerBand` consecutive MinHash values.
    */
  def bandSignatures(shingles: Column, bands: Int, rowsPerBand: Int): Column =
    org.apache.spark.sql.functions.call_function(name, shingles,
      org.apache.spark.sql.functions.lit(bands * rowsPerBand),
      org.apache.spark.sql.functions.lit(rowsPerBand))
}
