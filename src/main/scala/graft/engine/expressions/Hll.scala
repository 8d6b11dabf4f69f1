package graft.engine.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog distinct-count sketch (Flajolet, Fusy, Gandouet &
  * Meunier, AofA 2007): cardinality estimates from m = 2^p one-byte
  * registers of state — one streaming pass, mergeable partials. The
  * missing third of the sketch family: [[CountMin]] answers "how
  * often", [[MisraGries]] answers "who is heavy", this answers "how
  * many distinct" — the corpus-health number (vocabulary size, unique
  * users/keys) that exact count(distinct) pays a full shuffle for.
  *
  * Register j of item x: the 60-bit md5 value h (the
  * [[graft.ops.Sampling.hashRank]] recipe, unreduced) is split as
  * j = h mod m and w = h div m, and the register keeps the max over
  * items of rho(w) = (trailing zeros of w) + 1 — the geometric rank.
  * Trailing zeros (Flajolet-Martin's original bit) rather than leading
  * zeros because it replays EXACTLY in portable SQL:
  * `log2(w & -w)` isolates the lowest set bit, a power of two whose
  * float log2 is exact — no engine-specific clz builtin needed. On
  * uniform hash bits both ranks are Geometric(1/2), so the FFGM
  * analysis (and alpha_m constant) carries over unchanged.
  *
  * Determinism: registers are elementwise MAXes of a pure function of
  * the data — partition-, order-, and duplicate-insensitive (the only
  * aggregate in the family that is idempotent under replay at the ROW
  * level, not just the batch level). The DuckDB oracle rebuilds every
  * register with a GROUP BY over the same md5 recipe.
  *
  * Returns array<int> of the m registers; [[Hll.estimate]] folds a
  * sketch VALUE column into the FFGM estimate with the small-range
  * linear-counting correction, every float op mirrored verbatim by
  * the SQL twin. The large-range correction (E > 2^60/30) is omitted:
  * it exists to patch 32-bit hash saturation, and a 60-bit hash space
  * would need ~4e16 distinct keys to saturate.
  */
case class Hll(child: Expression, p: Int,
               mutableAggBufferOffset: Int = 0,
               inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with UnaryLike[Expression] {

  require(p >= 4 && p <= 16, s"precision must be in [4,16], got $p")

  private val m = 1 << p

  override def dataType: DataType = ArrayType(IntegerType)
  override def nullable: Boolean = false
  override def prettyName: String = "hll"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = Hll.hash60(v.asInstanceOf[UTF8String].toString)
      val j = (h % m).toInt
      val rho = Hll.rho(h / m)
      if (rho > buf(j)) buf(j) = rho
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < b1.length) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt: Any))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): Hll =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): Hll =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Hll =
    copy(child = newChild)
}

/** Register-merge aggregate over HLL sketch VALUES: elementwise max of
  * `array<int>` register rows — the rollup algebra that makes the
  * sketch worth keeping (hour sketches fold to days, shards to a
  * corpus, WITHOUT rescanning raw data). Max is associative,
  * commutative, and idempotent, so a rollup merged from partials is
  * BIT-IDENTICAL to a sketch built from the base data — the exactness
  * a SQL oracle replays with one GROUP BY at the coarser key.
  */
case class HllMerge(child: Expression, p: Int,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with UnaryLike[Expression] {

  require(p >= 4 && p <= 16, s"precision must be in [4,16], got $p")

  private val m = 1 << p

  override def dataType: DataType = ArrayType(IntegerType)
  override def nullable: Boolean = false
  override def prettyName: String = "hll_merge"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int> sketch input, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() == m,
        s"$prettyName: sketch has ${arr.numElements()} registers, expected $m")
      var i = 0
      while (i < m) {
        val r = arr.getInt(i)
        // fail fast on out-of-range registers: r.toByte would silently
        // truncate (300 -> 44) or flip sign (200 -> -56, invisible to
        // max) — corrupt sketch rows must not merge into wrong answers
        require(r >= 0 && r <= 53,
          s"$prettyName: register $i holds $r, outside the valid [0,53]")
        if (r > buf(i)) buf(i) = r.toByte
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < b1.length) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt: Any))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllMerge =
    copy(child = newChild)
}

object Hll {
  private val name = "graft_hll"
  private val mergeName = "graft_hll_merge"

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The oracle-replayable 60-bit hash: first 15 hex chars of
    * md5(item) (DuckDB: `('0x' || substr(md5(item), 1, 15))::BIGINT`).
    * Computed without strings — this runs once per ROW in the
    * aggregate's update path, so no per-row digest allocation or hex
    * formatting: the first 8 digest bytes read big-endian are the
    * first 16 hex chars as a 64-bit value, and `>>> 4` drops the 16th
    * hex char, leaving exactly `parseLong(hex.take(15), 16)`
    * (equivalence pinned by HllRhoSpec against the literal recipe).
    */
  private[expressions] def hash60(item: String): Long = {
    val md = digest.get()
    md.reset()
    val bytes = md.digest(item.getBytes("UTF-8"))
    java.nio.ByteBuffer.wrap(bytes, 0, 8).getLong >>> 4
  }

  /** Geometric rank: trailing zeros + 1, CAPPED at 53 so the
    * estimator's 2^(53 − M_j) scaling never sees a negative shift.
    * For p ≥ 8 the cap is unreachable by a nonzero suffix (w < 2^52 →
    * rank ≤ 52) and only the w = 0 case lands on it; for p ∈ [4,7] a
    * nonzero w can carry up to 55 trailing zeros (probability
    * ≤ 2^−53 per item) and the cap truncates it — a distortion far
    * below the estimator's error floor, applied identically by any
    * SQL twin: `CASE WHEN w = 0 THEN 53 ELSE
    * least(CAST(round(log2(w & -w)) AS INT) + 1, 53) END`.
    */
  private[expressions] def rho(w: Long): Byte =
    if (w == 0L) 53
    else math.min(java.lang.Long.numberOfTrailingZeros(w) + 1, 53).toByte

  /** Idempotent session registration (public extension point). */
  def register(spark: SparkSession): Unit = {
    graft.engine.Registration.once(spark, name)(
      exprs => Hll(exprs.head,
        exprs(1).eval().asInstanceOf[Int]).toAggregateExpression())
    graft.engine.Registration.once(spark, mergeName)(
      exprs => HllMerge(exprs.head,
        exprs(1).eval().asInstanceOf[Int]).toAggregateExpression())
  }

  /** Column API: the 2^p-register sketch of a string column. */
  def sketch(item: Column, p: Int): Column =
    call_function(name, item, lit(p))

  /** Column API: elementwise-max merge of sketch VALUE rows (rollup). */
  def merge(sketch: Column, p: Int): Column =
    call_function(mergeName, sketch, lit(p))

  /** FFGM estimate of a sketch VALUE column, float-op-for-float-op
    * replayable in SQL:
    *   S2  = sum_j 2^(53 - M_j)        -- EXACT decimal(38,0) (the 2^53 scaling
    *                                      keeps the harmonic sum integral)
    *   raw = alpha_m * m^2 * 2^53 / S2 -- alpha_m * m^2 * 2^53 folds to
    *                                      one double literal; power-of-2
    *                                      multiplies are exact, so SQL's
    *                                      unfolded product is bit-identical
    *   est = m * ln(m / V) when raw <= 2.5m and V (zero registers) > 0,
    *         else raw                   -- linear counting; ln is the one
    *                                      1-ulp-risk op, so CALLERS round
    * SQL twin (p=8): `0.7213 / (1 + 1.079 / 256) * 65536 *
    * 9007199254740992 / CAST(s2 AS DOUBLE)` and
    * `256 * ln(256 / CAST(v AS DOUBLE))`.
    */
  def estimate(sketchCol: Column, p: Int): Column = {
    import org.apache.spark.sql.functions._
    val m = 1 << p
    // decimal(38,0) fold: the scaled harmonic sum reaches m * 2^53 =
    // 2^(p+53), which overflows Long for p >= 11 — decimal keeps it
    // exact across the whole advertised p range (same move as
    // ops.Eval's rank sums; at p <= 10 the value fits a BIGINT, which
    // is what the committed p=8 oracles cast to)
    // clamp registers to the valid [0,53] BEFORE the 2^(53−r) shift:
    // estimate is a public column API (unlike HllMerge's update path it
    // has no range guard), and a malformed sketch row with r < 0 or
    // r > 53 would otherwise feed shiftleft a negative/overlarge
    // distance and return a silently-garbage estimate. On valid
    // Hll/HllMerge output the clamp is the identity, so every
    // committed SQL twin (which replays only valid registers) is
    // unaffected.
    val s2 = aggregate(sketchCol, lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)"),
      (acc, r) => acc +
        call_function("shiftleft", lit(1L),
          lit(53) - least(greatest(r, lit(0)), lit(53))).cast("decimal(38,0)"))
    val v = size(filter(sketchCol, r => r <= 0))
    val alphaNum =
      0.7213 / (1.0 + 1.079 / m) * (m.toLong * m).toDouble * 9007199254740992.0
    val raw = lit(alphaNum) / s2.cast("double")
    when(raw <= lit(2.5 * m) && v > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / v.cast("double")))
      .otherwise(raw)
  }
}
