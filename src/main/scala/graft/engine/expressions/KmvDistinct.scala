package graft.engine.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch over a pre-hashed LONG
  * column: keeps the k smallest DISTINCT hash values seen, estimates
  * cardinality as (k-1)/U_(k) where U_(k) is the k-th smallest hash
  * normalized to (0,1] — the classic bottom-k estimator (Bar-Yossef et
  * al.). State is k longs regardless of input size, and the summary is
  * mergeable (union of bottom-k sets, re-truncated), so it survives
  * Spark's partial/final aggregation and replaces a full distinct
  * shuffle whose state is the whole vocabulary on a 100 TB corpus.
  *
  * The input is hashed OUTSIDE the aggregate with codegen'd built-ins
  * (see [[KmvDistinct.hash60]]: the md5-prefix scheme of
  * [[graft.ops.Sampling.hashRank]] without the modulus, uniform on
  * [0, 2^60)) — keeping the hot path in whole-stage codegen and making
  * the estimate bit-reproducible in any engine with md5 (the DuckDB
  * oracle computes the identical value; duplicate tokens collapse by
  * hash on both sides).
  *
  * Returns struct<est double, n_kept int, values array<bigint>>: when
  * fewer than k distinct hashes were seen the estimate IS the exact
  * distinct count (n_kept); otherwise (k-1) / (h_k / 2^60) with h_k =
  * the largest kept hash. `values` is the kept bottom-k set in
  * ascending order — the mergeable summary itself, exposed so set
  * operations (union/intersection/Jaccard across groups) can be
  * computed from sketches without re-touching the inputs (q144).
  */
case class KmvDistinct(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[Long]]
    with UnaryLike[Expression] {

  require(k > 1, "k must be at least 2")

  override def dataType: DataType = StructType(Seq(
    StructField("est", DoubleType), StructField("n_kept", IntegerType),
    StructField("values", ArrayType(LongType, containsNull = false))))
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_distinct"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a pre-hashed long input, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty

  private def add(buf: mutable.TreeSet[Long], h: Long): Unit =
    if (buf.size < k) buf.add(h)
    else if (h < buf.last && buf.add(h)) buf.remove(buf.last)

  override def update(buf: mutable.TreeSet[Long],
                      input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: mutable.TreeSet[Long],
                     b2: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    b2.foreach(add(b1, _))
    b1
  }

  override def eval(buf: mutable.TreeSet[Long]): Any = {
    val est =
      if (buf.size < k) buf.size.toDouble
      else (k - 1).toDouble / (buf.last.toDouble / KmvDistinct.Norm)
    // TreeSet iterates ascending — `values` comes out sorted.
    InternalRow(est, buf.size,
      new org.apache.spark.sql.catalyst.util.GenericArrayData(buf.toArray))
  }

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.TreeSet.empty[Long]
    (0 until n).foreach(_ => buf.add(in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
}

object KmvDistinct {
  /** 2^60 — the hash domain size; normalizes h_k to (0, 1]. */
  val Norm: Double = 1152921504606846976.0

  private val name = "graft_kmv_distinct"

  /** Idempotent session registration (public extension point). */
  def register(spark: SparkSession): Unit =
    graft.engine.Registration.once(spark, name)(
      exprs => KmvDistinct(exprs.head,
        exprs(1).eval().asInstanceOf[Int]).toAggregateExpression())

  /** The first 60 bits of md5(s) as a non-negative long — computed with
    * codegen'd built-ins, reproducible as
    * `('0x' || substr(md5(s), 1, 15))::BIGINT` in DuckDB.
    */
  def hash60(s: Column): Column = {
    import org.apache.spark.sql.functions._
    conv(substring(md5(s.cast("string")), 1, 15), 16, 10).cast("long")
  }

  /** Column API: KMV sketch of a pre-hashed long column.
    * Returns struct<est double, n_kept int, values array<bigint>>.
    */
  def sketch(hashed: Column, k: Int): Column = call_function(name, hashed, lit(k))
}
