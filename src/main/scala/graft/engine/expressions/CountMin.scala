package graft.engine.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

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

/** Count-Min sketch (Cormode & Muthukrishnan 2005): frequency
  * estimates for EVERY key of a string column from depth×width long
  * counters of state — one streaming pass, mergeable partials. The
  * frequency-estimation complement to [[MisraGries]] (which surfaces
  * heavy-hitter CANDIDATES but answers nothing about other keys):
  * est(x) = min over rows of the x-bucket counter, with
  * true ≤ est ≤ true + (2/width)·N at ≥ 1 − (1/2)^depth — the
  * one-sided error that makes the sketch safe as a pre-filter (an
  * underestimate could drop a real heavy key; overestimates only cost
  * a verification probe).
  *
  * Determinism: counters are plain integer SUMS, so the sketch is
  * partition- and merge-order-independent (spec-pinned), and the row-r
  * bucket of item x is the [[graft.ops.Sampling.hashRank]] md5 recipe
  * over "r:x" — exactly replayable as SQL on any engine with md5
  * (q252's oracle rebuilds the counters with GROUP BY and takes the
  * same min).
  *
  * Returns array<array<bigint>>: `depth` rows of `width` counters.
  * Query-side estimates are column ops over the one-row sketch — see
  * [[CountMin.estimate]].
  */
case class CountMin(child: Expression, depth: Int, width: Int,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(depth > 0 && depth <= 16, s"depth must be in [1,16], got $depth")
  require(width > 1, s"width must exceed 1, got $width")

  override def dataType: DataType = ArrayType(ArrayType(LongType))
  override def nullable: Boolean = false
  override def prettyName: String = "count_min"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      var r = 0
      while (r < depth) {
        buf(r * width + CountMin.bucket(r, item, width)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData((0 until depth).map { r =>
      new GenericArrayData(
        java.util.Arrays.copyOfRange(buf, r * width, (r + 1) * width))
    }.toArray[Any])

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8)
    val out = new DataOutputStream(bos)
    buf.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(depth * width)(in.readLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMin =
    copy(child = newChild)
}

object CountMin {
  private val name = "graft_count_min"

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** JVM twin of the oracle-replayable bucket: the
    * [[graft.ops.Sampling.hashRank]] md5 recipe over "r:item" — first
    * 15 hex chars parse to a positive 60-bit long, mod width. String-
    * free (this runs depth× per ROW): the first 8 digest bytes read
    * big-endian `>>> 4` ARE parseLong(hex.take(15), 16) — same value,
    * no per-row digest allocation or hex formatting (the Hll.hash60
    * move; LlmOpsSpec's exactness cases pin the recipe).
    */
  private[expressions] def bucket(r: Int, item: String, width: Int): Int = {
    val md = digest.get()
    md.reset()
    val bytes = md.digest(s"$r:$item".getBytes("UTF-8"))
    ((java.nio.ByteBuffer.wrap(bytes, 0, 8).getLong >>> 4) % width).toInt
  }

  /** Idempotent session registration (public extension point). */
  def register(spark: SparkSession): Unit =
    graft.engine.Registration.once(spark, name)(
      exprs => CountMin(exprs.head,
        exprs(1).eval().asInstanceOf[Int],
        exprs(2).eval().asInstanceOf[Int]).toAggregateExpression())

  /** Column API: the depth×width sketch of a string column. */
  def sketch(item: Column, depth: Int, width: Int): Column =
    call_function(name, item, lit(depth), lit(width))

  /** Point estimate of `item` against a sketch VALUE column: min over
    * rows of the item's bucket counter — the same md5 bucket recipe as
    * a column expression, so the whole lookup replays in SQL.
    */
  def estimate(sketchCol: Column, item: Column, depth: Int,
               width: Int): Column = {
    import org.apache.spark.sql.functions._
    array_min(transform(sequence(lit(0), lit(depth - 1)), r =>
      element_at(element_at(sketchCol, r + 1),
        (conv(substring(md5(concat(r.cast("string"), lit(":"), item)),
          1, 15), 16, 10).cast("long") % width).cast("int") + 1)))
  }
}
