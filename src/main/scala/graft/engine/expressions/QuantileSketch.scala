package graft.engine.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable quantile sketch over a bounded non-negative integer
  * domain [0, 2^domainBits), by dyadic decomposition (Cormode &
  * Muthukrishnan, "An improved data stream summary: the count-min
  * sketch and its applications", J. Algorithms 2005, §4.2 range/
  * quantile queries): one counter grid per dyadic LEVEL, where level
  * l's key for item v is the prefix v >> l. A rank query [0, x]
  * decomposes into ≤ domainBits dyadic point lookups; a quantile
  * query walks the implicit binary tree from the root, one point
  * lookup per level. Completes the sketch family: [[CountMin]] "how
  * often", [[MisraGries]] "who is heavy", [[Hll]]/[[KmvDistinct]]
  * "how many distinct", this "what is the p99".
  *
  * WHY NOT KLL / t-digest: a compactor/centroid sketch's STATE is a
  * function of the order its partials merge, and Spark's partial-
  * aggregate merge order is nondeterministic (task completion order),
  * so no external oracle can replay the state bit-for-bit and even
  * two runs over the same data may disagree in the last rank. The
  * dyadic grid is a LINEAR sketch — every counter is a SUM of a pure
  * per-row function — so like [[CountMin]]'s counters and [[Hll]]'s
  * register maxes it is partition-, order-, and merge-tree-invariant,
  * mergeable by elementwise addition (hour sketches fold to days,
  * shards to a corpus), and a DuckDB oracle rebuilds every cell with
  * one GROUP BY over the same md5 recipe. Both give the same
  * mergeable fixed-size contract; the linear one is the only class
  * whose answers are reproducible enough to hash-gate.
  *
  * Accuracy/space: levels with at most `width` distinct prefixes
  * (l ≥ domainBits − log2(width)) store EXACT per-prefix counts —
  * no hashing, no collision error; only the finest `hashedLevels =
  * domainBits − log2(width)` levels hash prefixes into depth×width
  * Count-Min rows (estimate = min over rows — one-sided overcount).
  * Rank error is therefore bounded by the hashed levels alone:
  * expected ≤ hashedLevels · n/width before the min-of-depth
  * reduction. Space is fixed at hashedLevels·depth·width +
  * (2·width − 2) counters ≈ 160 KB at the committed (16, 3, 1024) —
  * independent of n, the property that lets a 100 TB length/score
  * distribution be monitored from one aggregate (exact percentile
  * queries sort-shuffle the full column; see Relational3's q58 notes).
  *
  * Values below 0 clamp to 0, above the domain to 2^domainBits − 1 —
  * a quantile landing on the cap means "at or beyond the cap",
  * exactly like a capped histogram's last bucket.
  *
  * Returns array<array<array<bigint>>> — per level, the depth×width
  * grid (hashed levels) or a single exact row of 2^(domainBits−l)
  * counters (identity levels). Query-side estimators
  * ([[QuantileSketch.quantile]], [[QuantileSketch.rank]]) are integer
  * column ops over a sketch VALUE, so the whole read path replays in
  * SQL with no float in sight.
  */
case class DyadicQuantile(child: Expression, domainBits: Int, depth: Int,
                          width: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  QuantileSketch.validate(domainBits, depth, width)
  private val lay = QuantileSketch.Layout(domainBits, depth, width)

  override def dataType: DataType = ArrayType(ArrayType(ArrayType(LongType)))
  override def nullable: Boolean = false
  override def prettyName: String = "dyadic_quantile"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires int/bigint input, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](lay.size)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val raw = v match { case i: Int => i.toLong; case l: Long => l }
      lay.add(buf, raw)
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = lay.toNested(buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    QuantileSketch.longsToBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    QuantileSketch.bytesToLongs(bytes, lay.size)

  override def withNewMutableAggBufferOffset(newOffset: Int): DyadicQuantile =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DyadicQuantile =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): DyadicQuantile =
    copy(child = newChild)
}

/** Grid-merge aggregate over dyadic-quantile sketch VALUES: elementwise
  * SUM of the nested counter grids — the rollup algebra (hour sketches
  * fold to days, shards to a corpus, without rescanning raw data).
  * Addition is associative and commutative, so a rollup merged from
  * partials is BIT-IDENTICAL to a sketch built from the base data —
  * exactness a SQL oracle replays with one GROUP BY at the coarser key.
  * (NOT row-idempotent, unlike [[HllMerge]]'s maxes: re-adding a
  * sketch double-counts — exactly-once delivery is the store
  * protocol's job, see streaming.IncrementalQuantile.)
  */
case class DyadicQuantileMerge(child: Expression, domainBits: Int, depth: Int,
                               width: Int,
                               mutableAggBufferOffset: Int = 0,
                               inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  QuantileSketch.validate(domainBits, depth, width)
  private val lay = QuantileSketch.Layout(domainBits, depth, width)

  override def dataType: DataType = ArrayType(ArrayType(ArrayType(LongType)))
  override def nullable: Boolean = false
  override def prettyName: String = "dyadic_quantile_merge"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ArrayType(ArrayType(LongType, _), _), _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<array<array<bigint>>> sketch input, " +
        s"got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](lay.size)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null)
      lay.addNested(buf, v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = lay.toNested(buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    QuantileSketch.longsToBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    QuantileSketch.bytesToLongs(bytes, lay.size)

  override def withNewMutableAggBufferOffset(newOffset: Int): DyadicQuantileMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DyadicQuantileMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): DyadicQuantileMerge =
    copy(child = newChild)
}

object QuantileSketch {
  private val name = "graft_dyadic_quantile"
  private val mergeName = "graft_dyadic_quantile_merge"

  private[expressions] def validate(domainBits: Int, depth: Int, width: Int): Unit = {
    require(domainBits >= 1 && domainBits <= 30,
      s"domainBits must be in [1,30], got $domainBits")
    require(depth > 0 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width > 1 && (width & (width - 1)) == 0,
      s"width must be a power of two > 1, got $width")
  }

  /** Flat-buffer layout shared by both aggregates: hashed levels first
    * (l ∈ [0, hashedLevels), depth·width cells each), then identity
    * levels (l ∈ [hashedLevels, domainBits), 2^(domainBits−l) exact
    * cells each).
    */
  private[expressions] final case class Layout(domainBits: Int, depth: Int,
                                               width: Int) {
    val log2w: Int = java.lang.Integer.numberOfTrailingZeros(width)
    val hashedLevels: Int = math.max(domainBits - log2w, 0)
    val hashedSize: Int = hashedLevels * depth * width
    private val idOff: Array[Int] = {
      val off = new Array[Int](domainBits + 1 - hashedLevels)
      off(0) = hashedSize
      var l = hashedLevels
      while (l < domainBits) {
        off(l - hashedLevels + 1) = off(l - hashedLevels) + (1 << (domainBits - l))
        l += 1
      }
      off
    }
    val size: Int = idOff.last
    val maxValue: Long = (1L << domainBits) - 1

    def identityCells(l: Int): Int = 1 << (domainBits - l)
    def identityOffset(l: Int): Int = idOff(l - hashedLevels)

    /** One value into every level's counter (the per-row update). */
    def add(buf: Array[Long], raw: Long): Unit = {
      val v = math.min(math.max(raw, 0L), maxValue)
      var l = 0
      while (l < hashedLevels) {
        val p = v >>> l
        var r = 0
        while (r < depth) {
          buf(l * depth * width + r * width + bucket(r, l, p, width)) += 1L
          r += 1
        }
        l += 1
      }
      while (l < domainBits) {
        buf(identityOffset(l) + (v >>> l).toInt) += 1L
        l += 1
      }
    }

    /** Fold a sketch VALUE (nested-array row) into the flat buffer,
      * failing fast on shape mismatch (a sketch built with different
      * parameters must not silently merge into garbage).
      */
    def addNested(buf: Array[Long],
                  arr: org.apache.spark.sql.catalyst.util.ArrayData): Unit = {
      require(arr.numElements() == domainBits,
        s"sketch has ${arr.numElements()} levels, expected $domainBits")
      var l = 0
      while (l < domainBits) {
        val lvl = arr.getArray(l)
        val (rows, cells, off) =
          if (l < hashedLevels) (depth, width, l * depth * width)
          else (1, identityCells(l), identityOffset(l))
        require(lvl.numElements() == rows,
          s"level $l has ${lvl.numElements()} rows, expected $rows")
        var r = 0
        while (r < rows) {
          val row = lvl.getArray(r)
          require(row.numElements() == cells,
            s"level $l row $r has ${row.numElements()} cells, expected $cells")
          var b = 0
          while (b < cells) {
            buf(off + r * cells + b) += row.getLong(b)
            b += 1
          }
          r += 1
        }
        l += 1
      }
    }

    /** Flat buffer → the nested-array result value. */
    def toNested(buf: Array[Long]): GenericArrayData =
      new GenericArrayData((0 until domainBits).map { l =>
        val (rows, cells, off) =
          if (l < hashedLevels) (depth, width, l * depth * width)
          else (1, identityCells(l), identityOffset(l))
        new GenericArrayData((0 until rows).map { r =>
          new GenericArrayData(java.util.Arrays.copyOfRange(
            buf, off + r * cells, off + (r + 1) * cells)): Any
        }.toArray[Any]): Any
      }.toArray[Any])
  }

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** JVM twin of the oracle-replayable bucket for hashed levels: the
    * [[CountMin.bucket]] md5 recipe over "r:level:prefix" — first 15
    * hex chars of the digest parse to a positive 60-bit long, mod
    * width; computed digest-bytes-direct with no hex formatting (the
    * Hll.hash60 move). SQL twin:
    * `('0x' || substr(md5(r || ':' || l || ':' || p), 1, 15))::BIGINT
    * % width`.
    */
  private[expressions] def bucket(r: Int, level: Int, prefix: Long,
                                  width: Int): Int = {
    val md = digest.get()
    md.reset()
    val bytes = md.digest(s"$r:$level:$prefix".getBytes("UTF-8"))
    ((java.nio.ByteBuffer.wrap(bytes, 0, 8).getLong >>> 4) % width).toInt
  }

  private[expressions] def longsToBytes(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8)
    val out = new DataOutputStream(bos)
    buf.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  private[expressions] def bytesToLongs(bytes: Array[Byte], n: Int): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(n)(in.readLong())
  }

  /** Idempotent session registration (public extension point). */
  def register(spark: SparkSession): Unit = {
    graft.engine.Registration.once(spark, name)(
      exprs => DyadicQuantile(exprs.head,
        exprs(1).eval().asInstanceOf[Int],
        exprs(2).eval().asInstanceOf[Int],
        exprs(3).eval().asInstanceOf[Int]).toAggregateExpression())
    graft.engine.Registration.once(spark, mergeName)(
      exprs => DyadicQuantileMerge(exprs.head,
        exprs(1).eval().asInstanceOf[Int],
        exprs(2).eval().asInstanceOf[Int],
        exprs(3).eval().asInstanceOf[Int]).toAggregateExpression())
  }

  import org.apache.spark.sql.functions._

  /** Column API: the dyadic sketch of an int/long column. */
  def sketch(value: Column, domainBits: Int = 16, depth: Int = 3,
             width: Int = 1024): Column =
    call_function(name, value, lit(domainBits), lit(depth), lit(width))

  /** Column API: elementwise-sum rollup of sketch VALUE rows. */
  def merge(sketchCol: Column, domainBits: Int = 16, depth: Int = 3,
            width: Int = 1024): Column =
    call_function(mergeName, sketchCol, lit(domainBits), lit(depth), lit(width))

  /** Elementwise-sum of two sketch VALUE columns (the incremental
    * store's fold — one nested zip_with, no aggregate needed).
    */
  def mergeCols(a: Column, b: Column): Column =
    zip_with(a, b, (la, lb) => zip_with(la, lb, (ra, rb) =>
      zip_with(ra, rb, (x, y) => x + y)))

  /** Point estimate of dyadic node (level, prefix) against a sketch
    * VALUE: identity levels read their exact cell; hashed levels take
    * the Count-Min min-over-rows of the md5 bucket. Pure integer
    * column ops — replays in SQL verbatim.
    */
  private def est(sk: Column, l: Column, pfx: Column, domainBits: Int,
                  depth: Int, width: Int): Column = {
    val hashedLevels = math.max(
      domainBits - java.lang.Integer.numberOfTrailingZeros(width), 0)
    when(l >= hashedLevels,
      element_at(element_at(element_at(sk, l.cast("int") + 1), 1),
        pfx.cast("int") + 1))
      .otherwise(array_min(transform(sequence(lit(0), lit(depth - 1)), r =>
        element_at(element_at(element_at(sk, l.cast("int") + 1),
          r.cast("int") + 1),
          (conv(substring(md5(concat_ws(":", r.cast("string"),
            l.cast("string"), pfx.cast("string"))), 1, 15), 16, 10)
            .cast("long") % width).cast("int") + 1))))
  }

  /** The t-th smallest value (1-based rank target) estimated from a
    * sketch VALUE column: binary descent of the implicit dyadic tree,
    * one point estimate per level — smallest v whose estimated rank
    * count[0, v] reaches t. One `aggregate` fold over the level
    * sequence (constant-size lambda — no 16-fold expression-tree
    * blow-up), integer arithmetic only. t ≤ 0 returns 0; t > n walks
    * off the right edge and returns the domain cap — both deterministic.
    */
  def quantile(sk: Column, t: Column, domainBits: Int = 16, depth: Int = 3,
               width: Int = 1024): Column =
    aggregate(
      sequence(lit(domainBits - 1), lit(0), lit(-1)),
      struct(lit(0L).as("c"), lit(0L).as("s")),
      (acc, l) => {
        val c = acc.getField("c")
        val s = acc.getField("s")
        val cl = est(sk, l, call_function("shiftright", s, l),
          domainBits, depth, width)
        struct(
          when(c + cl >= t, c).otherwise(c + cl).as("c"),
          when(c + cl >= t, s)
            .otherwise(s + call_function("shiftleft", lit(1L), l)).as("s"))
      },
      acc => acc.getField("s"))

  /** Estimated count of values ≤ x from a sketch VALUE column: the
    * canonical dyadic decomposition of [0, x+1) — for each set bit l
    * of b = x+1, one point estimate at (level l, prefix 2·(b >> l+1)).
    * `n` (the exact row count, carried beside the sketch) answers the
    * full-domain corner x = domainMax, whose decomposition is the
    * whole tree root. x < 0 returns 0.
    */
  def rank(sk: Column, x: Column, n: Column, domainBits: Int = 16,
           depth: Int = 3, width: Int = 1024): Column = {
    val maxV = (1L << domainBits) - 1
    val b = least(x, lit(maxV - 1)) + lit(1L)
    val folded = aggregate(
      sequence(lit(domainBits - 1), lit(0), lit(-1)),
      lit(0L),
      (acc, l) => acc +
        when(call_function("shiftright", b, l) % 2 === 1,
          est(sk, l,
            call_function("shiftleft",
              call_function("shiftright", b, l + lit(1)), lit(1)),
            domainBits, depth, width))
          .otherwise(lit(0L)))
    when(x < 0, lit(0L)).when(x >= maxV, n.cast("long")).otherwise(folded)
  }
}
