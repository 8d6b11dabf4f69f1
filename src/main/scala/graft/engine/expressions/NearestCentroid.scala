package graft.engine.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Argmax-dot centroid assignment against a FLATTENED codebook literal:
  * returns the 0-based index of the codebook row (each `dims` doubles
  * long, row-major) with the highest dot product against the embedding,
  * first-max-wins on ties.
  *
  * This is the production-codebook form of the IVF n=1 assignment
  * (SimSearch.nearestBuckets). The r18 unrolled shape built ONE
  * expression node per centroid (`array(dot(emb, lit(c₀)), …)` +
  * array_max/array_position): the generated code grows O(nCentroids),
  * which is fine at 16 centroids but at a production 4k–64k codebook
  * either splits into hundreds of JIT-hostile methods or falls out of
  * codegen entirely. Here the whole codebook is ONE `array<double>`
  * literal (a single reference object — the plan ships it once per
  * stage in the broadcast task binary, exactly like the join form's
  * broadcast) and the generated code is a constant-size two-level loop
  * regardless of codebook size.
  *
  * Selection semantics are IDENTICAL to both prior forms (the window
  * over dot desc / cent_id asc, and the unrolled array argmax): dots
  * accumulate left-to-right in index order (the DotProduct fold), the
  * comparison is `Double.compare(s, best) > 0` — strict, so the FIRST
  * maximum wins (= smallest cent_id under the caller's cent_id-asc
  * flattening), and NaN ranks greatest exactly like Spark's ordering
  * in array_max. Embeddings shorter/longer than `dims` dot over
  * `min(len, dims)` elements, the DotProduct convention.
  *
  * `codebook` and `dims` must be foldable (literals): they are frozen
  * once per plan, not evaluated per row.
  */
case class NearestCentroid(emb: Expression, codebook: Expression,
                           dims: Expression) extends TernaryExpression {

  override def first: Expression = emb
  override def second: Expression = codebook
  override def third: Expression = dims

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = emb.nullable
  override def prettyName: String = "nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = {
    val embOk = emb.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val cbOk = codebook.dataType match {
      case ArrayType(DoubleType, _) => codebook.foldable
      case _ => false
    }
    if (!embOk || !cbOk || dims.dataType != IntegerType || !dims.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, foldable array<double>, " +
          s"foldable int), got (${emb.dataType.simpleString}, " +
          s"${codebook.dataType.simpleString}, ${dims.dataType.simpleString})")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val flat: Array[Double] =
    codebook.eval().asInstanceOf[ArrayData].toDoubleArray()
  @transient private lazy val d: Int = {
    val v = dims.eval().asInstanceOf[Int]
    require(v > 0 && flat.length % v == 0,
      s"$prettyName: codebook length ${flat.length} not a multiple of dims $v")
    v
  }

  override def eval(input: InternalRow): Any = {
    val e = emb.eval(input)
    if (e == null) null else argmax(e.asInstanceOf[ArrayData])
  }

  private def argmax(x: ArrayData): Int = {
    val m = math.min(x.numElements(), d)
    val nCent = flat.length / d
    var best = Double.NegativeInfinity
    var arg = 0
    var j = 0
    while (j < nCent) {
      val off = j * d
      var s = 0.0
      var i = 0
      while (i < m) { s += x.getDouble(i) * flat(off + i); i += 1 }
      if (java.lang.Double.compare(s, best) > 0) { best = s; arg = j }
      j += 1
    }
    arg
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("codebook", flat, "double[]")
    val dimV = d // freeze the literal at codegen time
    nullSafeCodeGen(ctx, ev, (e, _, _) => {
      val m = ctx.freshName("m")
      val best = ctx.freshName("best")
      val arg = ctx.freshName("arg")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $m = Math.min($e.numElements(), $dimV);
         |double $best = Double.NEGATIVE_INFINITY;
         |int $arg = 0;
         |for (int $j = 0; $j < ${flat.length / dimV}; $j++) {
         |  int $off = $j * $dimV;
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    $s += $e.getDouble($i) * $cb[$off + $i];
         |  }
         |  if (Double.compare($s, $best) > 0) { $best = $s; $arg = $j; }
         |}
         |${ev.value} = $arg;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(emb = newFirst, codebook = newSecond, dims = newThird)
}

object NearestCentroid {
  private val name = "graft_nearest_centroid"

  /** Register in the session's function registry (idempotent). */
  def register(spark: SparkSession): Unit =
    graft.engine.Registration.once(spark, name)(
      exprs => NearestCentroid(exprs.head, exprs(1), exprs(2)))

  /** Column API: 0-based index of `flat`'s nearest (max-dot) row-major
    * `dim`-wide codebook row. Requires [[register]] on the session.
    */
  def nearest(emb: Column, flat: Array[Double], dim: Int): Column =
    call_function(name, emb, lit(flat), lit(dim))
}
