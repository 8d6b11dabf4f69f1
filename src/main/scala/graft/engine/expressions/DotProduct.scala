package graft.engine.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd dot product over two `array<double>` columns.
  *
  * Exists because Catalyst's higher-order functions (`transform` /
  * `aggregate` / `zip_with`) evaluate their lambdas interpreted, outside
  * whole-stage codegen — measured ~10× slower on the 64-dim embedding
  * kernels than this compiled loop (SURVEY.md §7.3: a custom Expression
  * with doGenCode beats a UDF beats interpreted lambdas).
  *
  * Accumulates left-to-right in index order — bit-identical to the
  * sequential-fold formulation used by the DuckDB oracles. Null array
  * elements read as 0.0 (embedding arrays are non-null by schema).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<double>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName per instance: with non-nullable children the snippet is
      // inlined without an enclosing brace scope, so fixed local names
      // would collide when two DotProducts land in one generated function.
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  private val name = "graft_dot_product"

  /** Register the expression in the session's function registry (public
    * extension point; idempotent). Needed once per session before
    * [[dot]]-built plans resolve.
    */
  def register(spark: SparkSession): Unit =
    graft.engine.Registration.once(spark, name)(
      exprs => DotProduct(exprs.head, exprs(1)))

  /** Column API: dot product of two array<double> columns. Requires
    * [[register]] on the owning session (SimSearch does this).
    */
  def dot(a: Column, b: Column): Column = call_function(name, a, b)
}
