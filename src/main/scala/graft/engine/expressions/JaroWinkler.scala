package graft.engine.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Jaro-Winkler similarity over two string columns.
  *
  * Spark ships `levenshtein` but no Jaro-Winkler, so fuzzy entity
  * matching (the record-linkage staple — names, addresses, product
  * titles) would otherwise fall to an interpreted UDF per pair. This
  * expression stays inside whole-stage codegen: the generated code makes
  * one static call into [[JaroWinkler.compute]] (the same shape Spark's
  * own `levenshtein` uses — a tight branchy scalar kernel gains nothing
  * from inlining into the generated Java, unlike DotProduct's loop).
  *
  * Semantics pinned to the textbook algorithm as implemented by DuckDB
  * (the oracle) and rapidfuzz:
  *  - match window `max(|a|,|b|)/2 - 1` (floor, min 0), greedy
  *    first-available matching left-to-right;
  *  - transpositions = half the mismatches between the two matched
  *    sequences, halved as a double;
  *  - Winkler boost `jw = j + prefix * 0.1 * (1 - j)` applied only when
  *    the Jaro score exceeds 0.7, common prefix capped at 4;
  *  - either side empty → 0.0 (including both empty — verified DuckDB
  *    behavior, NOT 1.0 as some libraries return).
  *
  * Reference capability: fuzzy candidate matching in the rec pipeline
  * (prod-recommendation-pyspark's name-normalized joins, e.g.
  * utils/transforms.py trim/upper matching) — this is the graded
  * similarity upgrade of that exact-match surface.
  */
case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.engine.expressions.JaroWinkler.compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  private val name = "graft_jaro_winkler"

  /** Register in the session's function registry (idempotent). */
  def register(spark: SparkSession): Unit =
    graft.engine.Registration.once(spark, name)(
      exprs => JaroWinkler(exprs.head, exprs(1)))

  /** Column API: Jaro-Winkler similarity in [0, 1]. */
  def jaroWinkler(a: Column, b: Column): Column = call_function(name, a, b)

  /** Static kernel the generated code calls. Char-based (UTF-16 units),
    * identical to DuckDB/rapidfuzz for the BMP text this engine stores.
    */
  def compute(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString
    val t = b.toString
    val n = s.length
    val m = t.length
    if (n == 0 || m == 0) return 0.0
    val window = math.max(math.max(n, m) / 2 - 1, 0)
    val sMatch = new Array[Boolean](n)
    val tMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(i - window, 0)
      val hi = math.min(i + window + 1, m)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!tMatch(j) && s.charAt(i) == t.charAt(j)) {
          sMatch(i) = true; tMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // mismatches between the two matched-character sequences
    var trans = 0
    var k = 0
    i = 0
    while (i < n) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val dm = matches.toDouble
    val jaro = (dm / n + dm / m + (dm - trans / 2.0) / dm) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val cap = math.min(math.min(n, m), 4)
    while (prefix < cap && s.charAt(prefix) == t.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}
