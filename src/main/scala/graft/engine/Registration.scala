package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Register-once guard for the engine's session-level temp functions.
  *
  * Every `X.register(spark)` call used to hit
  * `createOrReplaceTempFunction` unconditionally; the registry logs a
  * WARN per replacement and the builders re-run on every query
  * construction — a few thousand no-op replacements (and warn lines)
  * across a 237-query batch run (the r12 bench tail). The check is one
  * registry lookup; the rare double-register under concurrency is
  * harmless (same builder, last write wins).
  */
object Registration {

  def once(spark: SparkSession, name: String)
          (builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "built-in")
  }
}
