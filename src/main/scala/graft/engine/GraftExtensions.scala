package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Cast, Expression, ExpressionInfo, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.LongType
import graft.engine.expressions.{DotProduct, MinHashSignatures}

/** SparkSessionExtensions entry point: makes the engine's custom
  * Catalyst expressions SQL-callable and injects the range-join
  * optimizer rewrite in any session built with
  * `spark.sql.extensions=graft.engine.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`).
  *
  * The engine's other operators plan through stock Catalyst
  * (SURVEY.md §4/§7.3); `rules.RangeJoinRewrite` only fires on inner
  * joins that would otherwise become nested-loop range joins.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.engine.rules.RangeJoinRewrite())
    e.injectFunction((
      FunctionIdentifier("graft_dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_minhashes"),
      new ExpressionInfo(classOf[MinHashSignatures].getName, "graft_minhashes"),
      (exprs: Seq[Expression]) =>
        MinHashSignatures(exprs.head, exprs(1).eval().asInstanceOf[Int],
          if (exprs.length > 2) exprs(2).eval().asInstanceOf[Int] else 1)))
    // Runtime-filter sketch pair (ops.BloomPrune's SQL surface), keys
    // xxhash64-ed as InjectRuntimeFilter plans them internally.
    e.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
      (exprs: Seq[Expression]) =>
        new BloomFilterAggregate(new XxHash64(Seq(exprs.head)),
          Cast(exprs(1), LongType), Cast(exprs(2), LongType))))
    e.injectFunction((
      FunctionIdentifier("graft_bloom_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_bloom_might_contain"),
      (exprs: Seq[Expression]) =>
        BloomFilterMightContain(exprs.head, new XxHash64(Seq(exprs(1))))))
  }
}
