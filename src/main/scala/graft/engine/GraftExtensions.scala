package graft.engine

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Cast, Expression, ExpressionInfo, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.LongType
import graft.engine.expressions.{DotProduct, MinHashSignatures}
import graft.engine.{functions => F}

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

  /** Lift a Column-combinator kernel (engine.functions) into a catalyst
    * expression builder: wrap the argument expressions as Columns, apply
    * the combinator, unwrap the resulting tree (graftbridge.ColumnBridge).
    * The kernels are pure column math, so the lifted tree is ordinary
    * codegen'd Catalyst — no UDF boundary is introduced.
    */
  private def lift(builder: Seq[Column] => Column)(exprs: Seq[Expression]): Expression =
    ColumnBridge.toExpr(builder(exprs.map(ColumnBridge.toCol)))

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
    // Scoring kernels F5/F6/F8 (SURVEY.md §2.7/§2.9) — SQL parity for the
    // blended-similarity surface: graft_haversine_score(lat1, lon1, lat2,
    // lon2), graft_hops_score(codeA, codeB), graft_blended_score(cos,
    // hops, havs[, wHops, wHavs]).
    e.injectFunction((
      FunctionIdentifier("graft_haversine_score"),
      new ExpressionInfo(F.getClass.getName, "graft_haversine_score"),
      lift(cs => F.haversineScore(cs(0), cs(1), cs(2), cs(3))) _))
    e.injectFunction((
      FunctionIdentifier("graft_hops_score"),
      new ExpressionInfo(F.getClass.getName, "graft_hops_score"),
      lift(cs => F.hopsScore(cs(0), cs(1))) _))
    e.injectFunction((
      FunctionIdentifier("graft_blended_score"),
      new ExpressionInfo(F.getClass.getName, "graft_blended_score"),
      (exprs: Seq[Expression]) => {
        val (wHops, wHavs) =
          if (exprs.length > 4) (foldedDouble(exprs(3)), foldedDouble(exprs(4)))
          else (0.399, 0.001)
        lift(cs => F.blendedScore(cs(0), cs(1), cs(2), wHops, wHavs))(exprs.take(3))
      }))
  }

  /** Evaluate a foldable literal argument (the weight knobs) to Double. */
  private def foldedDouble(e: Expression): Double =
    Cast(e, org.apache.spark.sql.types.DoubleType).eval().asInstanceOf[Double]
}
