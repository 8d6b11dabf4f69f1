package graft.engine.rules

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite point-in-interval (range) joins to binned
  * equi-joins.
  *
  * An inner join whose ONLY cross-side predicates are
  * `p >= lo AND p <= hi` (a SQL BETWEEN; `p` from one side, `lo`/`hi`
  * from the other) has no equi-join keys, so Spark falls back to
  * BroadcastNestedLoopJoin — O(|left| · |right|) comparisons and a
  * driver-sized broadcast. This rule gives the join an equi key by
  * integer binning (the `ops.RangeJoin` composition, applied
  * automatically):
  *
  *  - interval side: `Generate(Explode(Sequence(floor(lo/w), floor(hi/w))))`
  *    — one row per bin the interval overlaps;
  *  - point side:    `Project(__bin = floor(p/w))`;
  *  - join on `__bin` equality with the ORIGINAL range predicate kept as
  *    the residual filter, then the helper column pruned.
  *
  * Collisions within a bin are resolved by the residual, so results are
  * exactly the original join's. Work scales with genuine overlap
  * (interval-span / binWidth rows per interval), not the cross product.
  *
  * Bin width: `spark.graft.rangeJoin.binWidth`, when set, wins. When it
  * is not set the rule SAMPLES the interval side at rewrite time (a
  * bounded `LocalLimit` probe job, the same move cost-based optimizers
  * and dynamic partition pruning make) and uses the median sampled span
  * — a fixed global width cannot fit every join, and a mis-sized one
  * quietly degrades to near-nested-loop work (bins ≫ span: every
  * interval explodes into thousands of bin rows) or to a few giant bins
  * (span ≫ bins: residual filter does all the work). Falls back to 1000
  * if sampling fails or spans are degenerate. Rewritten joins carry an
  * equi conjunct, so the rule never re-fires on its own output.
  */
case class RangeJoinRewrite() extends Rule[LogicalPlan] {

  val BinWidthKey = "spark.graft.rangeJoin.binWidth"
  private val DefaultWidth = 1000.0
  private val SampleRows = 2048

  /** Median interval span from a bounded probe of the interval side.
    * None when the probe cannot run (no active session, execution
    * failure, all-null spans) — callers fall back to [[DefaultWidth]].
    * A thread-local guard stops the probe's own optimization from
    * probing recursively when the interval side itself contains an
    * eligible range join.
    */
  private def sampledWidth(iSide: LogicalPlan, lo: Expression, hi: Expression): Option[Double] = {
    if (RangeJoinRewrite.sampling.get()) return None
    RangeJoinRewrite.sampling.set(true)
    try {
      val spark = SparkSession.active
      val span = Alias(Subtract(Cast(hi, DoubleType), Cast(lo, DoubleType)), "__span")()
      val probe = GlobalLimit(Literal(SampleRows),
        LocalLimit(Literal(SampleRows), Project(Seq(span), iSide)))
      val rows = spark.sessionState.executePlan(probe).executedPlan
        .execute().map(r => if (r.isNullAt(0)) Double.NaN else r.getDouble(0))
        .take(SampleRows)
      val spans = rows.filterNot(_.isNaN).filter(_ >= 0).sorted
      if (spans.isEmpty) None
      else Some(spans(spans.length / 2)).filter(_ > 0)
    } catch {
      case scala.util.control.NonFatal(_) => None
    } finally RangeJoinRewrite.sampling.set(false)
  }

  private def binWidth(iSide: LogicalPlan, lo: Expression, hi: Expression): Double =
    Option(conf.getConfString(BinWidthKey, null)).map(_.toDouble)
      .orElse(sampledWidth(iSide, lo, hi))
      .getOrElse(DefaultWidth)

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** (point, lo, hi) when the predicate pair forms p BETWEEN lo AND hi
    * with p referencing only `pSide` and lo/hi only `iSide`.
    */
  private def betweenOf(conjuncts: Seq[Expression],
                        pSide: LogicalPlan, iSide: LogicalPlan):
      Option[(Expression, Expression, Expression)] = {
    def fromP(e: Expression) = e.references.subsetOf(pSide.outputSet) && e.references.nonEmpty
    def fromI(e: Expression) = e.references.subsetOf(iSide.outputSet) && e.references.nonEmpty
    val ge = conjuncts.collectFirst {
      case GreaterThanOrEqual(p, lo) if fromP(p) && fromI(lo) => (p, lo)
      case LessThanOrEqual(lo, p) if fromP(p) && fromI(lo) => (p, lo)
    }
    val le = conjuncts.collectFirst {
      case LessThanOrEqual(p, hi) if fromP(p) && fromI(hi) => (p, hi)
      case GreaterThanOrEqual(hi, p) if fromP(p) && fromI(hi) => (p, hi)
    }
    (ge, le) match {
      case (Some((p1, lo)), Some((p2, hi))) if p1.semanticEquals(p2) => Some((p1, lo, hi))
      case _ => None
    }
  }

  private def binOf(e: Expression, w: Double): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(w)))

  /** True when some conjunct is an equality across the two sides — the
    * join already has a hash key and needs no help.
    */
  private def hasEquiKey(conjuncts: Seq[Expression],
                         l: LogicalPlan, r: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)) ||
          (a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjuncts(cond)
      if (hasEquiKey(conjuncts, left, right)) j
      else {
        // try (points=left, intervals=right) then the mirror
        val candidates = Seq((left, right, false), (right, left, true))
        candidates.view.flatMap { case (pSide, iSide, flipped) =>
          betweenOf(conjuncts, pSide, iSide).map { case (p, lo, hi) =>
            val w = binWidth(iSide, lo, hi)
            val pBin = Alias(binOf(p, w), "__bin_p")()
            val pProj = Project(pSide.output :+ pBin, pSide)
            // nullable must mirror Explode's element schema exactly
            // (Sequence arrays are containsNull = false) or Generate
            // stays unresolved.
            val iBinAttr = AttributeReference("__bin_i", LongType, nullable = false)()
            // Sequence is TimeZoneAwareExpression: without an explicit
            // timeZoneId it stays unresolved (even for integral bounds).
            val gen = Generate(
              Explode(Sequence(binOf(lo, w), binOf(hi, w), None,
                Some(conf.sessionLocalTimeZone))),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(iBinAttr), child = iSide)
            val (newL, newR) = if (flipped) (gen, pProj) else (pProj, gen)
            val newCond = And(EqualTo(pBin.toAttribute, iBinAttr), cond)
            Project(j.output, Join(newL, newR, Inner, Some(newCond), hint))
          }
        }.headOption.getOrElse(j)
      }
  }
}

object RangeJoinRewrite {
  /** Re-entrancy guard for the span probe (see [[RangeJoinRewrite.sampledWidth]]). */
  private val sampling: ThreadLocal[java.lang.Boolean] =
    ThreadLocal.withInitial(() => java.lang.Boolean.FALSE)
}
