package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/**
 * Catalyst optimizer rule: rewrites an inner join whose ONLY condition is a
 * numeric interval containment
 *
 *   points JOIN ranges ON p >= lo AND p <= hi        (either side, either
 *                                                     comparison order,
 *                                                     strict or inclusive)
 *
 * into the binned equi-join graft.operators.Joins.rangeJoin composes by
 * hand: the range side is exploded to the integer bins it overlaps, the
 * point side is bucketed into its single bin, and the join becomes an
 * equi-join on the bin id with the original predicate kept as a refilter.
 * Without this, Catalyst can only plan the join as a
 * BroadcastNestedLoopJoin / cartesian — O(n*m) compares in one task at
 * cluster scale; with it, the join hash-partitions by bin and scales
 * linearly in input + bin-span.
 *
 * Enablement: bins need a width, which is workload knowledge the optimizer
 * cannot infer — set `spark.graft.rangeJoin.binWidth` (same units as the
 * join columns; pick ~ the typical range span) to a positive number to
 * turn the rule on. Installed via graft.GraftExtensions
 * (`--conf spark.sql.extensions=graft.GraftExtensions`) or
 * `spark.experimental.extraOptimizations`.
 *
 * Correctness notes:
 *  - the original condition is re-applied verbatim after the equi-join, so
 *    the rewrite can only drop non-matching pairs, never add or lose one
 *    (a point matches a range in exactly one bin — its own);
 *  - null points/bounds produce a null bin or an empty bin list and are
 *    eliminated exactly as the inner join would eliminate them;
 *  - only fires when there is no equality conjunct (if there is one,
 *    Catalyst already has a hash-join key and the rewrite would just add
 *    work).
 */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.graft.rangeJoin.binWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = conf.getConfString(ConfKey, "0").toDouble
    if (w <= 0.0) return plan
    plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _) =>
        rewrite(j, cond, w).getOrElse(j)
    }
  }

  /** One inequality bound `x >= y` (or strict), normalized from either
    * comparison direction. */
  private case class Bound(big: Expression, small: Expression)

  private def asBound(e: Expression): Option[Bound] = e match {
    case GreaterThanOrEqual(a, b) => Some(Bound(a, b))
    case GreaterThan(a, b) => Some(Bound(a, b))
    case LessThanOrEqual(a, b) => Some(Bound(b, a))
    case LessThan(a, b) => Some(Bound(b, a))
    case _ => None
  }

  private def numeric(e: Expression): Boolean =
    e.dataType.isInstanceOf[NumericType] && e.deterministic

  private def rewrite(j: Join, cond: Expression, w: Double): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    if (conjuncts.length != 2) return None
    (asBound(conjuncts(0)), asBound(conjuncts(1))) match {
      case (Some(b1), Some(b2)) =>
        // The point expression is the one appearing as the "big" side of
        // one bound and the "small" side of the other: lo <= p <= hi.
        val pLoHi =
          if (b1.big.semanticEquals(b2.small)) Some((b1.big, b1.small, b2.big))
          else if (b2.big.semanticEquals(b1.small)) Some((b2.big, b2.small, b1.big))
          else None
        pLoHi.flatMap { case (p, lo, hi) =>
          if (!Seq(p, lo, hi).forall(numeric)) None
          else {
            val fromLeft = (e: Expression) => e.references.nonEmpty &&
              e.references.subsetOf(j.left.outputSet)
            val fromRight = (e: Expression) => e.references.nonEmpty &&
              e.references.subsetOf(j.right.outputSet)
            if (fromLeft(p) && fromRight(lo) && fromRight(hi))
              Some(binned(j, cond, w, p, lo, hi, pointOnLeft = true))
            else if (fromRight(p) && fromLeft(lo) && fromLeft(hi))
              Some(binned(j, cond, w, p, lo, hi, pointOnLeft = false))
            else None
          }
        }
      case _ => None
    }
  }

  private def binOf(e: Expression, w: Double): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w))), LongType)

  private def binned(j: Join, cond: Expression, w: Double, p: Expression,
      lo: Expression, hi: Expression, pointOnLeft: Boolean): LogicalPlan = {
    val binAttr = AttributeReference("__graft_bin", LongType, nullable = false)()
    // A reversed range (lo > hi) can never contain a point, but Sequence's
    // default step would enumerate every bin DOWNWARD between them — one
    // garbage row with a huge reversed span explodes into millions of
    // spurious bins (or trips Sequence's max array length and fails the
    // query) before the refilter runs. Filter such rows (and null bounds,
    // which the inner join drops anyway) off the range side first.
    // Sequence is TimeZoneAware — it needs an explicit zone to stay
    // resolved.
    val rangeChild = Filter(LessThanOrEqual(lo, hi),
      if (pointOnLeft) j.right else j.left)
    val bins = Explode(Sequence(binOf(lo, w), binOf(hi, w), None,
      Some(conf.sessionLocalTimeZone)))
    val rangeSide = Generate(bins, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(binAttr),
      child = rangeChild)
    val newCond = And(EqualTo(binOf(p, w), binAttr), cond)
    val newJoin =
      if (pointOnLeft) j.copy(right = rangeSide, condition = Some(newCond))
      else j.copy(left = rangeSide, condition = Some(newCond))
    Project(j.output, newJoin)
  }
}
