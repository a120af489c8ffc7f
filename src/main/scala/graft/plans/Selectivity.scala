package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}

/** The shared conjunct-level predicate arithmetic both planner rules
  * consume (q274/q277) — the q245 unit-overlap rule lifted to envelope
  * arithmetic over any (min, max) range source:
  *
  *  - [[JoinReorderRule]] multiplies kept FRACTIONS against the table
  *    envelope (a uniform-model ESTIMATE — acceptable for ORDER, which
  *    is correctness-neutral);
  *  - [[StatsBroadcastRule]] tests numerator > 0 against each FILE's
  *    envelope and sums surviving file row counts (a TRUE upper BOUND —
  *    required for STRATEGY, where an under-estimate would broadcast a
  *    too-big side).
  *
  * Recognized shapes: =, <, <=, >, >= between an attribute and an
  * integral literal, either operand order (both sides PROBED — a plain
  * variable pattern would silently bind the literal as the "column").
  * Everything else returns None and the caller abstains on that
  * conjunct (factor 1 / keep the file): sound-by-abstention per
  * conjunct.
  */
private[graft] object Selectivity {

  /** Split a condition into its AND-conjuncts. */
  def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  /** Every Filter conjunct anywhere in a (join-free) item plan. */
  def filtersOf(plan: LogicalPlan): Seq[Expression] =
    plan.collect { case f: Filter => conjuncts(f.condition) }.flatten

  private def litLong(e: Expression): Option[Long] = e match {
    case Literal(v: Long, _)  => Some(v)
    case Literal(v: Int, _)   => Some(v.toLong)
    case Literal(v: Short, _) => Some(v.toLong)
    case Literal(v: Byte, _)  => Some(v.toLong)
    case _                    => None
  }

  /** The conjunct's kept fraction against `rangeOf` as
    * (numerator, span); None when the shape or column is unrecognized.
    * numerator == 0 means PROVABLY DISJOINT from the envelope.
    */
  def keptFraction(e: Expression,
      rangeOf: String => Option[(Long, Long)]): Option[(Long, Long)] = {
    def rng(x: Expression): Option[(Long, Long)] = x match {
      case a: Attribute => rangeOf(a.name)
      case _            => None
    }
    def le(r: (Long, Long), c: Long) = // col <= c
      (math.max(0L, math.min(c, r._2) - r._1 + 1L), r._2 - r._1 + 1L)
    def ge(r: (Long, Long), c: Long) = // col >= c
      (math.max(0L, r._2 - math.max(c, r._1) + 1L), r._2 - r._1 + 1L)
    def eq(r: (Long, Long), c: Long) =
      (if (c >= r._1 && c <= r._2) 1L else 0L, r._2 - r._1 + 1L)
    def cmp(x: Expression, y: Expression,
        fwd: ((Long, Long), Long) => (Long, Long),
        rev: ((Long, Long), Long) => (Long, Long)): Option[(Long, Long)] =
      (for { r <- rng(x); c <- litLong(y) } yield fwd(r, c))
        .orElse(for { r <- rng(y); c <- litLong(x) } yield rev(r, c))
    e match {
      case EqualTo(x, y)            => cmp(x, y, eq, eq)
      case LessThanOrEqual(x, y)    => cmp(x, y, le, ge)
      case LessThan(x, y)           => cmp(x, y,
        (r, c) => le(r, c - 1L), (r, c) => ge(r, c + 1L))
      case GreaterThanOrEqual(x, y) => cmp(x, y, ge, le)
      case GreaterThan(x, y)        => cmp(x, y,
        (r, c) => ge(r, c + 1L), (r, c) => le(r, c - 1L))
      case _                        => None
    }
  }
}
