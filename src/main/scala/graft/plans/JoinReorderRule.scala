package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** q267: the footer-stats catalog driving JOIN ORDER inside Catalyst —
  * the optimizer-rule form of q248's greedy smallest-first advice
  * (which was computed and executed BY HAND outside the planner; a
  * stock multi-way join still planned in user order). This rule
  * flattens an un-hinted chain of inner equi-joins over cataloged base
  * tables and rebuilds it left-deep in greedy smallest-first order:
  * start from the smallest relation, repeatedly join the smallest
  * relation CONNECTED to the set so far by some join condition (never
  * introducing a cartesian product), attaching each condition at the
  * first point both its sides are present. The System-R family's
  * classic greedy heuristic, driven by the same catalog row counts
  * q248/q252 consume — zero data reads at planning time.
  *
  * Sound-by-abstention scope, the q252 discipline:
  *  - every flattened item must be a filter/project shape over a single
  *    cataloged scan (no nested joins, no in-memory frames, no unions)
  *    — anything else leaves the plan untouched;
  *  - every join must be INNER with NO hint anywhere in the chain — a
  *    user hint means a user decision, respected verbatim;
  *  - every join condition must reference exactly two items — the
  *    equi-chain shape the greedy's connectivity walk understands;
  *  - fewer than three items → nothing to reorder, untouched.
  *
  * Semantics preservation: inner-join reordering is an algebraic
  * identity as long as every condition is eventually applied and no
  * cartesian product is introduced — both enforced (unplaceable
  * conditions or disconnected greedy steps abstain). The original
  * OUTPUT ORDER is restored by a Project of the original output
  * attributes. Idempotence (the extraOptimizations batch runs to a
  * FIXED POINT): an already-advised chain returns the original node
  * unchanged — and a rebuilt tree's sub-chains are themselves in
  * greedy order (the greedy's prefix-stability), so the second pass
  * changes nothing.
  */
case class JoinReorderRule(catalog: Map[String, Long],
    ranges: Map[String, Map[String, (Long, Long)]] = Map.empty)
    extends Rule[LogicalPlan] {

  /** EFFECTIVE catalog row count of one flattened item, if it is a
    * filter/project shape over exactly one cataloged parquet scan:
    * the raw footer count discounted by a BOUNDED selectivity estimate
    * from the item's own filters (r15 verdict #5 — a large table under
    * a highly selective filter must not be ordered last just because
    * its raw count is big). The estimate is the q245 overlap arithmetic
    * lifted from units to the whole table: for a range/equality
    * conjunct on a numeric column whose footer (min, max) the catalog
    * carries, the kept fraction under the uniform model is the overlap
    * of the predicate interval with [min, max] over the span — computed
    * in exact rational arithmetic (BigInt numerator/denominator
    * product, floor at the end) so the oracle can restate it verbatim.
    * Sound-by-abstention per CONJUNCT: any shape outside the audited
    * list (IsNotNull, strings, casts, disjunctions...) contributes
    * factor 1 — estimates only ever ORDER inner joins (an algebraic
    * identity), so an under-claimed reduction costs plan quality,
    * never correctness.
    */
  private def itemRows(plan: LogicalPlan): Option[Long] = {
    if (plan.exists(_.isInstanceOf[Join])) return None
    plan.collectLeaves() match {
      case Seq(lr: LogicalRelation) => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.toSeq match {
          case Seq(p) =>
            val base = p.getName
            val tbl = if (base.endsWith(".parquet"))
              base.stripSuffix(".parquet") else base
            catalog.get(tbl).map(n => effectiveRows(plan, tbl, n))
          case _ => None
        }
        case _ => None
      }
      case _ => None
    }
  }

  /** n × Π(recognized conjunct fractions), floored, clamped to [0, n]
    * — the conjunct arithmetic lives in [[Selectivity]], shared with
    * the broadcast rule's per-file overlap bound (q277).
    */
  private def effectiveRows(plan: LogicalPlan, tbl: String, n: Long): Long = {
    val colRange = ranges.getOrElse(tbl, Map.empty)
    if (colRange.isEmpty) return n
    val fs = Selectivity.filtersOf(plan)
      .flatMap(Selectivity.keptFraction(_, colRange.get))
    if (fs.isEmpty) n
    else {
      val num = fs.map(f => BigInt(f._1)).product
      val den = fs.map(f => BigInt(f._2)).product
      val eff = (BigInt(n) * num) / den
      eff.min(BigInt(n)).max(BigInt(0)).toLong
    }
  }

  /** Flatten an un-hinted inner-join tree into (items, conditions);
    * None as soon as any node is outside scope. Column pruning leaves
    * attribute-only Projects BETWEEN the joins — those are looked
    * through (dropping them is safe: the items keep their own minimal
    * leaf projections, and the rewrite's final Project restores the
    * original output); a computing/aliasing projection is out of scope.
    */
  private def flatten(plan: LogicalPlan)
      : Option[(Seq[LogicalPlan], Seq[Expression])] = plan match {
    case Join(l, r, Inner, cond, JoinHint(None, None)) =>
      for { (li, lc) <- flatten(l); (ri, rc) <- flatten(r) }
        yield (li ++ ri, lc ++ rc ++ cond.toSeq)
    case _: Join => None // outer/semi or hinted — out of scope
    case p @ Project(es, child) if p.exists(_.isInstanceOf[Join]) =>
      if (es.forall(_.isInstanceOf[Attribute])) flatten(child) else None
    case p => Some((Seq(p), Nil))
  }

  /** Greedy smallest-first order over the condition-connectivity graph;
    * ties break toward the earlier USER-order item (deterministic, and
    * what the oracle's arithmetic mirrors). None if any step would be
    * cartesian.
    */
  private def greedyOrder(items: Seq[(LogicalPlan, Long)],
      conds: Seq[Expression]): Option[Seq[Int]] = {
    val outs = items.map(_._1.outputSet)
    def touches(c: Expression): Seq[Int] =
      items.indices.filter(i => c.references.intersect(outs(i)).nonEmpty)
    val pairs = conds.map(touches)
    if (pairs.exists(_.size != 2)) return None
    val order = scala.collection.mutable.ArrayBuffer.empty[Int]
    val remaining = scala.collection.mutable.Set(items.indices: _*)
    def best(cands: Seq[Int]): Int =
      cands.minBy(i => (items(i)._2, i))
    order += best(items.indices)
    remaining -= order.head
    while (remaining.nonEmpty) {
      val connected = remaining.toSeq.filter(i => pairs.exists(p =>
        p.contains(i) && p.exists(order.contains)))
      if (connected.isEmpty) return None // would go cartesian — abstain
      val nxt = best(connected.sorted)
      order += nxt
      remaining -= nxt
    }
    Some(order.toSeq)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case j @ Join(_, _, Inner, _, JoinHint(None, None)) =>
      val rebuilt = for {
        (items, conds) <- flatten(j)
        if items.size >= 3
        rows <- { val rs = items.map(itemRows)
          if (rs.forall(_.isDefined)) Some(rs.flatten) else None }
        order <- greedyOrder(items.zip(rows), conds)
        if order != items.indices // already advised → untouched
      } yield {
        val outs = items.map(_.outputSet)
        val used = scala.collection.mutable.Set.empty[Int]
        var covered = outs(order.head)
        var tree: LogicalPlan = items(order.head)
        order.tail.foreach { i =>
          covered = covered ++ outs(i)
          val placeable = conds.indices.filter(ci =>
            !used.contains(ci) && conds(ci).references.subsetOf(covered))
          used ++= placeable
          val cond = placeable.map(conds)
            .reduceOption(org.apache.spark.sql.catalyst.expressions.And)
          tree = Join(tree, items(i), Inner, cond, JoinHint(None, None))
        }
        // every condition must have found its place or the rewrite is
        // not an identity — guarded by connectivity, but belt-and-braces
        if (used.size != conds.size) j
        else Project(j.output, tree)
      }
      rebuilt.getOrElse(j)
  }
}
