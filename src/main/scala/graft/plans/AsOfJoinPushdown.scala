package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Predicate pushdown THROUGH the custom as-of join. Catalyst's
  * PushDownPredicates only understands built-in nodes, so a user-written
  * `asOfJoin(...).where($"region" === "EU")` would otherwise evaluate the
  * filter above the join — scanning and probing every row first. This rule
  * restores the standard behavior for [[AsOfJoinPlan]]: conjuncts that
  * reference only probe-side (left) attributes move below the join, where
  * they can keep sinking into the scan's PushedFilters.
  *
  * Conjuncts touching the appended right-value columns must NOT move: the
  * operator is a LEFT join — a value predicate above it filters the
  * null-extended result, which has no equivalent below. Deterministic
  * conjuncts only (same guard Catalyst's own pushdown applies).
  */
object AsOfJoinPushdown extends Rule[LogicalPlan] {

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformDown {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val (pushable, kept) = splitConjuncts(cond).partition(c =>
        c.deterministic && c.references.subsetOf(j.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(pushable.reduce(And), j.left))
        kept.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }

    // Column pruning through the node (same gap as pushdown: ColumnPruning
    // doesn't know the custom operator): probe-side columns that neither
    // the downstream projection nor the join itself (keys/timestamp) needs
    // are cut below the join, so the scan's ReadSchema shrinks. The node's
    // `output` is derived from left.output, so it narrows consistently.
    case p @ Project(projList, j: AsOfJoinPlan) =>
      val needed = AttributeSet(projList.flatMap(_.references)) ++ j.references
      val keptLeft = j.left.output.filter(needed.contains)
      if (keptLeft.size < j.left.output.size)
        p.copy(child = j.copy(left = Project(keptLeft, j.left)))
      else p
  }
}
