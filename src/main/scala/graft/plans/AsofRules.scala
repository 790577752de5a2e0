package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Custom optimizer rule for the custom node — the piece Catalyst cannot do
  * on its own: its own filter-pushdown rules stop at operators they don't
  * know, so a `WHERE left_pred` above [[AsofJoinPlan]] would execute AFTER
  * the two shuffles and the merge. This rule splits a conjunctive filter
  * and sinks every left-only predicate below the join — those predicates
  * then keep moving through Catalyst's stock rules, typically all the way
  * into the scan (`PushedFilters`).
  *
  * Correctness: the as-of match of a surviving left row depends only on the
  * right side and the row's own key/time, so dropping other left rows first
  * can't change it. Right-side predicates are NOT pushed: filtering the
  * right side changes which row is "latest at-or-before" (a filtered-out
  * right row was still a better match), so only `left.outputSet`-bounded
  * predicates move.
  *
  * Registered via SparkSessionExtensions.injectOptimizerRule — with
  * injectPlannerStrategy for the physical operator this closes the full
  * extension-point matrix: expression / aggregate / generator / DSv2 source
  * / SQL function / planner strategy / optimizer rule.
  */
object PushFilterThroughAsof extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsofJoinPlan) =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(aj.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(push.reduce(And), aj.left))
        if (keep.isEmpty) pushed else Filter(keep.reduce(And), pushed)
      }
  }
}
