package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, CreateArray, ElementAt, If, IsNull, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: merge several `MarkerCounts` over the SAME input
  * within one Project into a single scan.
  *
  * `marker_counts` costs one pass over the string per CALL; a SQL user
  * writing `marker_counts(text, ' the '), marker_counts(text, '.')` in
  * one select pays two passes for what is one pass of a merged marker
  * list (the Column-side library, graft.functions.TextStats, already
  * builds the merged call by hand — this rule gives SQL users the same
  * plan). The merged call is materialized ONCE as a new attribute in a
  * stacked Project — not inlined at each use, because common-
  * subexpression elimination is not guaranteed for CodegenFallback
  * expressions, and CollapseProject refuses to re-inline expensive
  * expressions referenced more than once, so the two-level shape is
  * stable. Each original call is rebuilt as `array(element_at(merged,
  * i)…)` — semantics and output types untouched.
  *
  * Registered via `GraftExtensions.injectOptimizerRule` — the engine's
  * example of the Rule[LogicalPlan] extension point (the parity
  * operators needed none; SURVEY §4). */
object CombineMarkerCounts extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p: Project =>
      // merge only calls whose input is resolvable from the child's
      // output — a call inside a higher-order-function lambda refers
      // to a lambda variable that would be unbound if hoisted into
      // the inner Project
      val calls = p.projectList.flatMap(_.collect {
        case mc: MarkerCounts
            if mc.child.deterministic &&
              mc.child.references.subsetOf(p.child.outputSet) => mc
      })
      // only groups where a merge actually reduces passes: >1 call
      // over the same input, whether the marker lists differ (union
      // them) or repeat (materialize once — CodegenFallback calls get
      // no guaranteed CSE, so duplicates pay a full scan each)
      val byChild = calls.groupBy(_.child.canonicalized)
        .filter { case (_, ms) => ms.size > 1 }
      if (byChild.isEmpty) p
      else {
        val mergedFor: Map[Expression0, (Alias, Seq[String])] =
          byChild.map { case (key, group) =>
            val merged = group.flatMap(_.markers).distinct
            key -> (Alias(MarkerCounts(group.head.child, merged),
              "_mc_merged")(), merged)
          }
        val inner = Project(
          p.child.output ++ mergedFor.values.map(_._1).toSeq, p.child)
        val attrFor: Map[Expression0, (Attribute, Seq[String])] =
          mergedFor.map { case (k, (a, m)) => k -> (a.toAttribute, m) }
        val outer = p.projectList.map { ne =>
          ne.transform {
            case mc: MarkerCounts if attrFor.contains(mc.child.canonicalized) =>
              val (attr, merged) = attrFor(mc.child.canonicalized)
              // NULL text → NULL counts (the original call's
              // null-propagation); without the guard the rebuilt
              // CreateArray would be a non-null array of nulls
              If(IsNull(attr), Literal.create(null, mc.dataType),
                CreateArray(mc.markers.map { m =>
                  ElementAt(attr, Literal(merged.indexOf(m) + 1, IntegerType))
                }))
          }.asInstanceOf[NamedExpression]
        }
        Project(outer, inner)
      }
  }

  private type Expression0 = org.apache.spark.sql.catalyst.expressions.Expression
}
