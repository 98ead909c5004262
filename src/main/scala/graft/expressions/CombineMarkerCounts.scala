package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, CreateArray, ElementAt, If, IsNull, Literal, NamedExpression, With}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
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
    // Predicate pushdown re-inlines projected marker_counts into Filter
    // conditions — a quality-gate like q31's turns into ~46 calls PER
    // INPUT ROW below the projection (CodegenFallback ⇒ no codegen CSE
    // rescues it). Hoist: materialize ONE merged counts array in a
    // Project under the filter, remap every call to an element_at over
    // it, and restore the original output above. Safe against
    // re-pushdown because injected rules run in the LAST optimizer
    // batch ("User Provided Optimizers"), after every PushDownPredicates
    // fixpoint. Idempotent: the rewritten condition carries no
    // MarkerCounts, so the match cannot fire twice; the sibling Project
    // case sees a single merged call and leaves it alone.
    case f @ Filter(cond, child) =>
      val calls = cond.collect {
        case mc: MarkerCounts
            if mc.child.deterministic &&
              mc.child.references.subsetOf(child.outputSet) => mc
      }
      val byChild = calls.groupBy(_.child.canonicalized)
        .filter { case (_, ms) => ms.size > 1 }
      if (byChild.isEmpty) f
      else {
        val keys = byChild.keys.toSeq
        val mergedMarkers: Map[Expression0, Seq[String]] =
          byChild.map { case (k, ms) => k -> ms.flatMap(_.markers).distinct }
        val aliasFor: Map[Expression0, Alias] = keys.map { k =>
          // the barrier pins the hoist: without it PushDownPredicates
          // (same fixpoint batch) pushes the filter back through this
          // Project and re-inlines a full scan per call site
          k -> Alias(OptimizationBarrier(
            MarkerCounts(byChild(k).head.child, mergedMarkers(k))),
            "_mc_pushed")()
        }.toMap
        val attrFor: Map[Expression0, Attribute] =
          aliasFor.map { case (k, a) => k -> a.toAttribute }
        val cond2 = cond.transform {
          // the common shape the scoring library emits — a single
          // element pick: remap the index into the merged array
          case ElementAt(mc: MarkerCounts, Literal(i: Int, IntegerType), d, fe)
              if attrFor.contains(mc.child.canonicalized) &&
                i >= 1 && i <= mc.markers.length =>
            val merged = mergedMarkers(mc.child.canonicalized)
            ElementAt(attrFor(mc.child.canonicalized),
              Literal(merged.indexOf(mc.markers(i - 1)) + 1, IntegerType), d, fe)
          case mc: MarkerCounts if attrFor.contains(mc.child.canonicalized) =>
            val attr = attrFor(mc.child.canonicalized)
            val merged = mergedMarkers(mc.child.canonicalized)
            If(IsNull(attr), Literal.create(null, mc.dataType),
              CreateArray(mc.markers.map { m =>
                ElementAt(attr, Literal(merged.indexOf(m) + 1, IntegerType))
              }))
        }
        val inner = Project(child.output ++ keys.map(aliasFor), child)
        Project(child.output, Filter(cond2, inner))
      }

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
