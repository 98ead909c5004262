package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.LongType

/** Optimizer rule: METADATA-ONLY aggregates over published shard
  * layouts — `COUNT(*)` / `MIN` / `MAX(zone col)` on a plain
  * `spark.read.parquet(s"$pub/data")` are answered from the manifest
  * WITHOUT opening a single data file (the Iceberg/Delta
  * metadata-only-query shape, and the distributed cousin of Spark's
  * own `OptimizeMetadataOnlyQuery` for partition-column-only queries).
  *
  * The rewrite is plan-to-plan, not plan-to-constant: the global
  * `Aggregate(count/min/max, <data scan>)` becomes
  * `Aggregate(sum(n_rows)/min(zmin_c)/max(zmax_c), <manifest scan>)`,
  * so execution stays ordinary codegen'd Spark over one row per shard
  * and every type's comparison semantics are Spark's own — the rule
  * never computes a value itself. At 100 TB this turns "how many rows
  * does the corpus hold, what date range" from a full scan into a
  * manifest read: the same numbers the publisher verified against the
  * published bytes (q87 proves the manifest truthful; this rule makes
  * the planner USE it).
  *
  * Soundness, case by case:
  *   - `COUNT(*)`/`COUNT(1)` = Σ n_rows — n_rows counts every row of
  *     the shard, null or not. Coalesce to 0 so an empty layout
  *     (no manifest rows) still answers 0 non-null, preserving
  *     Count's non-nullable schema.
  *   - `MIN(c)` = min over zmin_c: both sides ignore nulls (Spark's
  *     Min, and the publisher's min() when recording stats) — an
  *     all-null shard contributes a null zmin that Min skips, and an
  *     all-null LAYOUT answers null exactly as the data scan would.
  *     Max symmetric.
  * The rule fires ONLY on the exact global-aggregate shape (no
  * grouping, no filters anywhere below, no DISTINCT, no agg filter
  * clause, every aggregate rewritable, aggregated columns
  * zone-mapped): one unsupported element and the plan is left alone —
  * wrong answers are impossible, only missed savings. Kill switch:
  * `spark.graft.manifestAggregates.enabled=false`.
  */
object ManifestAggregates extends Rule[LogicalPlan] {

  private val EnabledKey = "spark.graft.manifestAggregates.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!SQLConf.get.getConfString(EnabledKey, "true").toBoolean) return plan
    plan.transform {
      case agg @ Aggregate(Nil, aggExprs, child, _) =>
        dataScanOf(child) match {
          case Some(fsr) =>
            rewrite(agg, aggExprs, fsr).getOrElse(agg)
          case None => agg
        }
    }
  }

  /** The layout data scan under the aggregate, looking through a
    * column-pruning Project of plain attributes. A Filter anywhere
    * disqualifies: the manifest answers whole-layout questions only
    * (zone-pruned + filtered aggregation keeps the row-level path —
    * ZoneMapSkipping already serves it). */
  private def dataScanOf(plan: LogicalPlan): Option[HadoopFsRelation] =
    plan match {
      case l: LogicalRelation => l.relation match {
        case fsr: HadoopFsRelation if ShardLayouts.isLayoutScan(fsr) => Some(fsr)
        case _ => None
      }
      case Project(projList, child) if projList.forall(
          _.isInstanceOf[AttributeReference]) => dataScanOf(child)
      case _ => None
    }

  private def rewrite(agg: Aggregate, aggExprs: Seq[NamedExpression],
                      fsr: HadoopFsRelation): Option[LogicalPlan] = {
    val spark = SparkSession.active
    ShardLayouts.manifestFor(spark, fsr.location.rootPaths.head).flatMap { mf =>
      // a FRESH resolved manifest scan (new exprIds per rewrite, no
      // attribute collisions with the rest of the query plan)
      val manifestPlan =
        try spark.read.parquet(mf.path).queryExecution.analyzed
        catch { case _: Exception => return None }
      def mAttr(name: String): Option[Attribute] =
        manifestPlan.output.find(_.name == name)

      val rewritten = aggExprs.map {
        case a @ Alias(ae: AggregateExpression, name) if !ae.isDistinct &&
            ae.filter.isEmpty && ae.mode == Complete =>
          val inner: Option[Expression] = ae.aggregateFunction match {
            case Count(Seq(c)) if c.foldable && c.deterministic &&
                c.eval() != null =>
              mAttr("n_rows").map(n => Coalesce(Seq(
                AggregateExpression(Sum(n), Complete, isDistinct = false),
                Literal(0L))))
            case Min(c: AttributeReference) if mf.zoneCols.contains(c.name) =>
              mAttr(s"zmin_${c.name}").map(z =>
                AggregateExpression(Min(z), Complete, isDistinct = false))
            case Max(c: AttributeReference) if mf.zoneCols.contains(c.name) =>
              mAttr(s"zmax_${c.name}").map(z =>
                AggregateExpression(Max(z), Complete, isDistinct = false))
            case _ => None
          }
          inner match {
            // keep the ORIGINAL exprId/name/type so consumers above the
            // aggregate resolve unchanged
            case Some(e) if e.dataType == a.dataType =>
              Some(Alias(e, name)(exprId = a.exprId))
            case _ => None
          }
        case _ => None
      }
      // all-or-nothing: one unsupported aggregate keeps the data scan
      if (rewritten.forall(_.isDefined)) {
        val nRows = mf.rows.length
        logInfo(s"manifest-only aggregate at ${mf.path}: " +
          s"${aggExprs.length} aggregate(s) answered from $nRows shard rows")
        Some(Aggregate(Nil, rewritten.map(_.get), manifestPlan))
      } else None
    }
  }
}
