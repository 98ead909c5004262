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
  *   - `COUNT(c)` (non-distinct, c zone-mapped) = Σ (n_rows −
  *     znull_c), ONLY when every manifest row carries a recorded
  *     null count — a legacy generation carried forward by a delta
  *     publish has znull = null (unknown) and the rule bails rather
  *     than undercount.
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

  /** Reader options that restrict WHICH FILES a scan lists — under
    * any of these the relation no longer covers the whole layout, so
    * manifest answers (which always describe every shard) would be
    * wrong. Bail. */
  private val FileRestrictingOptions =
    Set("pathglobfilter", "modifiedafter", "modifiedbefore",
      // corrupt/missing-tolerant scans can legitimately return FEWER
      // rows than the manifest describes — the metadata answer would
      // diverge from what the scan would have returned
      "ignorecorruptfiles", "ignoremissingfiles")

  /** The layout data scan under the aggregate, looking through a
    * column-pruning Project of plain attributes. A Filter anywhere
    * disqualifies: the manifest answers whole-layout questions only
    * (zone-pruned + filtered aggregation keeps the row-level path —
    * ZoneMapSkipping already serves it). So does any file-restricting
    * reader option: a glob/modified-time-restricted scan reads a
    * SUBSET of the layout and must aggregate what it reads. */
  private def dataScanOf(plan: LogicalPlan): Option[HadoopFsRelation] =
    plan match {
      case l: LogicalRelation => l.relation match {
        case fsr: HadoopFsRelation if ShardLayouts.isLayoutScan(fsr) &&
            !fsr.options.keysIterator.exists(k =>
              FileRestrictingOptions.contains(k.toLowerCase(
                java.util.Locale.ROOT))) &&
            // the session-wide conf flags restrict files the same way
            // the reader options do
            !SQLConf.get.ignoreCorruptFiles &&
            !SQLConf.get.ignoreMissingFiles => Some(fsr)
        case _ => None
      }
      case Project(projList, child) if projList.forall(
          _.isInstanceOf[AttributeReference]) => dataScanOf(child)
      case _ => None
    }

  /** A rewritable aggregate's manifest recipe: which stat column to
    * aggregate, and how. */
  private sealed trait Recipe
  private case object CountRows extends Recipe
  private final case class CountCol(zoneCol: String) extends Recipe
  private final case class MinStat(zoneCol: String) extends Recipe
  private final case class MaxStat(zoneCol: String) extends Recipe

  /** COUNT(col) = Σ (n_rows - znull_col), but ONLY when every cached
    * manifest row carries a recorded null count — a legacy generation
    * carried forward by a delta publish has znull = NULL (unknown),
    * and Sum would silently SKIP it, undercounting. */
  private def znullComplete(mf: ShardLayouts.CachedManifest,
                            c: String): Boolean = {
    val i = mf.attrs.indexWhere(a => a.name == s"znull_$c" &&
      a.dataType == LongType)
    i >= 0 && mf.rows.forall(!_.isNullAt(i))
  }

  private def rewrite(agg: Aggregate, aggExprs: Seq[NamedExpression],
                      fsr: HadoopFsRelation): Option[LogicalPlan] = {
    val spark = SparkSession.active
    ShardLayouts.manifestFor(spark, fsr.location.rootPaths.head).flatMap { mf =>
      // PHASE 1 — free all-or-nothing shape check against the CACHED
      // zone set, before paying the manifest scan's driver-side
      // listing: a permanently-unrewritable plan (avg, distinct, a
      // non-zone column) must bail without I/O, or every fixpoint
      // iteration repeats the read.
      val recipes: Seq[Option[(Alias, Recipe)]] = aggExprs.map {
        case a @ Alias(ae: AggregateExpression, _) if !ae.isDistinct &&
            ae.filter.isEmpty && ae.mode == Complete =>
          (ae.aggregateFunction match {
            case Count(Seq(c)) if c.foldable && c.deterministic &&
                c.eval() != null => Some(CountRows)
            case Count(Seq(c: AttributeReference))
                if mf.zoneCols.contains(c.name) &&
                  znullComplete(mf, c.name) => Some(CountCol(c.name))
            case Min(c: AttributeReference)
                if mf.zoneCols.contains(c.name) => Some(MinStat(c.name))
            case Max(c: AttributeReference)
                if mf.zoneCols.contains(c.name) => Some(MaxStat(c.name))
            case _ => None
          }).map(r => (a, r))
        case _ => None
      }
      if (!recipes.forall(_.isDefined)) return None

      // PHASE 2 — a FRESH resolved manifest scan (new exprIds per
      // rewrite, no attribute collisions with the rest of the plan).
      // Generation re-check first: phase 1 validated znull
      // completeness/zone membership against the CACHED rows, but the
      // plan emitted here scans the manifest as it is NOW — a delta
      // publish landing in between could introduce NULL-znull rows
      // that Sum silently skips (undercounting COUNT(col)) or answer
      // from a generation phase 1 never validated. Bail to the data
      // scan on any drift.
      try {
        val mPath = new org.apache.hadoop.fs.Path(mf.path)
        val fs = mPath.getFileSystem(spark.sessionState.newHadoopConf())
        if (ShardLayouts.generationToken(fs, mPath) != mf.token) return None
      } catch { case _: Exception => return None }
      val manifestPlan =
        try spark.read.parquet(mf.path).queryExecution.analyzed
        catch { case _: Exception => return None }
      def mAttr(name: String): Option[Attribute] =
        manifestPlan.output.find(_.name == name)

      val rewritten = recipes.map(_.get).map { case (a, recipe) =>
        val inner: Option[Expression] = recipe match {
          case CountRows =>
            mAttr("n_rows").map(n => Coalesce(Seq(
              AggregateExpression(Sum(n), Complete, isDistinct = false),
              Literal(0L))))
          case CountCol(c) =>
            for (n <- mAttr("n_rows"); z <- mAttr(s"znull_$c"))
              yield Coalesce(Seq(
                AggregateExpression(Sum(Subtract(n, z)), Complete,
                  isDistinct = false),
                Literal(0L)))
          case MinStat(c) => mAttr(s"zmin_$c").map(z =>
            AggregateExpression(Min(z), Complete, isDistinct = false))
          case MaxStat(c) => mAttr(s"zmax_$c").map(z =>
            AggregateExpression(Max(z), Complete, isDistinct = false))
        }
        inner match {
          // keep the ORIGINAL exprId/name/type so consumers above the
          // aggregate resolve unchanged
          case Some(e) if e.dataType == a.dataType =>
            Some(Alias(e, a.name)(exprId = a.exprId))
          case _ => None
        }
      }
      // stat columns must also exist with the right types in the
      // freshly-read manifest (a foreign manifest bails here)
      if (rewritten.forall(_.isDefined)) {
        logInfo(s"manifest-only aggregate at ${mf.path}: " +
          s"${aggExprs.length} aggregate(s) answered from " +
          s"${mf.rows.length} shard rows")
        Some(Aggregate(Nil, rewritten.map(_.get), manifestPlan))
      } else None
    }
  }
}
