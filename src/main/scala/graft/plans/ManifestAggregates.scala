package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

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
  *   - `MIN`/`MAX` of the layout's IDENTITY column = min/max over
  *     min_id/max_id — stats every manifest row carries regardless of
  *     zone declarations; the `spec_id` stamp names the column, and
  *     the rewrite requires every row to agree non-null on it (a
  *     legacy carry has spec_id = null → bail).
  *   - `SUM(c)` (c an INTEGRAL zone column) = Σ zsum_c: long adds are
  *     associative even under two's-complement wrap, so the per-shard
  *     split is bit-exact however either side orders the adds. A NULL
  *     zsum is accepted only when znull == n_rows proves the shard
  *     all-null (the scan's Sum skips those rows too); any other NULL
  *     is a legacy carry and the rule bails. Float sums never rewrite
  *     (rounding is order-dependent).
  * The rule fires ONLY on the exact global-aggregate shape (no
  * grouping, no filters anywhere below, no DISTINCT, no agg filter
  * clause, every aggregate rewritable, aggregated columns
  * zone-mapped): one unsupported element and the plan is left alone —
  * wrong answers are impossible, only missed savings. Kill switch:
  * `spark.graft.manifestAggregates.enabled=false`.
  */
object ManifestAggregates extends Rule[LogicalPlan] with PredicateHelper {

  private val EnabledKey = "spark.graft.manifestAggregates.enabled"
  private val FilteredCountKey =
    "spark.graft.manifestAggregates.filteredCount.enabled"

  /** Types whose Sum is exactly decomposable into per-shard partials:
    * long addition is associative even under two's-complement wrap, so
    * Σ zsum ≡ the data scan's Sum bit-for-bit regardless of either
    * side's add order. Floats are NOT (rounding depends on order) and
    * never rewrite. */
  private def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private val GroupedKey =
    "spark.graft.manifestAggregates.grouped.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!SQLConf.get.getConfString(EnabledKey, "true").toBoolean) return plan
    plan.transform {
      case agg @ Aggregate(Nil, aggExprs, child, _) =>
        dataScanOf(child) match {
          case Some(fsr) =>
            rewrite(agg, aggExprs, fsr).getOrElse(agg)
          case None => filteredScanOf(child) match {
            case Some((cond, l, fsr)) if SQLConf.get.getConfString(
                FilteredCountKey, "true").toBoolean =>
              rewriteFilteredCount(agg, aggExprs, cond, l, fsr)
                .getOrElse(agg)
            case _ => agg
          }
        }
      case agg @ Aggregate(Seq(a: AttributeReference), aggExprs, child, _)
          if SQLConf.get.getConfString(GroupedKey, "true").toBoolean =>
        dataScanOf(child) match {
          case Some(fsr) =>
            rewriteGrouped(agg, a, aggExprs, fsr).getOrElse(agg)
          case None => filteredScanOf(child) match {
            case Some((cond, l, fsr)) if SQLConf.get.getConfString(
                FilteredCountKey, "true").toBoolean =>
              rewriteGroupedFiltered(agg, a, aggExprs, cond, l, fsr)
                .getOrElse(agg)
            case _ => agg
          }
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
  private final case class SumStat(zoneCol: String) extends Recipe
  // MIN/MAX of the layout's declared identity column — answered from
  // the min_id/max_id stats EVERY manifest row carries (no zone
  // declaration needed; the spec_id stamp names the column)
  private case object MinId extends Recipe
  private case object MaxId extends Recipe

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

  /** SUM(col) = Σ zsum_col (long adds are associative even under wrap,
    * so the split into per-shard partials is bit-exact; the publisher
    * records zsum only for INTEGRAL zone columns for this reason).
    * A NULL zsum is legitimate exactly when the shard's column is
    * all-null (znull == n_rows: the data scan's Sum skips those rows
    * too) — any other NULL is a legacy carry with an UNKNOWN sum and
    * the rule must bail rather than under-add. */
  private def zsumComplete(mf: ShardLayouts.CachedManifest,
                           c: String): Boolean = {
    val si = mf.attrs.indexWhere(a => a.name == s"zsum_$c" &&
      a.dataType == LongType)
    val zi = mf.attrs.indexWhere(a => a.name == s"znull_$c" &&
      a.dataType == LongType)
    val ni = mf.attrs.indexWhere(a => a.name == "n_rows" &&
      a.dataType == LongType)
    si >= 0 && zi >= 0 && ni >= 0 && mf.rows.forall(r =>
      !r.isNullAt(si) || (!r.isNullAt(zi) && !r.isNullAt(ni) &&
        r.getLong(zi) == r.getLong(ni)))
  }

  /** The layout data scan under a FILTER (plus attribute-only Projects
    * on either side) — the shape the filtered-count rewrite serves.
    * Same file-restriction bails as [[dataScanOf]]. */
  private def filteredScanOf(plan: LogicalPlan)
      : Option[(Expression, LogicalRelation, HadoopFsRelation)] =
    plan match {
      case Filter(cond, inner) =>
        def strip(p: LogicalPlan): Option[LogicalRelation] = p match {
          case l: LogicalRelation => Some(l)
          case Project(pl, c) if pl.forall(
              _.isInstanceOf[AttributeReference]) => strip(c)
          case _ => None
        }
        strip(inner).flatMap { l =>
          l.relation match {
            case fsr: HadoopFsRelation if ShardLayouts.isLayoutScan(fsr) &&
                !fsr.options.keysIterator.exists(k =>
                  FileRestrictingOptions.contains(k.toLowerCase(
                    java.util.Locale.ROOT))) &&
                !SQLConf.get.ignoreCorruptFiles &&
                !SQLConf.get.ignoreMissingFiles => Some((cond, l, fsr))
            case _ => None
          }
        }
      case Project(pl, child) if pl.forall(
          _.isInstanceOf[AttributeReference]) => filteredScanOf(child)
      case _ => None
    }

  /** PARTITION-ALIGNED FILTERED AGGREGATES: global `COUNT(*)` /
    * `COUNT(col)` / `SUM(integral zone col)` / `MIN`/`MAX(zone or id
    * col)` under a conjunctive zone-column filter, split shard-by-shard
    * into
    *   - FULL shards (every row provably passes —
    *     [[ZoneMapSkipping.toFullPredicate]]): answered from the
    *     manifest row alone (n_rows, n_rows − znull, zsum, zmin/zmax,
    *     min_id/max_id), zero data files opened. Full-pass is exactly
    *     what makes the per-shard stats usable under a filter: all
    *     rows pass, so the unfiltered stat IS the filtered answer;
    *   - PARTIAL shards (may intersect but not provably full): the
    *     ORIGINAL aggregates over the original filter, restricted to
    *     those shards by a `shard IN` partition-pruning conjunct;
    *   - the rest: provably disjoint, dropped.
    * The emitted plan re-combines with the aggregate's own merge
    * semantics — Sum over the union for the additive stats (count
    * shapes get the empty-input Coalesce-to-0, Sum keeps SQL's
    * null-on-no-rows), Min/Max over the union for the order stats —
    * plan-to-plan like every rewrite here; the rule computes shard
    * CLASSIFICATION driver-side (bounded, cached manifest) but never
    * an answer. At 100 TB this is the Iceberg residual-planning shape:
    * "rows + revenue + date range in this window" opens only the
    * boundary shards.
    *
    * All-or-nothing: EVERY conjunct must be full-analyzable (a value
    * shape toFullPredicate proves, or a shard-membership conjunct a
    * prior ZoneMapSkipping pass added — evaluated exactly against each
    * row's shard id), and every aggregate must map to a stat recipe
    * (same soundness gates as the unfiltered rewrites: znull
    * completeness for COUNT(col), zsum completeness + integral type
    * for SUM, the spec_id stamp for id min/max). One unsupported
    * element → plan untouched. Termination under the fixpoint batch:
    * the rewritten partial branch carries a `shard IN (partial)`
    * conjunct that is DISJOINT from any full set a re-entry could
    * prove (partial = keep ∖ full against the same cached stats), so
    * re-entry finds no full shards and bails. */
  private def rewriteFilteredCount(agg: Aggregate,
                                   aggExprs: Seq[NamedExpression],
                                   cond: Expression,
                                   l: LogicalRelation,
                                   fsr: HadoopFsRelation): Option[LogicalPlan] = try {
    val spark = SparkSession.active
    if (aggExprs.isEmpty) return None
    // int/long shard attr on the data side (partition-type inference
    // off discovers STRING — the IN conjunct below would match nothing)
    val shardAttr = l.output.find(a => a.name == "shard" &&
      (a.dataType == IntegerType || a.dataType == LongType))
      .getOrElse(return None)
    ShardLayouts.manifestFor(spark, fsr.location.rootPaths.head).flatMap { mf =>
      // ---- map every aggregate to its full-shard stat recipe, with
      // the SAME soundness gates as the unfiltered rewrites (znull
      // completeness for COUNT(col), zsum completeness + integral type
      // for SUM, the spec_id stamp for id min/max) — all-or-nothing
      val fstats: Seq[Option[(Alias, Recipe)]] = aggExprs.map {
        case a @ Alias(ae: AggregateExpression, _) =>
          recipeOf(mf, ae).map(r => (a, r))
        case _ => None
      }
      if (!fstats.forall(_.isDefined)) return None
      val recipes: Seq[(Alias, Recipe)] = fstats.map(_.get)
      // no provably-full shard: nothing the data scan + ZoneMapSkipping
      // don't already do better — ALSO the termination anchor (see doc)
      val (full, partial) = classifyShards(cond, mf).getOrElse(return None)
      if (full.isEmpty) return None

      // ---- phase 2: generation re-check + fresh manifest plan (the
      // classification above used the CACHED rows)
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
      val mShard = manifestPlan.output.find(a => a.name == "shard" &&
        a.dataType == LongType).getOrElse(return None)

      def inSet(attr: Attribute, ids: Seq[Long]): Expression =
        if (ids.length <= 100)
          In(attr, ids.sorted.map(shardLit(_, attr)))
        else InSet(attr, ids.map(shardVal(_, attr)).toSet)

      // full-shard contribution, one manifest-stat column per aggregate
      // (stat columns must exist with the right types in the FRESH
      // manifest — a foreign manifest bails here)
      val fullCols: Seq[Expression] = recipes.map { case (_, r) =>
        (r match {
          case CountRows => mAttr("n_rows")
          case CountCol(c) =>
            for (n <- mAttr("n_rows"); z <- mAttr(s"znull_$c"))
              yield Subtract(n, z): Expression
          case SumStat(c) => mAttr(s"zsum_$c")
          case MinStat(c) => mAttr(s"zmin_$c")
          case MaxStat(c) => mAttr(s"zmax_$c")
          case MinId      => mAttr("min_id")
          case MaxId      => mAttr("max_id")
        }).getOrElse(return None)
      }
      // the original aggregates over the original filter, restricted
      // to the partial shards — one column per aggregate, same order
      val partialAggs: Seq[Alias] = recipes.zipWithIndex.map {
        case ((a, _), i) => Alias(a.child, s"s$i")()
      }
      // Union demands exact per-column type agreement between branches;
      // a stat recorded at a different type than the aggregate's own
      // result (possible only for a foreign/stale manifest) must bail
      if (!fullCols.zip(partialAggs).forall { case (f, p) =>
          f.dataType == p.dataType }) return None
      val fullBranch = Project(
        fullCols.zipWithIndex.map { case (e, i) => Alias(e, s"s$i")() },
        Filter(inSet(mShard, full.toSeq), manifestPlan))
      val inner: LogicalPlan =
        if (partial.isEmpty) fullBranch
        else Union(Seq(fullBranch, Aggregate(Nil, partialAggs,
          Filter(And(cond, inSet(shardAttr, partial.toSeq)), l))))

      // re-combine with each aggregate's own merge semantics: Sum for
      // the additive stats (count shapes keep Count's 0-on-empty via
      // Coalesce; Sum keeps SQL's null-on-no-rows), Min/Max for the
      // order stats
      val u = inner.output
      val rewritten = recipes.zipWithIndex.map { case ((a, r), i) =>
        val combined: Expression = r match {
          case CountRows | CountCol(_) => Coalesce(Seq(
            AggregateExpression(Sum(u(i)), Complete, isDistinct = false),
            Literal(0L)))
          case SumStat(_) =>
            AggregateExpression(Sum(u(i)), Complete, isDistinct = false)
          case MinStat(_) | MinId =>
            AggregateExpression(Min(u(i)), Complete, isDistinct = false)
          case MaxStat(_) | MaxId =>
            AggregateExpression(Max(u(i)), Complete, isDistinct = false)
        }
        // keep the ORIGINAL exprId/name/type so consumers above the
        // aggregate resolve unchanged; a type drift must bail, not
        // mis-type the plan
        if (combined.dataType != a.dataType) return None
        Alias(combined, a.name)(exprId = a.exprId)
      }
      logInfo(s"filtered metadata aggregate at " +
        s"${fsr.location.rootPaths.head}: ${recipes.length} aggregate(s), " +
        s"${full.length} full + ${partial.length} partial of " +
        s"${mf.rows.length} shards")
      Some(Aggregate(Nil, rewritten, inner))
    }
  } catch {
    // an optimization only: any surprise (foreign manifest, odd types)
    // leaves the user's plan untouched
    case e: Exception =>
      logWarning(s"filtered-count rewrite disabled for this scan: $e")
      None
  }

  /** GROUPED METADATA AGGREGATES: `GROUP BY <zone col>` over a layout
    * whose every shard is provably SINGLE-GROUP — all rows share one
    * non-null value of the group column (`znull == 0 ∧ zmin == zmax`)
    * or are all null (`znull == n_rows`) — answered entirely from the
    * manifest: the Iceberg partition-stats shape ("rows and revenue
    * per language/day") at one-row-per-shard cost. Single-group is
    * what makes EVERY whole-shard stat attributable to that one group,
    * so the same recipes as the global rewrite apply per group:
    * COUNT(*) = Σ n_rows, COUNT(c) = Σ (n_rows − znull_c),
    * SUM(integral c) = Σ zsum_c, MIN/MAX from zmin/zmax/min_id/max_id,
    * merged by an ordinary grouped Aggregate over the manifest scan —
    * multiple shards of the same group value combine exactly as the
    * data scan's partial aggregates would. The group value itself is
    * `znull == n_rows ? NULL : zmin` (all-null shards form the scan's
    * NULL group), and empty shards are filtered out (`n_rows > 0`) —
    * the data scan emits no group for them. The bare
    * `SELECT DISTINCT <zone col>` shape (no aggregates) rides the same
    * rewrite. All-or-nothing over shards AND aggregates; one
    * unprovable element → plan untouched. Kill switch:
    * `spark.graft.manifestAggregates.grouped.enabled=false`. */
  private def rewriteGrouped(agg: Aggregate, a: AttributeReference,
                             aggExprs: Seq[NamedExpression],
                             fsr: HadoopFsRelation): Option[LogicalPlan] = try {
    val spark = SparkSession.active
    ShardLayouts.manifestFor(spark, fsr.location.rootPaths.head).flatMap { mf =>
      if (!mf.zoneCols.contains(a.name)) return None
      // typed ordinals against the CACHED manifest (a read schema
      // re-typing the column must bail, not compare across types)
      def cOrd(n: String, t: DataType): Int =
        mf.attrs.indexWhere(x => x.name == n && x.dataType == t)
      val loI = cOrd(s"zmin_${a.name}", a.dataType)
      val hiI = cOrd(s"zmax_${a.name}", a.dataType)
      val nI = cOrd("n_rows", LongType)
      val zI = cOrd(s"znull_${a.name}", LongType)
      if (loI < 0 || hiI < 0 || nI < 0 || zI < 0) return None
      val ordering = org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(a.dataType)
      // PHASE 1a — every shard single-group against the cached rows
      val singleGroup = mf.rows.forall { r =>
        !r.isNullAt(nI) && !r.isNullAt(zI) && {
          val n = r.getLong(nI)
          val z = r.getLong(zI)
          n == 0L || z == n ||
            (z == 0L && !r.isNullAt(loI) && !r.isNullAt(hiI) &&
              ordering.compare(r.get(loI, a.dataType),
                r.get(hiI, a.dataType)) == 0)
        }
      }
      if (!singleGroup) return None
      // PHASE 1b — every output either passes the group value through
      // or maps to a stat recipe
      val mapped: Seq[Option[Either[NamedExpression, (Alias, Recipe)]]] =
        aggExprs.map {
          case ar: AttributeReference if ar.exprId == a.exprId =>
            Some(scala.util.Left(ar))
          case al @ Alias(ar: AttributeReference, _)
              if ar.exprId == a.exprId => Some(scala.util.Left(al))
          case al @ Alias(ae: AggregateExpression, _) =>
            recipeOf(mf, ae).map(r => scala.util.Right((al, r)))
          case _ => None
        }
      if (!mapped.forall(_.isDefined)) return None

      // PHASE 2 — generation re-check + fresh manifest plan (same
      // staleness discipline as every other door here)
      try {
        val mPath = new org.apache.hadoop.fs.Path(mf.path)
        val fs = mPath.getFileSystem(spark.sessionState.newHadoopConf())
        if (ShardLayouts.generationToken(fs, mPath) != mf.token) return None
      } catch { case _: Exception => return None }
      val manifestPlan =
        try spark.read.parquet(mf.path).queryExecution.analyzed
        catch { case _: Exception => return None }
      def mAttrT(name: String, t: DataType): Option[Attribute] =
        manifestPlan.output.find(x => x.name == name && x.dataType == t)
      def mAttr(name: String): Option[Attribute] =
        manifestPlan.output.find(_.name == name)
      val lo = mAttrT(s"zmin_${a.name}", a.dataType).getOrElse(return None)
      val nRows = mAttrT("n_rows", LongType).getOrElse(return None)
      val znull = mAttrT(s"znull_${a.name}", LongType).getOrElse(return None)
      // the shard's one group value; all-null shards form the NULL group
      val groupVal: Expression =
        If(EqualTo(znull, nRows), Literal(null, a.dataType), lo)
      val rewritten: Seq[NamedExpression] = mapped.map(_.get).map {
        case scala.util.Left(ne) =>
          if (groupVal.dataType != ne.dataType) return None
          Alias(groupVal, ne.name)(exprId = ne.exprId)
        case scala.util.Right((al, recipe)) =>
          statAggExprOf(recipe, mAttr) match {
            case Some(e) if e.dataType == al.dataType =>
              Alias(e, al.name)(exprId = al.exprId)
            case _ => return None
          }
      }
      logInfo(s"grouped metadata aggregate at ${mf.path}: " +
        s"GROUP BY ${a.name} over ${mf.rows.length} shard rows, " +
        s"zero data files")
      Some(Aggregate(Seq(groupVal), rewritten,
        Filter(GreaterThan(nRows, Literal(0L)), manifestPlan)))
    }
  } catch {
    // an optimization only: any surprise leaves the user's plan alone
    case e: Exception =>
      logWarning(s"grouped metadata aggregate disabled for this scan: $e")
      None
  }

  /** GROUPED + FILTERED METADATA AGGREGATES — the composition of the
    * two doors above: `GROUP BY <single-group zone col>` under a
    * conjunctive zone filter ("docs and chars per language in this
    * date window"). Every shard is single-group on the grouping column
    * (same proof as [[rewriteGrouped]]), the filter classifies shards
    * FULL / PARTIAL / disjoint (same classification as the filtered
    * door), and the emitted plan unions (a) one manifest row per FULL
    * shard projecting [group value, per-aggregate stat contribution]
    * with (b) the ORIGINAL grouped aggregate over the filter restricted
    * to the PARTIAL shards — then re-groups with each aggregate's own
    * merge. A partial shard contributes at most one group (it is
    * single-group), and its rows that fail the filter are dropped by
    * the row-level path exactly as the unrewritten plan would.
    * Termination: the partial branch's `shard IN` conjunct re-enters
    * with an empty FULL set (partial = keep ∖ full on the same cached
    * stats) and bails. Gated by BOTH kill switches. */
  private def rewriteGroupedFiltered(agg: Aggregate, a: AttributeReference,
                                     aggExprs: Seq[NamedExpression],
                                     cond: Expression,
                                     l: LogicalRelation,
                                     fsr: HadoopFsRelation): Option[LogicalPlan] = try {
    val spark = SparkSession.active
    val shardAttr = l.output.find(x => x.name == "shard" &&
      (x.dataType == IntegerType || x.dataType == LongType))
      .getOrElse(return None)
    ShardLayouts.manifestFor(spark, fsr.location.rootPaths.head).flatMap { mf =>
      if (!mf.zoneCols.contains(a.name)) return None
      def cOrd(n: String, t: DataType): Int =
        mf.attrs.indexWhere(x => x.name == n && x.dataType == t)
      val loI = cOrd(s"zmin_${a.name}", a.dataType)
      val hiI = cOrd(s"zmax_${a.name}", a.dataType)
      val nI = cOrd("n_rows", LongType)
      val zI = cOrd(s"znull_${a.name}", LongType)
      if (loI < 0 || hiI < 0 || nI < 0 || zI < 0) return None
      val ordering = org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(a.dataType)
      val singleGroup = mf.rows.forall { r =>
        !r.isNullAt(nI) && !r.isNullAt(zI) && {
          val n = r.getLong(nI)
          val z = r.getLong(zI)
          n == 0L || z == n ||
            (z == 0L && !r.isNullAt(loI) && !r.isNullAt(hiI) &&
              ordering.compare(r.get(loI, a.dataType),
                r.get(hiI, a.dataType)) == 0)
        }
      }
      if (!singleGroup) return None
      val mapped: Seq[Option[Either[NamedExpression, (Alias, Recipe)]]] =
        aggExprs.map {
          case ar: AttributeReference if ar.exprId == a.exprId =>
            Some(scala.util.Left(ar))
          case al @ Alias(ar: AttributeReference, _)
              if ar.exprId == a.exprId => Some(scala.util.Left(al))
          case al @ Alias(ae: AggregateExpression, _) =>
            recipeOf(mf, ae).map(r => scala.util.Right((al, r)))
          case _ => None
        }
      if (!mapped.forall(_.isDefined)) return None
      val outs = mapped.map(_.get)
      val rights: Seq[(Alias, Recipe)] = outs.collect {
        case scala.util.Right(p) => p
      }
      val (full, partial) = classifyShards(cond, mf).getOrElse(return None)
      if (full.isEmpty) return None

      // phase 2: generation re-check + fresh manifest plan
      try {
        val mPath = new org.apache.hadoop.fs.Path(mf.path)
        val fs = mPath.getFileSystem(spark.sessionState.newHadoopConf())
        if (ShardLayouts.generationToken(fs, mPath) != mf.token) return None
      } catch { case _: Exception => return None }
      val manifestPlan =
        try spark.read.parquet(mf.path).queryExecution.analyzed
        catch { case _: Exception => return None }
      def mAttrT(name: String, t: DataType): Option[Attribute] =
        manifestPlan.output.find(x => x.name == name && x.dataType == t)
      def mAttr(name: String): Option[Attribute] =
        manifestPlan.output.find(_.name == name)
      val lo = mAttrT(s"zmin_${a.name}", a.dataType).getOrElse(return None)
      val nRows = mAttrT("n_rows", LongType).getOrElse(return None)
      val znull = mAttrT(s"znull_${a.name}", LongType).getOrElse(return None)
      val mShard = mAttrT("shard", LongType).getOrElse(return None)
      val groupVal: Expression =
        If(EqualTo(znull, nRows), Literal(null, a.dataType), lo)
      if (groupVal.dataType != a.dataType) return None

      def inSet(attr: Attribute, ids: Seq[Long]): Expression =
        if (ids.length <= 100)
          In(attr, ids.sorted.map(shardLit(_, attr)))
        else InSet(attr, ids.map(shardVal(_, attr)).toSet)

      // full branch: [group value, one stat contribution per aggregate]
      val fullCols: Seq[Expression] = rights.map { case (_, r) =>
        (r match {
          case CountRows => mAttr("n_rows")
          case CountCol(c) =>
            for (n <- mAttr("n_rows"); z <- mAttr(s"znull_$c"))
              yield Subtract(n, z): Expression
          case SumStat(c) => mAttr(s"zsum_$c")
          case MinStat(c) => mAttr(s"zmin_$c")
          case MaxStat(c) => mAttr(s"zmax_$c")
          case MinId      => mAttr("min_id")
          case MaxId      => mAttr("max_id")
        }).getOrElse(return None)
      }
      // partial branch: the ORIGINAL grouped aggregate restricted to
      // the partial shards — [group col, original aggregates]
      val partialAggs: Seq[NamedExpression] =
        Alias(a, "g")() +: rights.zipWithIndex.map { case ((al, _), i) =>
          Alias(al.child, s"s$i")()
        }
      if (!fullCols.zip(rights).forall { case (f, (al, _)) =>
          f.dataType == al.dataType }) return None
      val fullBranch = Project(
        Alias(groupVal, "g")() +: fullCols.zipWithIndex.map {
          case (e, i) => Alias(e, s"s$i")()
        },
        Filter(inSet(mShard, full), manifestPlan))
      val inner: LogicalPlan =
        if (partial.isEmpty) fullBranch
        else Union(Seq(fullBranch, Aggregate(Seq(a), partialAggs,
          Filter(And(cond, inSet(shardAttr, partial)), l))))

      val u = inner.output
      val groupU = u.head
      var ri = 0
      val rewritten: Seq[NamedExpression] = outs.map {
        case scala.util.Left(ne) =>
          Alias(groupU, ne.name)(exprId = ne.exprId)
        case scala.util.Right((al, r)) =>
          val col = u(1 + ri); ri += 1
          val combined: Expression = r match {
            case CountRows | CountCol(_) => Coalesce(Seq(
              AggregateExpression(Sum(col), Complete, isDistinct = false),
              Literal(0L)))
            case SumStat(_) =>
              AggregateExpression(Sum(col), Complete, isDistinct = false)
            case MinStat(_) | MinId =>
              AggregateExpression(Min(col), Complete, isDistinct = false)
            case MaxStat(_) | MaxId =>
              AggregateExpression(Max(col), Complete, isDistinct = false)
          }
          if (combined.dataType != al.dataType) return None
          Alias(combined, al.name)(exprId = al.exprId)
      }
      logInfo(s"grouped filtered metadata aggregate at " +
        s"${fsr.location.rootPaths.head}: GROUP BY ${a.name}, " +
        s"${full.length} full + ${partial.length} partial of " +
        s"${mf.rows.length} shards")
      Some(Aggregate(Seq(groupU), rewritten, inner))
    }
  } catch {
    case e: Exception =>
      logWarning(s"grouped-filtered rewrite disabled for this scan: $e")
      None
  }

  /** Classify every shard under a conjunctive zone filter against the
    * CACHED manifest, all-or-nothing: (FULL — every row provably
    * passes, [[ZoneMapSkipping.toFullPredicate]]; PARTIAL — may
    * intersect but not provably full). Shards ruled out by the
    * may-intersect test are dropped entirely. None when any conjunct
    * is unanalyzable (not a provable value shape and not a
    * shard-membership conjunct a prior zone pass added). */
  private def classifyShards(cond: Expression,
                             mf: ShardLayouts.CachedManifest)
      : Option[(Seq[Long], Seq[Long])] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val (shardConjs, valueConjs) = conjuncts.partition(
      _.references.forall(_.name == "shard"))
    val shardChecks: Seq[Long => Boolean] =
      shardConjs.map(shardCheckOf(_).getOrElse(return None))
    val fullExprs: Seq[Expression] = valueConjs.map(
      ZoneMapSkipping.toFullPredicate(_, mf).getOrElse(return None))
    val keepExprs: Seq[Expression] = valueConjs.flatMap(
      ZoneMapSkipping.toManifestPredicate(_, mf))
    def predOf(es: Seq[Expression]): InternalRow => Boolean =
      if (es.isEmpty) _ => true
      else {
        val p = Predicate.create(es.reduce(And), mf.attrs)
        p.initialize(0)
        p.eval _
      }
    val fullPred = predOf(fullExprs)
    val keepPred = predOf(keepExprs)
    val full = scala.collection.mutable.ArrayBuffer.empty[Long]
    val partial = scala.collection.mutable.ArrayBuffer.empty[Long]
    mf.rows.foreach { r =>
      val sid = r.getLong(mf.shardOrdinal)
      if (shardChecks.forall(_(sid))) {
        if (fullPred(r)) full += sid
        else if (keepPred(r)) partial += sid
      }
    }
    Some((full.toSeq, partial.toSeq))
  }

  /** A conjunct referencing ONLY the shard partition column, as an
    * exact per-shard-id check — the shapes a prior [[ZoneMapSkipping]]
    * pass (or a user) writes. None = unanalyzable, caller bails. */
  private[plans] def shardCheckOf(conjunct: Expression): Option[Long => Boolean] = {
    def asLong(v: Any): Option[Long] = v match {
      case i: Int => Some(i.toLong)
      case j: Long => Some(j)
      case _ => None
    }
    conjunct match {
      case IsNotNull(_) => Some(_ => true) // partition values: never null
      case EqualTo(_: AttributeReference, Literal(v, _)) =>
        asLong(v).map(x => (sid: Long) => sid == x)
      case EqualTo(Literal(v, _), _: AttributeReference) =>
        asLong(v).map(x => (sid: Long) => sid == x)
      case In(_: AttributeReference, vs)
          if vs.forall(_.isInstanceOf[Literal]) =>
        val ids = vs.map(v => asLong(v.asInstanceOf[Literal].value))
        if (ids.forall(_.isDefined)) {
          val set = ids.flatten.toSet
          Some(set.contains _)
        } else None
      case InSet(_: AttributeReference, vs) =>
        val ids = vs.toSeq.map(asLong)
        if (ids.forall(_.isDefined)) {
          val set = ids.flatten.toSet
          Some(set.contains _)
        } else None
      case _ => None
    }
  }

  private def shardLit(v: Long, attr: Attribute): Literal =
    attr.dataType match {
      case IntegerType => Literal(v.toInt)
      case _           => Literal(v)
    }
  private def shardVal(v: Long, attr: Attribute): Any =
    attr.dataType match {
      case IntegerType => v.toInt
      case _           => v
    }

  /** One aggregate expression's manifest recipe, with every soundness
    * gate applied against the CACHED manifest (znull completeness for
    * COUNT(col), zsum completeness + integral type for SUM, the
    * spec_id stamp for id min/max). None = not rewritable. */
  private def recipeOf(mf: ShardLayouts.CachedManifest,
                       ae: AggregateExpression): Option[Recipe] =
    if (ae.isDistinct || ae.filter.nonEmpty || ae.mode != Complete) None
    else ae.aggregateFunction match {
      case Count(Seq(c)) if c.foldable && c.deterministic &&
          c.eval() != null => Some(CountRows)
      case Count(Seq(c: AttributeReference))
          if mf.zoneCols.contains(c.name) &&
            znullComplete(mf, c.name) => Some(CountCol(c.name))
      case Min(c: AttributeReference)
          if mf.zoneCols.contains(c.name) => Some(MinStat(c.name))
      case Max(c: AttributeReference)
          if mf.zoneCols.contains(c.name) => Some(MaxStat(c.name))
      case Min(c: AttributeReference)
          if mf.idCol.contains(c.name) => Some(MinId)
      case Max(c: AttributeReference)
          if mf.idCol.contains(c.name) => Some(MaxId)
      case Sum(c: AttributeReference, _)
          if integral(c.dataType) && mf.zoneCols.contains(c.name) &&
            zsumComplete(mf, c.name) => Some(SumStat(c.name))
      case _ => None
    }

  /** The manifest-side aggregate expression a recipe evaluates to,
    * built over the FRESH manifest scan's attributes. None when a stat
    * column is missing there (foreign manifest). */
  private def statAggExprOf(recipe: Recipe,
                            mAttr: String => Option[Attribute])
      : Option[Expression] = recipe match {
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
    // Sum over the per-shard sums: skips NULL (all-null-shard) rows
    // exactly as the data scan's Sum skips their rows, and answers
    // NULL on an all-null input just like the scan
    case SumStat(c) => mAttr(s"zsum_$c").map(z =>
      AggregateExpression(Sum(z), Complete, isDistinct = false))
    case MinId => mAttr("min_id").map(z =>
      AggregateExpression(Min(z), Complete, isDistinct = false))
    case MaxId => mAttr("max_id").map(z =>
      AggregateExpression(Max(z), Complete, isDistinct = false))
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
        case a @ Alias(ae: AggregateExpression, _) =>
          recipeOf(mf, ae).map(r => (a, r))
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
        statAggExprOf(recipe, mAttr) match {
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
