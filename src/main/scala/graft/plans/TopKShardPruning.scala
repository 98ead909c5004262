package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, GlobalLimit, LocalLimit, LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType, LongType}

/** Optimizer rule: SHARD-PRUNED TOP-K over published shard layouts —
  * `ORDER BY <zone col> [DESC] ... LIMIT k` on a plain
  * `spark.read.parquet(s"$pub/data")` opens only the shards that can
  * still contribute a top-k row, proved from the manifest's per-shard
  * `zmin_*`/`zmax_*`/`znull_*`/`n_rows` stats DRIVER-SIDE.
  *
  * The classification: walking shards from the best end of the sort
  * order, each shard GUARANTEES `n_rows − znull` rows at least as good
  * as its worst-side stat (every non-null row of a shard is ≥ zmin and
  * ≤ zmax — the stat invariant). Once the guaranteed tally reaches k,
  * that shard's worst-side stat is a threshold θ: ≥ k rows are provably
  * at-least-θ, so any shard whose BEST-side stat is strictly beyond θ
  * can never place a row in the top-k and is dropped. Null ordering is
  * honored exactly: under a nulls-last order, null rows only matter
  * when fewer than k non-null rows are guaranteed to exist (then the
  * rule prunes nothing); under nulls-first, the recorded null counts
  * fill the first `Σ znull` positions and the threshold is computed for
  * the remaining slots, with every null-bearing (or unknown-null) shard
  * kept. Unknown stats always degrade toward keeping the shard.
  *
  * The rewrite is plan-to-plan and conservative by construction: a
  * `shard IN (<survivors>)` Filter is inserted directly above the scan
  * (partition pruning turns it into file skipping) and the Sort/Limit
  * stay — survivors are still fully sorted, so the answer is the data's
  * own, the rule never picks rows itself. Only the FIRST sort key needs
  * to be a zone column: ties at θ are broken by later keys among the
  * kept shards, and a row strictly worse than θ on the first key loses
  * to ≥ k rows regardless of tie-breakers. Float/double keys never
  * prune (NaN's total-order placement is not representable in the
  * min/max stats).
  *
  * The FILTERED shape (`WHERE <zone filter> ORDER BY ... LIMIT k`)
  * composes: shards are classified FULL / PARTIAL / disjoint under the
  * filter (the [[ManifestAggregates]] classification machinery), the
  * guaranteed tally and null counts draw only on FULL shards — a
  * θ-backing row must both beat θ AND pass the filter, and a full
  * shard's rows provably do — while PARTIAL shards are kept unless θ
  * rules them out and disjoint shards drop outright. An unanalyzable
  * conjunct disables pruning entirely (no proof that enough passing
  * rows exist). The conjunct only fires when it SHRINKS what existing
  * shard conjuncts allow, which is also the fixpoint termination
  * anchor.
  *
  * At 100 TB this is the "latest N events [in this window]" / "top
  * spenders this epoch" shape: a time-clustered layout answers
  * `ORDER BY ts DESC LIMIT 100` from the one newest shard instead of
  * sorting the corpus. Kill switch:
  * `spark.graft.topKShardPruning.enabled=false`. */
object TopKShardPruning extends Rule[LogicalPlan] with PredicateHelper {

  private val EnabledKey = "spark.graft.topKShardPruning.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!SQLConf.get.getConfString(EnabledKey, "true").toBoolean) return plan
    plan.transform {
      case gl @ GlobalLimit(IntegerLiteral(k),
          ll @ LocalLimit(_, srt @ Sort(order, true, child, _))) if k > 0 =>
        rewrite(k, order, child) match {
          case Some(pruned) =>
            GlobalLimit(gl.limitExpr,
              LocalLimit(ll.limitExpr, srt.copy(child = pruned)))
          case None => gl
        }
      // column-pruned variant: Project hoisted between Limit and Sort
      case gl @ GlobalLimit(IntegerLiteral(k), ll @ LocalLimit(_,
          p @ Project(_, srt @ Sort(order, true, child, _)))) if k > 0 =>
        rewrite(k, order, child) match {
          case Some(pruned) =>
            GlobalLimit(gl.limitExpr, LocalLimit(ll.limitExpr,
              p.copy(child = srt.copy(child = pruned))))
          case None => gl
        }
    }
  }

  /** Per-shard stats view; every field Optional — unknown never proves
    * anything. */
  private final case class SStat(sid: Long, nRows: Option[Long],
                                 zmin: Option[Any], zmax: Option[Any],
                                 znull: Option[Long]) {
    def nonNullCnt: Option[Long] = for (n <- nRows; z <- znull) yield n - z
    /** Provably contributes no non-null rows (all-null or empty). */
    def noValues: Boolean =
      nRows.contains(0L) || (for (n <- nRows; z <- znull) yield z == n)
        .getOrElse(false)
  }

  private def rewrite(k: Int, order: Seq[SortOrder],
                      child: LogicalPlan): Option[LogicalPlan] = try {
    // first sort key: a bare zone-column reference (no float/double —
    // NaN placement under Spark's total order is invisible to min/max
    // stats). Later keys only break ties and need no stats.
    val so = order.headOption.getOrElse(return None)
    val key = so.child match {
      case a: AttributeReference
          if a.dataType != FloatType && a.dataType != DoubleType => a
      case _ => return None
    }
    // strip attribute-only Projects (and at most one Filter — the
    // filtered top-k shape: `WHERE <zone filter> ORDER BY ... LIMIT k`)
    // down to the layout scan
    def stripProj(p: LogicalPlan): Option[LogicalRelation] = p match {
      case l: LogicalRelation => Some(l)
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        stripProj(c)
      case _ => None
    }
    def strip(p: LogicalPlan)
        : Option[(LogicalRelation, Option[Expression])] = p match {
      case Filter(cond, c) => stripProj(c).map(l => (l, Some(cond)))
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        strip(c)
      case _ => stripProj(p).map(l => (l, None))
    }
    val (l, filterCond) = strip(child).getOrElse(return None)
    val fsr = l.relation match {
      case f: HadoopFsRelation if ShardLayouts.isLayoutScan(f) => f
      case _ => return None
    }
    val spark = SparkSession.active
    val shardAttr = l.output.find(a => a.name == "shard" &&
      (a.dataType == IntegerType || a.dataType == LongType))
      .getOrElse(return None)
    ShardLayouts.manifestFor(spark, fsr.location.rootPaths.head).flatMap { mf =>
      if (!mf.zoneCols.contains(key.name)) return None
      // typed stat ordinals (a read schema re-typing the column, or a
      // foreign manifest, must disable pruning, not compare across types)
      def ordOf(n: String, t: org.apache.spark.sql.types.DataType): Int =
        mf.attrs.indexWhere(a => a.name == n && a.dataType == t)
      val loI = ordOf(s"zmin_${key.name}", key.dataType)
      val hiI = ordOf(s"zmax_${key.name}", key.dataType)
      val nI = ordOf("n_rows", LongType)
      val zI = ordOf(s"znull_${key.name}", LongType)
      if (loI < 0 || hiI < 0 || nI < 0) return None
      def opt(r: org.apache.spark.sql.catalyst.InternalRow, i: Int,
              t: org.apache.spark.sql.types.DataType): Option[Any] =
        if (i < 0 || r.isNullAt(i)) None else Some(r.get(i, t))
      val stats = mf.rows.toSeq.map { r =>
        SStat(r.getLong(mf.shardOrdinal),
          opt(r, nI, LongType).map(_.asInstanceOf[Long]),
          opt(r, loI, key.dataType), opt(r, hiI, key.dataType),
          opt(r, zI, LongType).map(_.asInstanceOf[Long]))
      }
      // Classify shards under the filter (if any): ALLOWED by existing
      // shard conjuncts, then FULL (every row provably passes — only
      // these shards' rows back the θ guarantee, because a θ-backing
      // row must both beat θ AND pass the filter) / PARTIAL (may
      // intersect) / dropped (provably disjoint — can contribute no
      // row at all). Unfiltered scans: everything is FULL.
      val (allowed, fullSet, partialSet) = filterCond match {
        case None =>
          val all = stats.map(_.sid).toSet
          (all, all, Set.empty[Long])
        case Some(cond) =>
          val conjuncts = splitConjunctivePredicates(cond)
          val (shardConjs, valueConjs) = conjuncts.partition(
            _.references.forall(_.name == "shard"))
          val shardChecks = shardConjs.map(
            ManifestAggregates.shardCheckOf(_).getOrElse(return None))
          val fullExprs = valueConjs.map(
            ZoneMapSkipping.toFullPredicate(_, mf).getOrElse(return None))
          val keepExprs = valueConjs.flatMap(
            ZoneMapSkipping.toManifestPredicate(_, mf))
          def predOf(es: Seq[Expression])
              : org.apache.spark.sql.catalyst.InternalRow => Boolean =
            if (es.isEmpty) _ => true
            else {
              val p = Predicate.create(es.reduce(And), mf.attrs)
              p.initialize(0)
              p.eval _
            }
          val fullPred = predOf(fullExprs)
          val keepPred = predOf(keepExprs)
          val al = scala.collection.mutable.Set.empty[Long]
          val fu = scala.collection.mutable.Set.empty[Long]
          val pa = scala.collection.mutable.Set.empty[Long]
          mf.rows.foreach { r =>
            val sid = r.getLong(mf.shardOrdinal)
            if (shardChecks.forall(_(sid))) {
              al += sid
              if (fullPred(r)) fu += sid
              else if (keepPred(r)) pa += sid
            }
          }
          (al.toSet, fu.toSet, pa.toSet)
      }
      val fullStats = stats.filter(s => fullSet.contains(s.sid))
      val universe = stats.filter(s =>
        fullSet.contains(s.sid) || partialSet.contains(s.sid))
      val ordering = TypeUtils.getInterpretedOrdering(key.dataType)
      val desc = !so.isAscending
      // best/worst side of a shard under this direction
      def best(s: SStat): Option[Any] = if (desc) s.zmax else s.zmin
      def guaranteedAt(s: SStat): Option[Any] = if (desc) s.zmin else s.zmax
      // strictly worse than θ on the first key ⇒ loses to ≥ k rows
      def provablyOut(s: SStat, theta: Any): Boolean = best(s) match {
        case Some(b) =>
          if (desc) ordering.lt(b, theta) else ordering.gt(b, theta)
        case None => false
      }
      /** θ for the kk best NON-NULL rows, counted over FULL shards
        * only (their rows provably pass the filter, so they really do
        * occupy top-k slots), or None when the stats can't guarantee
        * kk such rows exist. */
      def thresholdFor(kk: Long): Option[Any] = {
        if (fullStats.flatMap(_.nonNullCnt).sum < kk) return None
        val sorted = fullStats
          .filter(s => guaranteedAt(s).isDefined)
          .sortWith { (a, b) =>
            val (x, y) = (guaranteedAt(a).get, guaranteedAt(b).get)
            if (desc) ordering.gt(x, y) else ordering.lt(x, y)
          }
        var cum = 0L
        for (s <- sorted) {
          cum += s.nonNullCnt.getOrElse(0L)
          if (cum >= kk) return guaranteedAt(s)
        }
        None
      }
      val nullsFirst = so.nullOrdering == NullsFirst
      val keep: Seq[Long] =
        if (!nullsFirst) {
          // nulls sort last: they only reach the top-k when fewer than
          // k non-null rows are guaranteed — then prune nothing
          val theta = thresholdFor(k.toLong).getOrElse(return None)
          universe.filter(s => !provablyOut(s, theta) && !s.noValues)
            .map(_.sid)
        } else {
          // null counts back top-k slots only when the rows provably
          // pass the filter — FULL shards
          val knownNulls = fullStats.flatMap(_.znull).sum
          if (knownNulls >= k) {
            // the top-k is entirely null rows: keep every shard that
            // has (or may have) nulls
            universe.filter(s => !s.znull.contains(0L)).map(_.sid)
          } else {
            val theta = thresholdFor(k.toLong - knownNulls)
              .getOrElse(return None)
            // null-bearing (or unknown-null) shards are always kept —
            // their nulls occupy leading positions
            universe.filter(s => !s.znull.contains(0L) ||
              (!provablyOut(s, theta) && !s.noValues)).map(_.sid)
          }
        }
      // fire only when the conjunct SHRINKS what existing shard
      // conjuncts already allow — also the fixpoint termination anchor
      // (re-entry sees allowed == keep and bails)
      if (keep.length >= allowed.size) return None
      val keepConjunct =
        if (keep.isEmpty) Literal.FalseLiteral
        else if (keep.length <= 100)
          In(shardAttr, keep.sorted.map(v => shardAttr.dataType match {
            case IntegerType => Literal(v.toInt)
            case _           => Literal(v)
          }))
        else InSet(shardAttr, keep.map(v => shardAttr.dataType match {
          case IntegerType => v.toInt
          case _           => v: Any
        }).toSet)
      logInfo(s"top-k shard pruning at ${fsr.location.rootPaths.head}: " +
        s"${keep.length}/${stats.length} shards can reach the top $k " +
        s"by ${key.name} ${if (desc) "DESC" else "ASC"}" +
        (if (filterCond.isDefined)
           s" (filtered: ${fullSet.size} full + ${partialSet.size} partial)"
         else ""))
      // rebuild the stripped shape with the conjunct folded into the
      // existing Filter (or a new one directly above the scan)
      def rebuild(p: LogicalPlan): LogicalPlan = p match {
        case Filter(cond, c) => Filter(And(cond, keepConjunct), c)
        case rel: LogicalRelation => Filter(keepConjunct, rel)
        case pr @ Project(_, c) => pr.copy(child = rebuild(c))
        case other => other // not reached: strip() validated the shape
      }
      Some(rebuild(child))
    }
  } catch {
    // pruning is an optimization only: any surprise leaves the plan
    case e: Exception =>
      logWarning(s"top-k shard pruning disabled for this scan: $e")
      None
  }
}
