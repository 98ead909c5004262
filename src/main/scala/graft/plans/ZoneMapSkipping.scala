package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: AUTOMATIC zone-map data skipping over published
  * shard layouts ([[graft.sinks.Sinks.writeShards]]).
  *
  * `readShardsBetween` prunes shards from the manifest's column stats,
  * but only for callers who opt in through that API. This rule gives
  * every reader the same file skipping for free: a plain
  * `spark.read.parquet(s"$pub/data").filter(...)` — or the SQL
  * equivalent — is recognized as a scan of a shard layout (single root
  * named `data`, hive-partitioned on `shard`, sibling `manifest` dir),
  * the filter's conjuncts on zone-mapped columns are evaluated against
  * the manifest's per-shard `zmin_*`/`zmax_*` ranges DRIVER-SIDE, and a
  * `shard IN (<survivors>)` conjunct is added. `shard` is a partition
  * column, so Spark's own partition pruning turns the conjunct into
  * file skipping at planning time — zero per-row cost, and the original
  * predicate stays in place so the rewrite is conservative by
  * construction (a shard the stats can't rule out is still row-filtered
  * normally). This is the Delta/Iceberg data-skipping shape
  * (stats-based file pruning in the planner) re-expressed as a
  * `Rule[LogicalPlan]` on the classic parquet path.
  *
  * Scale posture: the manifest is one row per shard (bounded — the same
  * envelope every publisher/verifier read uses), cached per layout
  * generation and evaluated with an interpreted Catalyst predicate, so
  * planning cost is microseconds per query and the manifest parquet is
  * read once per generation per JVM, not once per query. At 100 TB the
  * win is the whole point of zone maps: a selective date-range query
  * opens only the shards whose recorded range can intersect, however
  * the user spells the read.
  *
  * Pruning semantics (exactly [[graft.sinks.Sinks.readShardsBetween]]'s,
  * generalized to more predicate shapes):
  *   - `a >= v` keeps shards with `zmax_a >= v`; `a > v` ⇒ `zmax_a > v`
  *   - `a <= v` keeps shards with `zmin_a <= v`; `a < v` ⇒ `zmin_a < v`
  *   - `a = v` / null-safe-eq with non-null v ⇒ range-contains
  *   - `a IN (v…)` ⇒ OR of range-contains
  *   - min/max stats ignore nulls (Iceberg manifest semantics), which
  *     is exact here because every value-comparing shape row-filters
  *     null `a` out anyway; `IS NULL` prunes via the recorded
  *     `znull_*` counts (absent/null count = unknown ⇒ keep), and
  *     `a <=> null` is deliberately NOT handled.
  * Conjuncts in any other shape (OR trees, casts on the column side,
  * non-foldable comparands, non-zone columns) are simply ignored —
  * they prune nothing but never unsound.
  *
  * Guards: fires once per query (skipped when the condition already
  * references `shard`, including the conjunct it adds — safe under
  * fixpoint batches), only on single-root parquet relations that
  * partition-discover `shard`, and only when the sibling manifest
  * carries `zmin_*` stats. Kill switch:
  * `spark.graft.zoneMapSkipping.enabled=false`.
  */
object ZoneMapSkipping extends Rule[LogicalPlan] with PredicateHelper {

  private val EnabledKey = "spark.graft.zoneMapSkipping.enabled"

  private type CachedManifest = ShardLayouts.CachedManifest

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!SQLConf.get.getConfString(EnabledKey, "true").toBoolean) return plan
    plan.transform {
      case f @ Filter(cond, l: LogicalRelation) =>
        l.relation match {
          case fsr: HadoopFsRelation if eligible(fsr, l, cond) =>
            rewrite(f, cond, l, fsr).getOrElse(f)
          case _ => f
        }
    }
  }

  /** Cheap structural checks before any filesystem touch: a layout
    * scan whose condition is not already shard-aware (idempotency +
    * user override). */
  private def eligible(fsr: HadoopFsRelation, l: LogicalRelation,
                       cond: Expression): Boolean =
    ShardLayouts.isLayoutScan(fsr) &&
      !cond.references.exists(_.name == "shard")

  private def rewrite(f: Filter, cond: Expression, l: LogicalRelation,
                      fsr: HadoopFsRelation): Option[Filter] = try {
    val dataDir = fsr.location.rootPaths.head
    val spark = SparkSession.active
    for {
      mf <- ShardLayouts.manifestFor(spark, dataDir)
      // int/long only (the types writeShards' layouts discover): with
      // partition-type inference off, `shard` discovers as STRING and
      // the IN/InSet values built below would never match — prune
      // nothing rather than prune everything
      shardAttr <- l.output.find(a => a.name == "shard" &&
        (a.dataType == IntegerType || a.dataType == LongType))
      conjuncts = splitConjunctivePredicates(cond)
      preds = conjuncts.flatMap(toManifestPredicate(_, mf))
      blooms = conjuncts.flatMap(toBloomProbe(_, mf))
      if preds.nonEmpty || blooms.nonEmpty
    } yield {
      val predOk: InternalRow => Boolean =
        if (preds.isEmpty) _ => true
        else {
          val p = Predicate.create(preds.reduce(And), mf.attrs)
          p.initialize(0)
          p.eval _
        }
      // blob payloads load lazily per probed column (byte-bounded LRU
      // in ShardLayouts) — a failed/stale load keeps every shard
      val loaded = blooms.map(p =>
        (p, ShardLayouts.bloomFor(spark, mf, p.column)))
      val keep = mf.rows
        .filter { r =>
          val sid = r.getLong(mf.shardOrdinal)
          predOk(r) && loaded.forall { case (p, side) => p.keeps(sid, side) }
        }
        .map(_.getLong(mf.shardOrdinal))
      val keepConjunct =
        if (keep.isEmpty) Literal.FalseLiteral
        else if (keep.length <= 100)
          In(shardAttr, keep.toSeq.sorted.map(shardLiteral(_, shardAttr)))
        else
          // large survivor sets (a 100 TB layout has thousands of
          // shards): set-lookup form, O(1) per partition at planning —
          // In→InSet conversion (OptimizeIn) may not re-run after the
          // user-rule batch, so emit it directly
          InSet(shardAttr, keep.map(shardValue(_, shardAttr)).toSet)
      logInfo(s"zone-map skipping at $dataDir: " +
        s"${keep.length}/${mf.rows.length} shards survive " +
        s"${preds.length} stat predicate(s) + ${blooms.length} bloom probe(s)")
      Filter(And(cond, keepConjunct), l)
    }
  } catch {
    // skipping is an optimization only: a foreign manifest whose stat
    // types don't line up (or any other surprise in the driver-side
    // eval) must leave the user's query untouched, never fail it
    case e: Exception =>
      logWarning(s"zone-map skipping disabled for this scan: $e")
      None
  }

  /** Partition discovery types `shard=N` as int; the manifest records
    * long. Emit the literal in the relation's discovered type. */
  private def shardLiteral(v: Long, attr: Attribute): Literal =
    attr.dataType match {
      case IntegerType => Literal(v.toInt)
      case LongType    => Literal(v)
      case other       => Literal.create(v.toString, other) // not reached
    }

  /** The same value in InSet's internal representation. */
  private def shardValue(v: Long, attr: Attribute): Any =
    attr.dataType match {
      case IntegerType => v.toInt
      case _           => v
    }

  /** Translate one data-side conjunct into a manifest-side predicate
    * over `zmin_c`/`zmax_c`, or None when the shape can't prune.
    * private[plans]: [[ManifestAggregates]]' filtered-count rewrite
    * reuses it for its may-intersect (keep) classification. */
  private[plans] def toManifestPredicate(conjunct: Expression,
                                  mf: CachedManifest): Option[Expression] = {
    // the stat attr must carry the DATA column's exact type: a read
    // schema overriding a zone column's type (or a foreign manifest)
    // must disable pruning, not compare across types
    def statOf(prefix: String, a: AttributeReference): Option[Attribute] =
      mf.attrs.find(s => s.name == s"${prefix}_${a.name}" &&
        s.dataType == a.dataType)
    def lit(v: Expression): Literal = Literal.create(v.eval(), v.dataType)
    // a zone-mapped bare column vs a foldable comparand, either side
    object ZoneCol {
      def unapply(e: Expression): Option[AttributeReference] = e match {
        case a: AttributeReference
            if mf.zoneCols.contains(a.name) &&
              statOf("zmin", a).isDefined && statOf("zmax", a).isDefined =>
          Some(a)
        case _ => None
      }
    }
    object Const {
      def unapply(e: Expression): Option[Expression] =
        if (e.foldable && e.deterministic) Some(e) else None
    }
    def contains(a: AttributeReference, v: Literal): Option[Expression] =
      if (v.value == null) None
      else for (lo <- statOf("zmin", a); hi <- statOf("zmax", a))
        yield And(LessThanOrEqual(lo, v), GreaterThanOrEqual(hi, v))

    conjunct match {
      case GreaterThanOrEqual(ZoneCol(a), Const(v)) =>
        statOf("zmax", a).map(GreaterThanOrEqual(_, lit(v)))
      case GreaterThan(ZoneCol(a), Const(v)) =>
        statOf("zmax", a).map(GreaterThan(_, lit(v)))
      case LessThanOrEqual(ZoneCol(a), Const(v)) =>
        statOf("zmin", a).map(LessThanOrEqual(_, lit(v)))
      case LessThan(ZoneCol(a), Const(v)) =>
        statOf("zmin", a).map(LessThan(_, lit(v)))
      // flipped comparands: v OP a
      case GreaterThanOrEqual(Const(v), ZoneCol(a)) =>
        statOf("zmin", a).map(LessThanOrEqual(_, lit(v)))
      case GreaterThan(Const(v), ZoneCol(a)) =>
        statOf("zmin", a).map(LessThan(_, lit(v)))
      case LessThanOrEqual(Const(v), ZoneCol(a)) =>
        statOf("zmax", a).map(GreaterThanOrEqual(_, lit(v)))
      case LessThan(Const(v), ZoneCol(a)) =>
        statOf("zmax", a).map(GreaterThan(_, lit(v)))
      case EqualTo(ZoneCol(a), Const(v)) => contains(a, lit(v))
      case EqualTo(Const(v), ZoneCol(a)) => contains(a, lit(v))
      case EqualNullSafe(ZoneCol(a), Const(v)) => contains(a, lit(v))
      case EqualNullSafe(Const(v), ZoneCol(a)) => contains(a, lit(v))
      case In(ZoneCol(a), vs) if vs.nonEmpty && vs.forall(v =>
          v.foldable && v.deterministic) =>
        val arms = vs.flatMap(v => contains(a, lit(v)))
        if (arms.length == vs.length) Some(arms.reduce(Or)) else None
      // LIKE 'p%': matches live in [p, succ(p)) under binary order,
      // where succ increments the prefix's last byte. The successor
      // may not be valid UTF-8 — harmless: this predicate is only
      // ever evaluated driver-side against the manifest, and
      // UTF8String comparison is byte-wise regardless.
      case StartsWith(ZoneCol(a), Const(v)) =>
        val p = lit(v)
        p.value match {
          case u: org.apache.spark.unsafe.types.UTF8String
              if u.numBytes() > 0 =>
            for (lo <- statOf("zmin", a); hi <- statOf("zmax", a)) yield {
              val ge = GreaterThanOrEqual(hi, p)
              val bytes = u.getBytes
              if ((bytes(bytes.length - 1) & 0xFF) == 0xFF) ge
              else {
                val succ = bytes.clone()
                succ(succ.length - 1) = (succ(succ.length - 1) + 1).toByte
                And(ge, LessThan(lo, Literal(
                  org.apache.spark.unsafe.types.UTF8String.fromBytes(succ),
                  a.dataType)))
              }
            }
          case _ => None // null or empty prefix: no pruning value
        }
      // IS NOT NULL prunes all-null shards (their zmin is null — the
      // stats ignore nulls, so any non-null value makes zmin non-null)
      case IsNotNull(ZoneCol(a)) =>
        statOf("zmin", a).map(IsNotNull(_))
      // IS NULL prunes shards whose RECORDED null count is zero; an
      // absent or null znull value (legacy generation carried by a
      // delta publish) is unknown ⇒ keep the shard
      case IsNull(ZoneCol(a)) =>
        mf.attrs.find(s => s.name == s"znull_${a.name}" &&
            s.dataType == LongType)
          .map(z => Or(IsNull(z), GreaterThan(z, Literal(0L))))
      case _ => None
    }
  }

  /** Translate one data-side conjunct into a manifest-side PROOF that
    * EVERY row of a shard satisfies it (the dual of
    * [[toManifestPredicate]]'s may-intersect test) — or None when the
    * shape admits no such proof. Powers [[ManifestAggregates]]'
    * filtered-count rewrite: a shard this predicate accepts can be
    * counted from its `n_rows` stat without opening it.
    *
    * Why every arm demands `znull == 0` (except IS NULL): the zone
    * stats ignore nulls, so `zmin >= v` proves only the NON-NULL rows
    * pass — a null row fails every value-comparing predicate and must
    * not be counted. `IS NULL` is the mirror: full iff znull == n_rows.
    * Evaluation nulls (empty shard's null zmin, a legacy generation's
    * null znull) make the predicate eval null, which the caller's
    * `Predicate` treats as false — unknown never proves fullness.
    * Soundness under Spark's total order (NaN largest, etc.) is
    * transitivity: every row ≥ zmin by the stat invariant, so
    * zmin ≥ v ⟹ row ≥ v — both sides evaluated by the same Catalyst
    * comparison the row filter itself uses. */
  private[plans] def toFullPredicate(conjunct: Expression,
                                     mf: CachedManifest): Option[Expression] = {
    def statOf(prefix: String, a: AttributeReference): Option[Attribute] =
      mf.attrs.find(s => s.name == s"${prefix}_${a.name}" &&
        s.dataType == a.dataType)
    def znullOf(a: AttributeReference): Option[Attribute] =
      mf.attrs.find(s => s.name == s"znull_${a.name}" &&
        s.dataType == LongType)
    def znullZero(a: AttributeReference): Option[Expression] =
      znullOf(a).map(z => And(IsNotNull(z), EqualTo(z, Literal(0L))))
    def lit(v: Expression): Literal = Literal.create(v.eval(), v.dataType)
    object ZoneCol {
      def unapply(e: Expression): Option[AttributeReference] = e match {
        case a: AttributeReference
            if mf.zoneCols.contains(a.name) &&
              statOf("zmin", a).isDefined && statOf("zmax", a).isDefined =>
          Some(a)
        case _ => None
      }
    }
    object Const {
      def unapply(e: Expression): Option[Expression] =
        if (e.foldable && e.deterministic) Some(e) else None
    }
    def allGe(a: AttributeReference, v: Literal, strict: Boolean) =
      for (lo <- statOf("zmin", a); nz <- znullZero(a))
        yield And(if (strict) GreaterThan(lo, v)
                  else GreaterThanOrEqual(lo, v), nz)
    def allLe(a: AttributeReference, v: Literal, strict: Boolean) =
      for (hi <- statOf("zmax", a); nz <- znullZero(a))
        yield And(if (strict) LessThan(hi, v)
                  else LessThanOrEqual(hi, v), nz)
    def allEq(a: AttributeReference, v: Literal): Option[Expression] =
      if (v.value == null) None
      else for (lo <- statOf("zmin", a); hi <- statOf("zmax", a);
                nz <- znullZero(a))
        yield And(And(GreaterThanOrEqual(lo, v), LessThanOrEqual(hi, v)), nz)

    conjunct match {
      case GreaterThanOrEqual(ZoneCol(a), Const(v)) => allGe(a, lit(v), strict = false)
      case GreaterThan(ZoneCol(a), Const(v))        => allGe(a, lit(v), strict = true)
      case LessThanOrEqual(ZoneCol(a), Const(v))    => allLe(a, lit(v), strict = false)
      case LessThan(ZoneCol(a), Const(v))           => allLe(a, lit(v), strict = true)
      // flipped comparands: v OP a
      case GreaterThanOrEqual(Const(v), ZoneCol(a)) => allLe(a, lit(v), strict = false)
      case GreaterThan(Const(v), ZoneCol(a))        => allLe(a, lit(v), strict = true)
      case LessThanOrEqual(Const(v), ZoneCol(a))    => allGe(a, lit(v), strict = false)
      case LessThan(Const(v), ZoneCol(a))           => allGe(a, lit(v), strict = true)
      case EqualTo(ZoneCol(a), Const(v))            => allEq(a, lit(v))
      case EqualTo(Const(v), ZoneCol(a))            => allEq(a, lit(v))
      case In(ZoneCol(a), vs) if vs.nonEmpty && vs.forall(v =>
          v.foldable && v.deterministic) =>
        // provable only in the degenerate single-value-shard form:
        // some list element covers the whole [zmin, zmax] point range
        val arms = vs.flatMap(v => allEq(a, lit(v)))
        if (arms.length == vs.length) Some(arms.reduce(Or)) else None
      case IsNotNull(ZoneCol(a)) => znullZero(a)
      case IsNull(ZoneCol(a)) =>
        for (z <- znullOf(a);
             n <- mf.attrs.find(s => s.name == "n_rows" &&
               s.dataType == LongType))
          yield And(IsNotNull(z), EqualTo(z, n))
      case _ => None
    }
  }

  /** One bloom-prunable conjunct: keep a shard iff its bloom MIGHT
    * hold any of `values` (OR-set — an IN list), with per-shard
    * conservatism: a shard absent from the lazily-loaded side (null
    * bits / null k / null type stamp — a legacy carry), a failed or
    * stale load (`side` = None), or a type stamp that disagrees with
    * the scan's column type all read as unknown ⇒ keep. */
  private final case class BloomProbe(column: String, typeName: String,
                                      values: Seq[String]) {
    def keeps(sid: Long,
              side: Option[ShardLayouts.BloomColumn]): Boolean =
      side match {
        case None => true
        case Some(bc) => bc.byShard.get(sid) match {
          case None => true
          case Some(sb) =>
            sb.typeName != typeName ||
              values.exists(v =>
                graft.expressions.BloomOps.containsMaybe(sb.bits, sb.k, v))
        }
      }
  }

  /** Translate a point conjunct (`a = v`, `a <=> v`, `a IN (v…)`) on a
    * BLOOMED column into a driver-side probe — the stat that prunes
    * where min/max can't (hash-sharded layouts spread every value
    * range across every shard). The probe value is the comparand cast
    * to string under the session time zone, the same canonical form
    * [[graft.sinks.Sinks]]' shardSummary builds the bits over; the
    * `zbloomt_*` type stamp gates against read schemas that re-type
    * the column (a different cast spelling would false-negative —
    * with the gate the shard is simply kept). */
  private def toBloomProbe(conjunct: Expression,
                           mf: CachedManifest): Option[BloomProbe] = {
    def probeFor(a: AttributeReference,
                 vs: Seq[Expression]): Option[BloomProbe] = {
      if (!mf.bloomCols.contains(a.name)) return None
      // all three stat columns must exist in the manifest's FULL
      // schema (the bits themselves load lazily, outside the cache)
      val names = mf.fullSchema.fieldNames.toSet
      if (!names.contains(s"zbloom_${a.name}") ||
          !names.contains(s"zbloomk_${a.name}") ||
          !names.contains(s"zbloomt_${a.name}")) return None
      val tz = Option(SQLConf.get.sessionLocalTimeZone)
      val strs = vs.map { v =>
        val s = Cast(Literal.create(v.eval(), v.dataType),
          org.apache.spark.sql.types.StringType, tz).eval()
        if (s == null) null else s.toString
      }
      // a null comparand can never equal anything — the row filter
      // already kills the query's rows; prune nothing here
      if (strs.exists(_ == null)) None
      else Some(BloomProbe(a.name, a.dataType.catalogString, strs))
    }
    object Const {
      def unapply(e: Expression): Option[Expression] =
        if (e.foldable && e.deterministic) Some(e) else None
    }
    conjunct match {
      case EqualTo(a: AttributeReference, Const(v)) => probeFor(a, Seq(v))
      case EqualTo(Const(v), a: AttributeReference) => probeFor(a, Seq(v))
      case EqualNullSafe(a: AttributeReference, Const(v))
          if v.eval() != null => probeFor(a, Seq(v))
      case EqualNullSafe(Const(v), a: AttributeReference)
          if v.eval() != null => probeFor(a, Seq(v))
      case In(a: AttributeReference, vs) if vs.nonEmpty &&
          vs.forall(v => v.foldable && v.deterministic) => probeFor(a, vs)
      case _ => None
    }
  }

}
