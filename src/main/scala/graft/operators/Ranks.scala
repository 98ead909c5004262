package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed order statistics — global per-group row numbers without a
  * per-group sort.
  *
  * The naive form (`row_number().over(Window.partitionBy(group)
  * .orderBy(order))`) moves EVERY row of a group onto one task and
  * sorts it there: partitioned by a bounded-cardinality key (order
  * priority: 5 values, nation: 25) the whole fact lands on 5–25 tasks —
  * correct at test SF, a scale-killer at 100×. This operator computes
  * the identical ranks with no partition ever holding more than
  * ~|input|/P rows:
  *
  *  1. `repartitionByRange(group ++ order)` spreads the data into
  *     balanced range partitions (AQE-sized unless `parts` is given)
  *     whose boundaries follow the SAME (group, order) total order the
  *     ranks are defined over — so a row's global rank is (rows before
  *     its slice) + (its position within the slice).
  *  2. A histogram `(partition, group) → count` (P×|groups| rows,
  *     map-side combinable) is prefix-summed per group with windows
  *     over the TINY histogram frame, giving each (partition, group)
  *     slice its starting offset, the group total `n`, and — from a
  *     per-partition prefix in the same pass — the slice's first
  *     partition-local position.
  *  3. The offsets broadcast-join back onto the ranged data (no
  *     shuffle: the tiny side broadcasts), which is then sorted WITHIN
  *     partitions; a row's rank is pure arithmetic over
  *     `monotonically_increasing_id` (= partition·2^33 + row index in
  *     sorted order) and the slice offsets. ONE full-data shuffle
  *     total: the data is never hash-exchanged a second time for a
  *     rank window, and nothing outside the tiny histogram ever
  *     crosses the network again.
  *
  * `slicePred`/`rowPred` prune rank SELECTION queries (percentile,
  * top-k): slices that cannot contain a wanted rank are dropped by the
  * broadcast join BEFORE the partition-local sort, so e.g. an exact
  * percentile sorts only the two candidate slices per group, not the
  * fact.
  *
  * Correctness note (pinned by PlanSpec): the ranged frame is consumed
  * twice (histogram + data side). Range-exchange boundary sampling is
  * deterministic only per materialization, so the two consumers MUST
  * read one reused exchange — which holds because the subtree below the
  * exchange (scan + column-pruned project) is deterministic and
  * lambda-free, exactly the canonical-equality condition Spark's
  * exchange/stage reuse requires. PlanSpec asserts each consumer query
  * plans exactly one range exchange (the second occurrence a reuse).
  */
object Ranks {

  /** Correctness RIDES on the two consumers of the ranged frame reading
    * one reused exchange (see scaladoc). Guard the three ways a caller
    * can silently break that, each of which would misalign the
    * histogram's _pid offsets with the data rows and produce WRONG
    * results, not an error:
    *
    *  - reuse disabled in the session;
    *  - a nondeterministic input subtree (rand()/uuid()) that defeats
    *    canonical plan equality;
    *  - a CACHED input (InMemoryRelation): AQE compiles each consumer's
    *    exchange over the cached relation as its own stage and does NOT
    *    reuse one across the other, so the two range exchanges sample
    *    DIFFERENT boundaries — measured in round 7 as ~1M wrong ranks
    *    on a 3M-row persisted frame (RanksSpec pins the rejection).
    *    `localCheckpoint`/`checkpoint` (LogicalRDD) is the safe fence:
    *    both consumers scan ONE materialized RDD, verified exact at
    *    volume.
    *
    * The walk inspects the OPTIMIZED plan (cache substitution has run
    * by then); the determinism scan stops below a LogicalRDD because
    * its values are already fixed. Matching by nodeName keeps
    * `org.apache.spark.sql.execution` internals out of the compile-time
    * surface.
    *
    * SPARK-VERSION COUPLING (audit on every Spark upgrade): beyond the
    * reuse precondition this guard enforces, the arithmetic plan leans
    * on three internals no API contract pins —
    *  1. `monotonically_increasing_id` = partitionId·2^33 + record
    *     index (documented layout, but "documented" ≠ stable across
    *     majors);
    *  2. the partition-local `sortWithinPartitions` surviving
    *     `EliminateSorts` — today it survives because the adjacent
    *     `spark_partition_id()`/`monotonically_increasing_id`
    *     projections are nondeterministic barriers, an optimizer
    *     accident, not a guarantee;
    *  3. AQE coalescing the two reads of the reused range exchange
    *     IDENTICALLY (one ShuffleQueryStage, both consumers see the
    *     same post-coalesce partitioning).
    * All three fail SILENTLY-WRONG, not loudly. Defense in depth:
    * RanksSpec's bit-exact oracles pin them at CI scale, and
    * `spark.graft.ranks.selfCheck=true` (see [[checkRanks]] /
    * [[checkCumSum]]) audits the executed output at any scale — run it
    * once on the target data after ANY Spark version bump. */
  private def requireReusableRangeExchange(df: DataFrame, what: String): Unit = {
    require(df.sparkSession.sessionState.conf.exchangeReuseEnabled,
      s"$what requires spark.sql.exchange.reuse=true (offsets " +
        "and data must read one sampled range exchange)")
    def walk(node: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
      node.nodeName match {
        case "InMemoryRelation" =>
          require(false,
            s"$what input must not be cached: AQE does not reuse " +
              "exchange stages over an InMemoryRelation, so the " +
              "histogram and data sides would sample different range " +
              "boundaries (wrong results, silently) — unpersist() the " +
              "input, or pin it with localCheckpoint()/checkpoint() " +
              "instead")
        case "LogicalRDD" => () // checkpoint boundary: values fixed, reuse-safe
        case _ =>
          node.expressions.foreach(e => require(e.deterministic,
            s"$what input must be deterministic; found $e — fix the " +
              "column behind a materialization boundary first " +
              "(df.localCheckpoint(), df.checkpoint(), or write out " +
              "and re-read)"))
          node.children.foreach(walk)
      }
    walk(df.queryExecution.optimizedPlan)
  }

  /** Differential column pruning is the FOURTH way a caller can break
    * the reused-exchange invariant (round 16): a payload column the
    * data consumer outputs but the histogram consumer doesn't need
    * gets pruned below ONE of the two range exchanges, the subtrees
    * stop being canonically equal, and each materializes its own
    * boundary sample — q121's `keepCols = lang` did exactly this
    * (caught by RanksSpec's one-materialized-exchange pin; with two
    * independent stages AQE can coalesce them differently, which
    * misaligns the histogram's _pid offsets with the data rows =
    * silently wrong ranks). Contract, enforced here: every input
    * column must be a range KEY (rank callers — join payloads back
    * on the id afterwards, or append them as trailing order keys:
    * after a total order they change nothing), except `allowed`
    * columns that BOTH consumers provably retain (cumsum's value
    * column, summed by the histogram and output by the data side). */
  private def requireNoPrunablePayload(df: DataFrame, ranged: DataFrame,
                                       what: String,
                                       allowed: Set[String]): Unit = {
    val keyRefs = ranged.queryExecution.analyzed.expressions
      .flatMap(_.references.map(_.name.toLowerCase)).toSet
    // `allowed` lowercased to match keyRefs: Spark resolution is
    // case-insensitive by default, so a declared valueCol whose case
    // differs from the frame's column case is the SAME column — the
    // guard must not spuriously reject it (round-16 advisor)
    val allowedLc = allowed.map(_.toLowerCase)
    val payload = df.columns.filterNot(c =>
      keyRefs.contains(c.toLowerCase) || allowedLc.contains(c.toLowerCase))
    require(payload.isEmpty,
      s"$what: column(s) [${payload.mkString(", ")}] are neither range " +
        "keys nor retained by both exchange consumers — differential " +
        "column pruning below the range exchange would defeat stage " +
        "reuse (wrong ranks, silently). Select only key columns and " +
        "join the payload back by id, or append it to orderCols as a " +
        "trailing key (harmless after a total order)")
  }

  /** Add global per-group 1-based row numbers (`rankCol`, long) and the
    * group size (`sizeCol`, long) to `df`, computed scale-safe as
    * described above.
    *
    * @param groupCols rank-partition columns (the per-group restart)
    * @param orderCols rank order within a group; include a unique
    *                  tie-break column so ranks are deterministic
    * @param parts     range-partition count; defaults to the session's
    *                  shuffle partitions
    * @param slicePred keep a (partition, group) slice? args = (offset,
    *                  cumulative count, group total n) — rows of
    *                  dropped slices never reach the rank exchange
    * @param rowPred   keep a ranked row? args = (global rank, n)
    */
  def globalRowNumbers(df: DataFrame, groupCols: Seq[String],
                       orderCols: Seq[Column], parts: Int = 0,
                       slicePred: (Column, Column, Column) => Column = null,
                       rowPred: (Column, Column) => Column = null,
                       rankCol: String = "_g",
                       sizeCol: String = "_n"): DataFrame = {
    requireReusableRangeExchange(df, "globalRowNumbers")
    val pruned = slicePred != null || rowPred != null
    val sPred = Option(slicePred)
      .getOrElse((_: Column, _: Column, _: Column) => lit(true))
    val rPred = Option(rowPred).getOrElse((_: Column, _: Column) => lit(true))
    val gCols = groupCols.map(col)
    val keys = gCols ++ orderCols
    val ranged =
      if (parts > 0) df.repartitionByRange(parts, keys: _*)
      else df.repartitionByRange(keys: _*)
    requireNoPrunablePayload(df, ranged, "globalRowNumbers", Set.empty)
    // Histogram side: COUNTS ONLY, over the unsorted exchange read —
    // this consumer never sorts and never sees a payload column after
    // pruning. `monotonically_increasing_id` is documented as
    // `partition id · 2^33 + record index`, so the first position of
    // slice (p, g) among the KEPT slices is
    // `p · 2^33 + (rows of p's earlier kept groups)` — a per-partition
    // prefix sum over the tiny histogram (computed AFTER the slice
    // filter, in the same ascending group order the range keys
    // impose), no `_mid` aggregation needed.
    val hist = ranged.withColumn("_pid", spark_partition_id())
      .groupBy((col("_pid") +: gCols): _*)
      .agg(count(lit(1)).as("_c"))
    // Offsets over the tiny histogram (P×|groups| rows) in ONE task.
    // The round-8 form computed them with three windows (cum-by-group,
    // group-total, kept-prefix-by-pid) — each window another tiny
    // exchange, each exchange another sequential AQE stage, and at
    // small inputs that stage LATENCY dominated the whole operator
    // (probe: the data side + join costs 0.13 s at sf0.1 while the
    // full operator read 0.40 s). coalesce(1) is NARROW — the
    // single-task offsets pass rides the histogram agg's own stage —
    // and everything from pass 1 through the slice filter to pass 2
    // is a narrow chain in that one task. The window semantics are
    // reproduced exactly: pass 1 in (group, pid) order yields cum /
    // group-total / off; the slice filter prunes; pass 2 in (pid,
    // group) order yields the kept-prefix _m0. Same column-function
    // predicates, same null-safe group handling (runs compared
    // field-by-field), values bit-identical (RanksSpec oracles).
    val histOne = hist.coalesce(1)
      .sortWithinPartitions((gCols :+ col("_pid")): _*)
    val gIdxH = groupCols.map(c => hist.columns.indexOf(c)).toArray
    val cIdxH = hist.columns.indexOf("_c")
    val pIdxH = hist.columns.indexOf("_pid")
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val p1Schema = StructType(hist.schema.fields ++ Seq(
      StructField("_cum", LongType, nullable = false),
      StructField(sizeCol, LongType, nullable = false),
      StructField("_off", LongType, nullable = false)))
    val withCums = histOne.mapPartitions { it =>
      // the whole histogram is one model-sized partition: materialize,
      // walk the contiguous (group, pid)-ordered runs, emit cum/n/off
      val rows = it.toArray
      val out = new Array[org.apache.spark.sql.Row](rows.length)
      var i = 0
      while (i < rows.length) {
        var j = i // [i, j) = one group run
        while (j < rows.length && gIdxH.forall(k =>
          rows(j).get(k) == rows(i).get(k))) j += 1
        var n = 0L
        var k = i
        while (k < j) { n += rows(k).getLong(cIdxH); k += 1 }
        var cum = 0L
        k = i
        while (k < j) {
          val c = rows(k).getLong(cIdxH)
          cum += c
          out(k) = org.apache.spark.sql.Row.fromSeq(
            rows(k).toSeq ++ Seq(cum, n, cum - c))
          k += 1
        }
        i = j
      }
      out.iterator
    }(org.apache.spark.sql.Encoders.row(p1Schema))
    val kept = withCums.filter(sPred(col("_off"), col("_cum"), col(sizeCol)))
      .sortWithinPartitions((col("_pid") +: gCols): _*)
    val p2Schema = StructType(p1Schema.fields :+
      StructField("_m0", LongType, nullable = false))
    val offs = kept.mapPartitions { it =>
      // kept-slice prefix per pid, in the data's (pid, group) order
      var curPid = -1
      var run = 0L
      it.map { r =>
        val pid = r.getInt(pIdxH)
        if (pid != curPid) { curPid = pid; run = 0L }
        val m0 = (pid.toLong << 33) + run
        run += r.getLong(cIdxH)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ m0)
      }
    }(org.apache.spark.sql.Encoders.row(p2Schema))
      .drop("_c", "_cum")
    // Null-SAFE group-key equality, twice over: (a) a null group key is
    // a real rank partition for window functions, so its slice offsets
    // must join back rather than vanish through an EqualTo; (b) plain
    // equality makes the optimizer infer IsNotNull(groupKey) and push
    // it below the DATA side's range exchange but not the histogram's —
    // the two exchange subtrees then stop being canonically equal and
    // stage reuse (which correctness depends on, see above) never fires.
    val cond = groupCols
      .map(c => col(s"_d.$c") <=> col(s"_o.$c"))
      .foldLeft(col("_d._pid") === col("_o._pid"))(_ && _)
    // Data side: broadcast-join the slice offsets onto the UNSORTED
    // exchange read (dropping pruned slices), THEN sort within
    // partitions and rank by pure arithmetic
    // (`_mid - first kept mid of the slice + 1`). Two scale wins over
    // the pre-round-8 form: no second full-data exchange for a
    // (pid, group)-partitioned row_number window (at 100 TB that was
    // half the operator's shuffle I/O), and rank-SELECTION queries
    // (percentile, top-k) sort only the rows of candidate slices —
    // the join prunes before the sort, like the old plan pruned
    // before its window exchange.
    val data = ranged.withColumn("_pid", spark_partition_id())
    val out = data.as("_d").join(broadcast(offs.as("_o")), cond)
      .select(df.columns.map(c => col(s"_d.$c")) ++
        Seq(col(s"_o.$sizeCol"), col("_o._m0"), col("_o._off")): _*)
      .sortWithinPartitions(keys: _*)
      .withColumn("_mid", monotonically_increasing_id())
      .withColumn(rankCol,
        col("_mid") - col("_m0") + lit(1L) + col("_off"))
      .filter(rPred(col(rankCol), col(sizeCol)))
      .drop("_m0", "_off", "_mid")
    if (!selfCheckOn(df)) out
    else checkRanks(out, gCols, orderCols, rankCol, sizeCol, pruned)
  }

  /** `spark.graft.ranks.selfCheck=true` turns on an execution-time
    * audit of the rank/cumsum OUTPUT (see [[checkRanks]] /
    * [[checkCumSum]]). Off by default: the audit window re-partitions
    * by the group key alone — the exact bounded-cardinality shape this
    * operator exists to avoid — so it is a debug/canary mode for
    * upgrade validation and incident triage, not the production path. */
  private def selfCheckOn(df: DataFrame): Boolean =
    df.sparkSession.conf.get("spark.graft.ranks.selfCheck", "false").toBoolean

  /** Execution-time invariant for the arithmetic ranks, run over the
    * operator's own output (so it audits what actually executed,
    * including everything AQE re-planned). In global (group, order)
    * order the ranks of a group must be 1-bounded, ≤ n, and strictly
    * ascending; with no pruning they must be exactly 1,2,…,n and count
    * to n. Each of the three Spark internals the plan leans on fails
    * this loudly if it shifts:
    *  - a changed `monotonically_increasing_id` bit layout throws
    *    ranks far outside [1, n];
    *  - a dropped partition-local sort (EliminateSorts) permutes rank
    *    assignment, breaking ascending-in-order-key;
    *  - divergent AQE coalescing of the two exchange reads misaligns
    *    slice offsets, producing duplicate or gapped ranks. */
  private def checkRanks(out: DataFrame, gCols: Seq[Column],
                         orderCols: Seq[Column], rankCol: String,
                         sizeCol: String, pruned: Boolean): DataFrame = {
    val w = Window.partitionBy(gCols: _*).orderBy(orderCols: _*)
    val prev = lag(col(rankCol), 1).over(w)
    val bad =
      if (pruned)
        // pruned output: ranks are a filtered subsequence — bounds and
        // strict ascent still hold, contiguity does not
        col(rankCol) < 1 || col(rankCol) > col(sizeCol) ||
          (prev.isNotNull && col(rankCol) <= prev)
      else
        col(rankCol) =!= coalesce(prev, lit(0L)) + lit(1L) ||
          col(rankCol) > col(sizeCol) ||
          (col(rankCol) === col(sizeCol)) =!=
            (lead(col(rankCol), 1).over(w).isNull)
    out.withColumn(rankCol,
      when(bad, raise_error(concat(
        lit("globalRowNumbers selfCheck: rank invariant violated " +
          "(rank="), col(rankCol).cast("string"),
        lit(", n="), col(sizeCol).cast("string"),
        lit(") — a Spark internal this plan relies on has shifted; " +
          "see the requireReusableRangeExchange scaladoc"))
      ).cast("long")).otherwise(col(rankCol)))
  }

  /** Add a global per-group RUNNING SUM of `valueCol` (`cumCol`) in
    * (groupCols, orderCols) order — the prefix-sum sibling of
    * [[globalRowNumbers]], and the implemented form of the "shard the
    * prefix sums" scale path that q58 (sequence packing) and q65
    * (token-budget selection) previously carried as documented
    * waivers: a `sum().over(Window.partitionBy(lang))` concentrates
    * the whole corpus on |langs| tasks, while this computes the
    * identical cumulative values with no partition ever holding more
    * than ~|input|/P rows.
    *
    * Same shape as the ranks — range-partition on the cum order,
    * per-(partition, group) VALUE SUMS (tiny histogram), broadcast the
    * strictly-before-this-partition offsets back — then the
    * partition-local running sum is a streaming per-partition fold
    * over the sorted partitions (groups are contiguous), NOT a
    * (pid, group)-partitioned window: one full-data shuffle total.
    * Same reused-exchange precondition, actively guarded. `valueCol` is a column NAME in
    * `df`, not an expression — an expression would be aliased into one
    * consumer's subtree only, the histogram and data copies of the
    * range exchange would then column-prune DIFFERENTLY, canonical
    * equality would fail, and each copy would sample its own range
    * boundaries (misaligned offsets = wrong sums — the executed-plan
    * reuse pin in RanksSpec caught exactly this). Compute derived
    * values with `withColumn` BEFORE calling. `valueCol` must be
    * non-null (null-skipping semantics across slice boundaries would
    * otherwise diverge from the single-window form) — ENFORCED: a null
    * value raises at execution rather than summing wrong; include a
    * unique tie-break in `orderCols` so the running sum is
    * deterministic. */
  def globalCumSum(df: DataFrame, groupCols: Seq[String],
                   orderCols: Seq[Column], valueCol: String,
                   cumCol: String = "_cum", parts: Int = 0): DataFrame = {
    requireReusableRangeExchange(df, "globalCumSum")
    val gCols = groupCols.map(col)
    // ENFORCE the non-null precondition rather than document it: a
    // null value would silently diverge from the single-window form
    // (a partition-leading null makes cum = null + _off = null where
    // the window carries the offset through) — exactly the
    // silent-wrongness class the exchange guard above exists to
    // prevent, so it fails the same way: loudly. The when/raise_error
    // projection is shared by both exchange consumers (it sits below
    // the range repartition), so canonical equality and stage reuse
    // are untouched.
    val checked = df.withColumn(valueCol,
      when(col(valueCol).isNotNull, col(valueCol))
        .otherwise(raise_error(lit(
          s"globalCumSum: $valueCol is null — the running sum requires " +
            "a non-null value column; filter or coalesce() it first"))))
    // AQE-sized when parts=0 (same rationale as the ranks); the
    // histogram side reads the exchange UNSORTED (sums don't need
    // order), the data side sorts within partitions for the running
    // fold
    val keys = gCols ++ orderCols
    val ranged =
      if (parts > 0) checked.repartitionByRange(parts, keys: _*)
      else checked.repartitionByRange(keys: _*)
    // valueCol is the one allowed non-key column: the histogram side
    // SUMS it and the data side outputs it, so both consumers retain
    // it and the subtrees stay canonically equal
    requireNoPrunablePayload(checked, ranged, "globalCumSum",
      Set(valueCol))
    val hist = ranged.withColumn("_pid", spark_partition_id())
      .groupBy((col("_pid") +: gCols): _*)
      .agg(sum(col(valueCol)).as("_c"))
    // Offsets over the tiny histogram in ONE task (same stage-latency
    // shave as the ranks — see globalRowNumbers): the exclusive
    // prefix of _c over pid within each contiguous group run, emitted
    // in the sum's own type so long sums stay exact and double sums
    // add in the window's left-to-right order. Non-long/double sum
    // types (decimal) keep the window form — they also take the
    // windowed data path below, where Spark's own sum semantics
    // apply end-to-end.
    val sumIsLong = hist.schema("_c").dataType ==
      org.apache.spark.sql.types.LongType
    val sumIsDouble = hist.schema("_c").dataType ==
      org.apache.spark.sql.types.DoubleType
    val offs =
      if (sumIsLong || sumIsDouble) {
        val gIdxH = groupCols.map(c => hist.columns.indexOf(c)).toArray
        val cIdxH = hist.columns.indexOf("_c")
        val offField = org.apache.spark.sql.types.StructField("_off",
          hist.schema("_c").dataType, nullable = false)
        val oSchema = org.apache.spark.sql.types.StructType(
          hist.schema.fields :+ offField)
        hist.coalesce(1)
          .sortWithinPartitions((gCols :+ col("_pid")): _*)
          .mapPartitions { it =>
            var curKey: Array[Any] = null
            var accL = 0L
            var accD = 0.0
            it.map { r =>
              val same = curKey != null && gIdxH.indices.forall(i =>
                r.get(gIdxH(i)) == curKey(i))
              if (!same) { curKey = gIdxH.map(r.get); accL = 0L; accD = 0.0 }
              val off: Any =
                if (sumIsLong) { val o = accL; accL += r.getLong(cIdxH); o }
                else { val o = accD; accD += r.getDouble(cIdxH); o }
              org.apache.spark.sql.Row.fromSeq(r.toSeq :+ off)
            }
          }(org.apache.spark.sql.Encoders.row(oSchema))
          .drop("_c")
      } else {
        val wCum = Window.partitionBy(gCols: _*).orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)
        hist.withColumn("_off",
          coalesce(sum(col("_c")).over(wCum), lit(0L))).drop("_c")
      }
    val b = ranged.sortWithinPartitions(keys: _*)
      .withColumn("_pid", spark_partition_id())
    // null-safe group equality for the same two reasons as the ranks
    val cond = groupCols
      .map(c => col(s"_d.$c") <=> col(s"_o.$c"))
      .foldLeft(col("_d._pid") === col("_o._pid"))(_ && _)
    val joined = b.as("_d").join(broadcast(offs.as("_o")), cond)
      .select(checked.columns.map(c => col(s"_d.$c")) :+ col("_o._off"): _*)
    // Data-side running sum: a per-partition streaming fold over the
    // sorted partitions (groups are contiguous; the accumulator resets
    // at each group boundary; a broadcast hash join preserves streamed-
    // side order, so rows arrive exactly in (group, order) sequence).
    // The pre-round-8 form hash-exchanged the whole frame a SECOND
    // time for a (pid, group)-partitioned window — at 100 TB half the
    // operator's shuffle I/O. Addition order is identical to that
    // window's (left-to-right within the slice), so values — including
    // double folds — stay bit-exact. Long/double value columns cover
    // the machinery's callers; anything else (decimal) takes the
    // windowed slice path below, where Spark's own sum semantics
    // apply.
    import org.apache.spark.sql.types._
    val sumsToLong = Set[DataType](ByteType, ShortType, IntegerType, LongType)
    val sumsToDouble = Set[DataType](FloatType, DoubleType)
    val vType = checked.schema(valueCol).dataType
    val res = if (sumsToLong.contains(vType) || sumsToDouble.contains(vType)) {
      val cumType: DataType =
        if (sumsToLong.contains(vType)) LongType else DoubleType
      val outSchema = joined.schema.add(cumCol, cumType, nullable = false)
      val cols = joined.columns
      val gIdx = groupCols.map(c => cols.indexOf(c)).toArray
      val vIdx = cols.indexOf(valueCol)
      val oIdx = cols.indexOf("_off")
      val longCum = cumType == LongType
      joined.mapPartitions { it =>
        // groups are contiguous, so the key comparison is field-by-field
        // against the carried values — no per-row key collection (this
        // is the full-data frame's hottest map stage; a per-row Seq
        // allocation here is pure garbage at 100 TB)
        var curKey: Array[Any] = null
        var accL = 0L
        var accD = 0.0
        it.map { r =>
          var same = curKey != null
          var i = 0
          while (same && i < gIdx.length) {
            if (r.get(gIdx(i)) != curKey(i)) same = false
            i += 1
          }
          if (!same) {
            if (curKey == null) curKey = new Array[Any](gIdx.length)
            var j = 0
            while (j < gIdx.length) { curKey(j) = r.get(gIdx(j)); j += 1 }
            accL = 0L; accD = 0.0
          }
          val cum: Any =
            if (longCum) {
              accL += r.getAs[Number](vIdx).longValue()
              accL + r.getLong(oIdx)
            } else {
              accD += r.getAs[Number](vIdx).doubleValue()
              accD + r.getDouble(oIdx)
            }
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ cum)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
        .drop("_off")
    } else {
      val wLocal = Window.partitionBy((col("_pid") +: gCols): _*)
        .orderBy(orderCols: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      b.as("_d").join(broadcast(offs.as("_o")), cond)
        .select(b.columns.map(c => col(s"_d.$c")) :+ col("_o._off"): _*)
        .withColumn(cumCol, sum(col(valueCol)).over(wLocal) + col("_off"))
        .drop("_pid", "_off")
    }
    if (!selfCheckOn(df)) res
    else checkCumSum(res, gCols, orderCols, valueCol, cumCol,
      exact = sumsToLong.contains(vType))
  }

  /** Execution-time invariant for the streaming cumsum: in global
    * (group, order) order, every output row must satisfy
    * `cum == lag(cum, default 0) + value` — the defining recurrence of
    * a running sum. A misaligned partition offset (the AQE-coalescing
    * failure mode), a dropped partition-local sort, or a fold that
    * reset at the wrong boundary all break the recurrence at the first
    * affected row. Long sums check exactly; double sums allow relative
    * 1e-9 (the fold adds the partition offset after the local
    * accumulation, so last-ulp association differences are legal). */
  private def checkCumSum(out: DataFrame, gCols: Seq[Column],
                          orderCols: Seq[Column], valueCol: String,
                          cumCol: String, exact: Boolean): DataFrame = {
    val w = Window.partitionBy(gCols: _*).orderBy(orderCols: _*)
    val want = coalesce(lag(col(cumCol), 1).over(w), lit(0L)) + col(valueCol)
    val bad =
      if (exact) col(cumCol) =!= want
      else abs(col(cumCol) - want) >
        lit(1e-9) * greatest(abs(col(cumCol)), abs(want), lit(1.0))
    out.withColumn(cumCol,
      when(bad, raise_error(concat(
        lit("globalCumSum selfCheck: running-sum recurrence violated " +
          "(cum="), col(cumCol).cast("string"),
        lit(", expected "), want.cast("string"),
        lit(") — a Spark internal this plan relies on has shifted; " +
          "see the requireReusableRangeExchange scaladoc"))
      ).cast(out.schema(cumCol).dataType)).otherwise(col(cumCol)))
  }
}
