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
  *  1. `repartitionByRange(P, group ++ order)` spreads the data into P
  *     balanced range partitions whose boundaries follow the SAME
  *     (group, order) total order the ranks are defined over — so a
  *     row's global rank is (rows before its partition) + (its rank
  *     within the partition).
  *  2. A histogram `(partition, group) → count` (P×|groups| rows,
  *     map-side combinable) is prefix-summed per group with windows
  *     over the TINY histogram frame, giving each (partition, group)
  *     slice its starting offset and the group total `n`.
  *  3. The offsets broadcast-join back onto the ranged data (no
  *     shuffle: the tiny side broadcasts), and a window partitioned by
  *     (partition, group) — every partition bounded by construction —
  *     adds the local `row_number`; global rank = local + offset.
  *
  * `slicePred`/`rowPred` prune rank SELECTION queries (percentile,
  * top-k): slices that cannot contain a wanted rank are dropped by the
  * broadcast join BEFORE the local-rank exchange, so e.g. an exact
  * percentile shuffles and sorts only the two candidate slices per
  * group, not the fact.
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
    * surface. */
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
                       slicePred: (Column, Column, Column) => Column =
                         (_, _, _) => lit(true),
                       rowPred: (Column, Column) => Column =
                         (_, _) => lit(true),
                       rankCol: String = "_g",
                       sizeCol: String = "_n"): DataFrame = {
    val p =
      if (parts > 0) parts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    requireReusableRangeExchange(df, "globalRowNumbers")
    val gCols = groupCols.map(col)
    val b = df.repartitionByRange(p, (gCols ++ orderCols): _*)
      .withColumn("_pid", spark_partition_id())
    val hist = b.groupBy((col("_pid") +: gCols): _*)
      .agg(count(lit(1)).as("_c"))
    // histogram-sized windows: P×|groups| rows, never the data
    val wCum = Window.partitionBy(gCols: _*).orderBy(col("_pid"))
    val wAll = Window.partitionBy(gCols: _*)
    val offs = hist
      .withColumn("_cum", sum(col("_c")).over(wCum))
      .withColumn("_off", col("_cum") - col("_c"))
      .withColumn(sizeCol, sum(col("_c")).over(wAll))
      .filter(slicePred(col("_off"), col("_cum"), col(sizeCol)))
      .drop("_c", "_cum")
    val wLocal = Window.partitionBy((col("_pid") +: gCols): _*)
      .orderBy(orderCols: _*)
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
    b.as("_d").join(broadcast(offs.as("_o")), cond)
      .select(b.columns.map(c => col(s"_d.$c")) ++
        Seq(col("_o._off"), col(s"_o.$sizeCol")): _*)
      .withColumn(rankCol, row_number().over(wLocal).cast("long") + col("_off"))
      .filter(rowPred(col(rankCol), col(sizeCol)))
      .drop("_pid", "_off")
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
    * Same three-step shape as the ranks: range-partition on the cum
    * order, per-(partition, group) VALUE SUMS (tiny histogram),
    * broadcast the strictly-before-this-partition offsets back, add
    * the partition-local running sum. Same reused-exchange
    * precondition, actively guarded. `valueCol` is a column NAME in
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
    val p =
      if (parts > 0) parts
      else df.sparkSession.sessionState.conf.numShufflePartitions
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
    val b = checked.repartitionByRange(p, (gCols ++ orderCols): _*)
      .withColumn("_pid", spark_partition_id())
    val hist = b.groupBy((col("_pid") +: gCols): _*)
      .agg(sum(col(valueCol)).as("_c"))
    // histogram-sized window: P×|groups| rows, never the data
    val wCum = Window.partitionBy(gCols: _*).orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = hist
      .withColumn("_off", coalesce(sum(col("_c")).over(wCum), lit(0L)))
      .drop("_c")
    val wLocal = Window.partitionBy((col("_pid") +: gCols): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // null-safe group equality for the same two reasons as the ranks
    val cond = groupCols
      .map(c => col(s"_d.$c") <=> col(s"_o.$c"))
      .foldLeft(col("_d._pid") === col("_o._pid"))(_ && _)
    b.as("_d").join(broadcast(offs.as("_o")), cond)
      .select(b.columns.map(c => col(s"_d.$c")) :+ col("_o._off"): _*)
      .withColumn(cumCol, sum(col(valueCol)).over(wLocal) + col("_off"))
      .drop("_pid", "_off")
  }
}
