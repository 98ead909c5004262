package graft.operators

import graft.{Queries, SparkTestBase, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranks.globalRowNumbers replaces per-group window sorts (a
  * bounded-cardinality partition key lands the whole fact on |keys|
  * tasks) with range-partitioned rank arithmetic. The point of the
  * rewrite is (a) the values are IDENTICAL to the native window
  * functions and (b) the plan's two consumers of the ranged frame read
  * ONE reused range exchange — range-boundary sampling is deterministic
  * only per materialization, so a second exchange would misalign the
  * histogram offsets against the data side. Both are pinned here. */
class RanksSpec extends SparkTestBase {
  import spark.implicits._

  private def rows(df: DataFrame): Set[org.apache.spark.sql.Row] =
    df.collect().toSet

  test("guards: nondeterministic input and disabled exchange reuse fail loudly") {
    // both conditions silently break the one-reused-range-exchange
    // invariant the ranks depend on — they must be errors, not wrong
    // answers
    val nondet = spark.range(10).toDF("id").withColumn("r", rand())
    val e1 = intercept[IllegalArgumentException] {
      Ranks.globalRowNumbers(nondet, Seq("id"), Seq(col("r")))
    }
    assert(e1.getMessage.contains("deterministic"))
    // a CHECKPOINTED nondeterministic column is legitimate — the values
    // are fixed in ONE materialized RDD both exchange consumers scan,
    // so the guard must accept it (and the values are right: the
    // volume test below verifies a LogicalRDD input exactly)
    val fixed = nondet.withColumn("grp", col("id") % 2).localCheckpoint(true)
    try {
      val ranked = Ranks.globalRowNumbers(fixed, Seq("grp"), Seq(col("r"), col("id")))
      assert(ranked.count() == 10)
    } finally fixed.unpersist()
    // a PERSISTED input — even a fully deterministic one — must be
    // rejected: AQE does not reuse exchange stages over an
    // InMemoryRelation, so the two range exchanges sample different
    // boundaries and the offsets silently misalign (measured: ~1M
    // wrong ranks on a 3M-row persisted frame before this guard)
    val cached = spark.range(10).toDF("id").withColumn("grp", col("id") % 2)
      .persist()
    try {
      cached.count()
      val e3 = intercept[IllegalArgumentException] {
        Ranks.globalRowNumbers(cached, Seq("grp"), Seq(col("id")))
      }
      assert(e3.getMessage.contains("cached"))
    } finally cached.unpersist()
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try {
      val e2 = intercept[IllegalArgumentException] {
        Ranks.globalRowNumbers(spark.range(10).toDF("id"),
          Seq("id"), Seq(col("id")))
      }
      assert(e2.getMessage.contains("exchange.reuse"))
    } finally spark.conf.set("spark.sql.exchange.reuse", "true")
  }

  test("q43 rank arithmetic is bit-identical to native ntile/percent_rank/cume_dist") {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    val native = Tables(spark, sf).customer.select(
      col("c_nationkey"), col("c_custkey"),
      round(col("c_acctbal"), 2).as("acctbal"),
      ntile(4).over(w).cast("long").as("quartile"),
      percent_rank().over(w).as("prank"),
      cume_dist().over(w).as("cdist"))
    assert(rows(Queries.all("q43_ntile")(spark, sf)) == rows(native))
  }

  test("q38 rank selection is bit-identical to the native rank/lag window") {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    val native = Tables(spark, sf).customer
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("gap",
        round(lag(col("c_acctbal"), 1).over(w) - col("c_acctbal"), 2))
      .filter(col("rnk") <= 3)
      .select(col("c_nationkey"), col("rnk"), col("c_custkey"),
        round(col("c_acctbal"), 2).as("acctbal"), col("gap"))
    assert(rows(Queries.all("q38_rank_lag")(spark, sf)) == rows(native))
  }

  test("q40 percentile selection is bit-identical to the single-window form") {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val native = Tables(spark, sf).orders
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy(col("o_orderpriority"))))
      .filter(col("rn") === ceil(col("n") * 0.5) ||
        col("rn") === ceil(col("n") * 0.95))
      .groupBy(col("o_orderpriority"))
      .agg(
        max(when(col("rn") === ceil(col("n") * 0.5),
          round(col("o_totalprice"), 2))).as("p50"),
        max(when(col("rn") === ceil(col("n") * 0.95),
          round(col("o_totalprice"), 2))).as("p95"),
        max(col("n")).cast("long").as("cnt"))
    assert(rows(Queries.all("q40_percentile")(spark, sf)) == rows(native))
  }

  test("globalRowNumbers matches a per-group sort on a skewed synthetic frame") {
    // group sizes 1 / 7 / 400 with duplicate order values (id tie-break),
    // parts both above and below the group count
    val data = (Seq(("a", 5.0, 1L)) ++
      (1 to 7).map(i => ("b", (i % 3).toDouble, 100L + i)) ++
      (1 to 400).map(i => ("c", (i % 10).toDouble, 1000L + i)))
    val df = data.toDF("grp", "v", "id").repartition(6)
    val w = Window.partitionBy(col("grp")).orderBy(col("v"), col("id"))
    val out = Seq("grp", "v", "id", "_g", "_n").map(col)
    val native = df
      .withColumn("_g", row_number().over(w).cast("long"))
      .withColumn("_n",
        count(lit(1)).over(Window.partitionBy(col("grp"))).cast("long"))
    for (p <- Seq(2, 5, 16)) {
      val ranked = Ranks.globalRowNumbers(df, Seq("grp"),
        Seq(col("v"), col("id")), parts = p)
      assert(rows(ranked.select(out: _*)) == rows(native.select(out: _*)),
        s"parts=$p")
      // selection path: top-2 per group through slicePred/rowPred
      val top2 = Ranks.globalRowNumbers(df, Seq("grp"),
        Seq(col("v"), col("id")), parts = p,
        slicePred = (off, _, _) => off < 2,
        rowPred = (g, _) => g <= 2)
      assert(rows(top2.select(out: _*)) ==
        rows(native.filter(col("_g") <= 2).select(out: _*)), s"parts=$p top2")
    }
  }

  test("selfCheck mode audits ranks and cumsums without altering values") {
    // the debug canary for the three unguarded Spark internals (mid
    // layout, EliminateSorts survival, AQE coalescing parity): on a
    // healthy engine it must pass and be value-invisible, on a broken
    // one its raise_error fires (unit-tested via a hand-broken frame
    // below, since the internals can't be broken from test code)
    val data = (Seq(("a", 5.0, 1L)) ++
      (1 to 7).map(i => ("b", (i % 3).toDouble, 100L + i)) ++
      (1 to 400).map(i => ("c", (i % 10).toDouble, 1000L + i)))
      .map { case (g, v, id) => (g, v, id, id % 13 + 1) }
    val df = data.toDF("grp", "v", "id", "toks").repartition(6)
    val w = Window.partitionBy(col("grp")).orderBy(col("v"), col("id"))
    val native = df
      .withColumn("_g", row_number().over(w).cast("long"))
      .withColumn("_n",
        count(lit(1)).over(Window.partitionBy(col("grp"))).cast("long"))
    val outCols = Seq("grp", "v", "id", "toks", "_g", "_n").map(col)
    spark.conf.set("spark.graft.ranks.selfCheck", "true")
    try {
      // toks rides as a TRAILING order key: (v, id) is already total
      // (unique ids), so ranks are unchanged — and the round-16 reuse
      // contract requires every carried column to be a range key
      val ranked = Ranks.globalRowNumbers(df, Seq("grp"),
        Seq(col("v"), col("id"), col("toks")), parts = 5)
      assert(rows(ranked.select(outCols: _*)) ==
        rows(native.select(outCols: _*)))
      // pruned form: subsequence invariant (bounds + strict ascent)
      val top2 = Ranks.globalRowNumbers(df, Seq("grp"),
        Seq(col("v"), col("id"), col("toks")), parts = 5,
        slicePred = (off, _, _) => off < 2, rowPred = (g, _) => g <= 2)
      assert(top2.count() == 5) // 1 + 2 + 2
      // cumsum recurrence, long and double value columns
      val cumL = Ranks.globalCumSum(df, Seq("grp"),
        Seq(col("v"), col("id")), "toks", cumCol = "cum", parts = 5)
      assert(cumL.count() == 408)
      val cumD = Ranks.globalCumSum(
        df.withColumn("dv", col("toks").cast("double")).drop("toks"),
        Seq("grp"), Seq(col("v"), col("id")), "dv", cumCol = "cum",
        parts = 5)
      assert(cumD.count() == 408)
    } finally spark.conf.set("spark.graft.ranks.selfCheck", "false")
  }

  // ---- the reuse pin -------------------------------------------------

  private def allStages(p: SparkPlan): Seq[ShuffleQueryStageExec] = {
    val local = p.collect {
      case s: QueryStageExec => s
      case a: AdaptiveSparkPlanExec => a
    }
    local.flatMap {
      case s: ShuffleQueryStageExec => s +: allStages(s.plan)
      case s: QueryStageExec => allStages(s.plan)
      case a: AdaptiveSparkPlanExec => allStages(a.executedPlan)
      case _ => Nil
    }
  }

  test("globalCumSum is bit-identical to the native per-group cumulative window") {
    // duplicate order values with an id tie-break, a single-row group,
    // and an empty-offset first slice — across partition counts
    val data = (Seq(("a", 5.0, 1L)) ++
      (1 to 7).map(i => ("b", (i % 3).toDouble, 100L + i)) ++
      (1 to 400).map(i => ("c", (i % 10).toDouble, 1000L + i)))
      .map { case (g, v, id) => (g, v, id, id % 13 + 1) }
    val df = data.toDF("grp", "v", "id", "toks").repartition(6)
    val w = Window.partitionBy(col("grp")).orderBy(col("v"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val native = df.withColumn("cum", sum(col("toks")).over(w))
    val out = Seq("grp", "v", "id", "toks", "cum").map(col)
    for (p <- Seq(2, 5, 16)) {
      val cummed = Ranks.globalCumSum(df, Seq("grp"),
        Seq(col("v"), col("id")), "toks", cumCol = "cum", parts = p)
      assert(rows(cummed.select(out: _*)) == rows(native.select(out: _*)),
        s"parts=$p")
    }
  }

  test("globalCumSum raises on a null value instead of silently diverging") {
    val df = Seq(("a", 1.0, 1L, java.lang.Long.valueOf(2L)),
      ("a", 2.0, 2L, null.asInstanceOf[java.lang.Long]))
      .toDF("grp", "v", "id", "toks")
    val e = intercept[Exception] {
      Ranks.globalCumSum(df, Seq("grp"), Seq(col("v"), col("id")), "toks",
        cumCol = "cum").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("toks is null")),
      s"expected the null-value error, got: ${messages(e)}")
  }

  test("globalCumSum at volume: equals the window form on 3M rows / 5 groups, timed") {
    // the q58/q65 re-plan's evidence at a size where the per-group
    // window concentrates 600k-row partitions on 5 tasks while the
    // range-partitioned form keeps every partition ~|input|/P; values
    // must agree exactly (BASELINE.md round-7 "prefix sums at volume").
    // localCheckpoint, NOT persist: this very test found that a cached
    // input silently misaligns the offsets (no AQE stage reuse over
    // InMemoryRelation) — the guard now rejects persist, and the
    // LogicalRDD path is verified exact here.
    val n = 3000000L
    val df = spark.range(n)
      .select((col("id") % 5).cast("string").as("grp"),
        col("id").as("id"),
        (pmod(col("id") * 2654435761L, lit(97L)) + 1L).as("toks"))
      .localCheckpoint(true)
    // Dataset.unpersist is a no-op for a localCheckpoint (the backing
    // RDD is not CacheManager-tracked) — free the 3M-row blocks via
    // the LogicalRDD's RDD, in a finally so a failed assertion can't
    // leak them into later suites
    def freeCheckpoint(): Unit =
      df.queryExecution.optimizedPlan.foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(false)
        case _ => ()
      }
    try {
    assert(df.count() == n)
    def fp(d: org.apache.spark.sql.DataFrame): (Long, Double) = {
      // order-independent fingerprint of (grp, id, cum): compare 3M
      // rows without collecting them
      val t0 = System.nanoTime()
      val h = d.agg(sum(xxhash64(col("grp"), col("id"), col("cum"))))
        .head.getLong(0)
      (h, (System.nanoTime() - t0) / 1e9)
    }
    val w = Window.partitionBy(col("grp")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val (winH, winS) = fp(df.withColumn("cum", sum(col("toks")).over(w)))
    val (cumH, cumS) = fp(Ranks.globalCumSum(df, Seq("grp"),
      Seq(col("id")), "toks", cumCol = "cum"))
    assert(cumH == winH, "globalCumSum diverges from the window form at volume")
    info(f"prefix sums over 3M rows/5 groups: globalCumSum $cumS%.2f s, per-group window $winS%.2f s")
    // and the rank sibling on the same 3M-row frame (the round-7
    // cached-input find means volume parity deserves its own pin here
    // too, not just the 400-row unit test)
    val wr = Window.partitionBy(col("grp")).orderBy(col("id"))
    val (winRH, _) = fp(df.withColumn("cum",
      row_number().over(wr).cast("long")))
    // key columns only (toks would be prunable payload — the round-16
    // reuse contract rejects it; the fingerprint never reads toks)
    val (rnkRH, _) = fp(Ranks.globalRowNumbers(df.select("grp", "id"),
      Seq("grp"), Seq(col("id")), rankCol = "cum").drop("_n"))
    assert(rnkRH == winRH, "globalRowNumbers diverges from the window form at volume")
    } finally freeCheckpoint()
  }

  test("ranked queries execute exactly ONE range shuffle stage (reuse is load-bearing)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    Seq("q38_rank_lag", "q40_percentile", "q43_ntile",
        "q58_seq_pack", "q65_token_budget", "q71_length_batching",
        "q120_epoch_batches", "q121_training_tail")
      .foreach { name =>
      val df = Queries.all(name)(spark, sf)
      df.collect()
      val root = df.queryExecution.executedPlan
      val rangeStages = allStages(root).filter(_.shuffle.outputPartitioning
        .isInstanceOf[RangePartitioning])
      assert(rangeStages.size >= 2,
        s"$name: expected both consumers of the ranged frame ($rangeStages)")
      // AQE wraps the second consumer's ReusedExchange in its own stage
      // id — what must be unique is the MATERIALIZED exchange; every
      // other range stage must be a reuse of it
      val materialized = rangeStages.filter(_.plan.isInstanceOf[ShuffleExchangeExec])
      assert(materialized.size == 1,
        s"$name: range exchange materialized ${materialized.size} times — " +
          "histogram offsets and data pids would come from different " +
          s"boundary samples:\n$root")
    }
  }

  test("the rank machinery adds no full-data exchange beyond the range one " +
    "(the round-8 shave is load-bearing)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // bare operator output (the catalog queries legitimately add their
    // own post-rank exchanges, e.g. q38's lag window over survivors):
    // the data crosses the network ONCE, in the single materialized
    // range exchange; every other materialized exchange belongs to the
    // P×|groups| histogram and must be histogram-SIZED — shuffled
    // bytes a small fraction of the range exchange's. The pre-shave
    // form hash-exchanged the FULL frame a second time for its
    // (pid, group) rank window; at 100 TB that exchange was half the
    // operator's shuffle I/O, so its return is a regression even
    // though values would stay correct.
    // big enough that histogram bytes vs data bytes is a robust ratio
    // (sf0.001's 1500-row customer is not), deterministic so the
    // reused-exchange guard accepts it
    val big = spark.range(200000).toDF("id")
      .select((col("id") % 25).as("grp"), col("id"),
        (col("id") * 2654435761L % 1000).as("v"))
    for ((label, df) <- Seq(
        "globalRowNumbers" -> Ranks.globalRowNumbers(big,
          Seq("grp"), Seq(col("v").desc, col("id"))),
        "globalCumSum" -> Ranks.globalCumSum(
          big, Seq("grp"), Seq(col("id")), "v"))) {
      df.collect()
      val materialized = allStages(df.queryExecution.executedPlan)
        .filter(_.plan.isInstanceOf[ShuffleExchangeExec])
      val (range, hash) = materialized.partition(
        _.shuffle.outputPartitioning.isInstanceOf[RangePartitioning])
      assert(range.size == 1, s"$label: ${range.size} range exchanges")
      val rangeBytes = range.head.getRuntimeStatistics.sizeInBytes
      hash.foreach { h =>
        val b = h.getRuntimeStatistics.sizeInBytes
        assert(b * 4 < rangeBytes,
          s"$label: a hash exchange shuffled $b bytes vs the range " +
            s"exchange's $rangeBytes — a full-data rank/cumsum exchange " +
            "is back in the plan")
      }
    }
  }
}
