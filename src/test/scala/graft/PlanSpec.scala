package graft

/** Plan-shape assertions for the round-2 rewrites: the point of the
  * rewrite IS the plan, so pin it — a regression that silently
  * reintroduces the join/shuffle would still pass the value oracle. */
class PlanSpec extends SparkTestBase {

  private def plan(name: String): String =
    Queries.all(name)(spark, sf).queryExecution.executedPlan.toString

  test("q04: adjacent-pair self-join runs with NO join operator") {
    val p = plan("q04_selfjoin")
    assert(!p.contains("Join"), s"expected join-free plan:\n$p")
  }

  test("q27: customer gate is a key-only semi join") {
    val p = plan("q27_topk_revenue")
    assert(p.contains("LeftSemi"), s"expected LeftSemi gate:\n$p")
  }

  test("q30/q39: subtotal Expand sits above a pre-aggregate") {
    // Expand present, and the first (bottom-up) aggregate keys are the
    // finest grouping — i.e. Expand consumes aggregated rows, not the scan
    Seq("q30_rollup", "q39_cube").foreach { q =>
      val p = plan(q)
      assert(p.contains("Expand"), s"$q: expected Expand:\n$p")
      val expandAt = p.indexOf("Expand")
      val aggBelow = p.indexOf("HashAggregate", expandAt)
      assert(aggBelow > 0, s"$q: expected aggregate below Expand:\n$p")
    }
  }

  test("q118: epoch batches are bounded top-k, never a global sort") {
    val p = plan("q118_epoch_shuffle")
    assert(p.contains("TakeOrderedAndProject"),
      s"expected bounded top-k per epoch:\n$p")
    assert(!p.contains("Sort "),
      s"a global sort would not survive 100 TB:\n$p")
  }

  test("q117: upsampling is one explode over a broadcast rate join " +
    "(no sort, no cartesian)") {
    val p = plan("q117_temperature_upsample")
    assert(p.contains("Generate"), s"expected sequence+explode:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"domain rates must broadcast back:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("Sort "),
      s"scan-speed door must not sort or cross:\n$p")
  }

  test("q119: upsample->shuffle composition keeps the q117/q118 " +
    "shapes — broadcast rate join, explode, bounded top-k, no sort") {
    val p = plan("q119_upsample_shuffle")
    assert(p.contains("Generate"), s"expected sequence+explode:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"domain rates must broadcast back:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"expected bounded top-k per epoch:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("Sort "),
      s"composition must not global-sort or cross:\n$p")
  }

  test("q01: filters/projection reach the parquet scan") {
    val p = Queries.all("q01_agg_sum")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema") &&
      p.contains("l_returnflag") && !p.contains("l_shipmode"))
  }

  test("q31: marker_counts is evaluated once per stage, not per call site") {
    // Predicate pushdown inlines the quality/language gate below the
    // _mc projection — ~46 marker_counts calls per input row until
    // CombineMarkerCounts hoists ONE merged scan behind an
    // OptimizationBarrier. Allowed evaluations: the hoisted filter scan
    // + the scoring projection's scan (survivor rows only).
    val p = plan("q31_curation")
    val n = "marker_counts".r.findAllIn(p.toLowerCase).length
    assert(n <= 2, s"expected <=2 MarkerCounts evaluations, got $n:\n$p")
    assert(p.contains("_mc_pushed"),
      s"expected the hoisted filter-scan projection (_mc_pushed):\n$p")
  }

  test("q11: band exchanges shuffle (band, band_key, id) only — no payloads") {
    // the blocking shuffle must stay ids-only: a refactor that lets the
    // signature array (or any payload) ride the banded exchange
    // re-multiplies shuffle bytes by bands× the payload size
    val qe = Queries.all("q11_dedup_minhash")(spark, sf).queryExecution
    val p = qe.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchanges = p.split("\\(\\d+\\) Exchange").drop(1)
      .filter(_.contains("hashpartitioning(band"))
    assert(exchanges.nonEmpty, s"expected band-keyed exchanges:\n$p")
    exchanges.foreach { b =>
      val input = b.linesIterator.find(_.trim.startsWith("Input")).getOrElse("")
      assert(!input.contains("sig"),
        s"band exchange must not carry signatures: $input")
    }
  }

  // the window's input must be aggregate-bounded THROUGH a chain of
  // row-preserving/narrowing single-child nodes — an Aggregate
  // merely somewhere below (e.g. on one side of a join with a raw
  // fact) does not bound the rows the sort swallows
  private def aggBounded(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    p match {
      case _: Aggregate => true
      case _: Project | _: Filter | _: Sort | _: SubqueryAlias |
           _: Window | _: GlobalLimit | _: LocalLimit | _: Distinct =>
        aggBounded(p.children.head)
      case _ => false
    }
  }

  test("guardrail: global-order windows only ever sit above an aggregate") {
    // A Window.orderBy with NO partitioning collapses its input to a
    // single partition — fine over a pre-aggregated frame (|days|,
    // |groups| rows: q42's moving average), a scale-killer over raw
    // data. Enumerate EVERY catalog plan so a future query can't
    // reintroduce the anti-pattern silently (this was prose in q42's
    // comment; now it's checked).
    import org.apache.spark.sql.catalyst.plans.logical._
    Queries.all.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.optimizedPlan
      plan.foreach {
        case w: Window if w.partitionSpec.isEmpty && w.orderSpec.nonEmpty =>
          assert(aggBounded(w.child),
            s"$name: global-order Window over un-aggregated input — " +
              "pre-aggregate to a bounded frame before a global sort")
        case _ => ()
      }
    }
  }

  test("guardrail: no window partitioned solely by bounded-cardinality keys over raw data") {
    // The q43-shape anti-pattern: a Window partitioned ONLY by keys
    // with a small, data-independent domain (5 priorities, 25 nations,
    // ~30 languages) sorts the whole input on |domain| tasks — correct
    // at test SF, a scale-killer at 100×. The scale-safe forms are
    // Ranks.globalRowNumbers (rank family) or pre-aggregation.
    // Enumerate every catalog plan; waivers document the cases where a
    // bounded partition key is provably safe (SCALING.md, "bounded-key
    // windows").
    import org.apache.spark.sql.catalyst.plans.logical._
    val boundedKeys = Set(
      "c_nationkey", "s_nationkey", "n_nationkey", "n_regionkey",
      "r_regionkey", "c_mktsegment", "o_orderpriority", "o_orderstatus",
      "l_returnflag", "l_linestatus", "l_shipmode", "l_shipinstruct",
      "lang", "event_type", "media_type",
      // ANN query sets are small by construction, so a window
      // partitioned only by query_id sorts full-corpus score partitions
      // on |queries| tasks — the round-6 finding; the tail is now the
      // TopKByScore aggregate and must stay one
      "query_id")
    // round 7: the q58/q65 waivers are GONE — their per-lang prefix
    // sums run through Ranks.globalCumSum now, so their windows are
    // (pid, lang)-partitioned and histogram-sized, and the guardrail
    // checks them like everything else
    val waived: Map[String, String] = Map(
      "q38_rank_lag" -> ("lag window runs over the rank-selected " +
        "top-3-per-nation survivors: ≤3 rows per key by the upstream " +
        "rowPred, not the fact"))
    Queries.all.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!waived.contains(name)) {
        val plan = fn(spark, sf).queryExecution.optimizedPlan
        plan.foreach {
          case w: Window if w.partitionSpec.nonEmpty =>
            val keys = w.partitionSpec
              .flatMap(_.references.map(_.name.toLowerCase)).toSet
            if (keys.nonEmpty && keys.subsetOf(boundedKeys))
              assert(aggBounded(w.child),
                s"$name: window partitioned by bounded-cardinality keys " +
                  s"$keys over un-aggregated input sorts the fact on " +
                  "|domain| tasks at scale — use Ranks.globalRowNumbers, " +
                  "pre-aggregate, or add a documented waiver")
          case _ => ()
        }
      }
    }
  }

  test("q63: corpus hashed once, winnow row-local — no Window, no Join") {
    // the whole fingerprint pipeline (shingle -> md5 -> slice minima)
    // must stay row-local (a window-function winnow would shuffle+sort
    // every gram hash by doc id), and pair expansion must come from
    // the fp posting lists, not a self-join that re-runs the pipeline
    // per side
    val p = plan("q63_span_overlap")
    assert(!p.contains("Window"), s"winnow must not use a Window operator:\n$p")
    assert(!p.contains("Join"), s"pair expansion must not self-join:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, // the fp groupBy + the pair-count aggregate
      s"expected <=2 hash exchanges, got $exchanges:\n$p")
    val md5s = "md5".r.findAllIn(p.toLowerCase).length
    assert(md5s <= 1, s"corpus must be hashed once, found $md5s md5 sites:\n$p")
    // the kernel is the ONE native expression (grams -> md5 -> window
    // minima -> distinct in a single row-local pass), not the
    // five-operator Column tree it replaced
    assert(p.toLowerCase.contains("winnow_fingerprints"),
      s"q63 must hash/winnow through the native kernel:\n$p")
  }

  test("guardrail: no broadcast hint pins an SF-proportional table") {
    // The round-11 finding: q27/q28/q30 force-broadcast customer/
    // supplier projections. Those tables grow linearly with scale
    // factor — at bench SF the hint is a no-op (AQE would broadcast
    // anyway, under threshold), at 100 TB it pins a multi-GB build
    // side into every executor and OOMs. Policy (SCALING.md,
    // "broadcast hints"): hints only on cardinality-BOUNDED inputs —
    // nation/region/config dims, or aggregates over bounded keys
    // (q49's 25-row per-nation average). Enumerate every catalog
    // plan's analyzed tree; any ResolvedHint whose subtree reaches a
    // customer/supplier scan WITHOUT an intervening Aggregate fails.
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val unbounded = Seq("customer", "supplier", "orders", "lineitem",
      "documents", "embeddings", "events")
    def scansUnbounded(leaf: LogicalPlan): Boolean = leaf match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          val paths = fs.location.rootPaths.mkString(",").toLowerCase
          unbounded.exists(paths.contains)
        case _ => false
      }
      case other =>
        // LocalRelation / Range / memory sources: bounded by construction
        val s = other.toString.toLowerCase
        unbounded.exists(s.contains)
    }
    def reachesUnboundedScan(p: LogicalPlan): Boolean = p match {
      case _: Aggregate => false    // bounds cardinality to |groups|
      case _: GlobalLimit => false  // bounds cardinality to the limit
      case leaf if leaf.children.isEmpty => scansUnbounded(leaf)
      case other => other.children.exists(reachesUnboundedScan)
    }
    // waivers: hinted subtrees that ARE bounded, but by a constant
    // predicate the walker can't prove (document each)
    val waived: Map[String, String] = Map(
      "q14_ann_topk" -> ("query set = embeddings filtered to a literal " +
        "id range (vec_id < 10): ≤10 rows at any SF"),
      "q15_ann_lsh" -> "same literal-bounded ANN query set as q14",
      "q16_embed_neardup" -> "same literal-bounded ANN query set",
      "q23_ann_ivf" -> "same literal-bounded ANN query set",
      "q67_ann_quantized" -> "same literal-bounded ANN query set",
      "q103_vector_index" -> ("same literal-bounded ANN query set, " +
        "routed: the broadcast side is the query batch × ≤nProbe " +
        "cells plus the 1-row packed centroid frame — the search-API " +
        "contract every search door shares"),
      "q54_contamination" -> ("benchmark shingle set = docs filtered to " +
        "a literal id range then distinct'd: grows with the (fixed) " +
        "eval set, not the corpus"),
      "q66_semantic_dedup" -> ("centroid frame = k ≈ √n model " +
        "parameters, broadcast DELIBERATELY (SemDeDup ~100k cells × " +
        "dim ≈ 600 MB at deploy scale — executor-resident by design; " +
        "the round-12 fix moved it OFF the driver, not out of the " +
        "broadcast)"))
    Queries.all.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!waived.contains(name)) {
        val plan = fn(spark, sf).queryExecution.analyzed
        plan.foreach {
          case h: ResolvedHint if h.hints.strategy.nonEmpty =>
            assert(!reachesUnboundedScan(h.child),
              s"$name: broadcast hint over an SF-proportional subtree — " +
                "delete the hint and let AQE choose (it broadcasts under " +
                s"threshold, shuffles at scale):\n${h.child}")
          case _ => ()
        }
      }
    }
  }

  test("q57: bucketed join needs no exchange on either join side") {
    // force the sort-merge path (at test SF the orders side would
    // broadcast, which bypasses bucketing entirely); at lake scale
    // neither side broadcasts and THIS is the plan that runs
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("q57_bucketed_join")
      val joinAt = p.indexOf("SortMergeJoin")
      assert(joinAt >= 0, s"expected sort-merge join:\n$p")
      // the only exchange allowed is ABOVE the join (the final small
      // aggregation on o_orderpriority); the join's children must read
      // the bucketed tables directly
      val exchangeBelowJoin = p.indexOf("Exchange", joinAt)
      assert(exchangeBelowJoin < 0,
        s"bucketed join must not shuffle its inputs:\n$p")
      assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"),
        s"expected bucketed scan markers:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
