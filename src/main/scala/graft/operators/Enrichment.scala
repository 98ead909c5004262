package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fact-enrichment joins — SURVEY §2.4.
  *
  * The reference enriches facts with per-record Phoenix point lookups
  * behind a Redis TTL cache (J2: dws/ProcessUserlogInToDWS.scala:107-225,
  * dws/ProduceBrowseLogToDWS.scala:100-226) and a dim self-join for the
  * category hierarchy (J3: dws/ProduceBrowseLogToDWS.scala:169-178).
  *
  * Spark-first shape: broadcast hash left-outer joins. The dim side is
  * broadcast once per stage to every executor — no per-record RPC, no
  * external cache, and the fact side keeps its partitioning (zero
  * shuffle). Missing dim keys still emit the fact row with null
  * attributes, matching the reference's left-outer loop-skip semantics
  * (ProcessUserlogInToDWS.scala:148-161).
  */
object Enrichment {

  /** Deduplicate a dim on its key columns so a downstream left join can
    * never fan out fact rows: the winner per key is the row with the
    * highest `keepBy` value (e.g. a version/updated-at column); with no
    * `keepBy`, an arbitrary-but-single row survives (`dropDuplicates`).
    * Window + row_number, partition-parallel — no driver loop. */
  def dedupKeyed(dim: DataFrame, keys: Seq[String],
                 keepBy: Option[String] = None): DataFrame = keepBy match {
    case Some(orderCol) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(col(orderCol).desc_nulls_last)
      dim.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn")
    case None => dim.dropDuplicates(keys)
  }

  /** J2: left-enrich `fact` with one or more dims on equi-keys.
    * Each element: (dim, joinKeys). Every dim is deduplicated on its
    * join keys before the join (latest by `keepBy` when that column is
    * present, otherwise single arbitrary survivor), so the join never
    * fans out fact rows even if the dim carries duplicate keys.
    *
    * No forced broadcast hint: dims under the AQE threshold plan as
    * broadcast joins automatically (the point-lookup replacement the
    * survey calls for), while an SF-proportional dim — a 100M-row user
    * dim at lake scale — falls back to a shuffled join instead of
    * pinning a multi-GB build side into every executor. The plan-shape
    * spec (OperatorsSpec "broadcast") pins the small-dim broadcast. */
  def enrich(fact: DataFrame, dims: Seq[(DataFrame, Seq[String])],
             keepBy: Option[String] = None): DataFrame =
    dims.foldLeft(fact) { case (acc, (dim, keys)) =>
      val unique = dedupKeyed(dim, keys,
        keepBy.filter(dim.columns.contains))
      acc.join(unique, keys, "left_outer")
    }

  /** J2 with explicit condition (keys named differently on both sides). */
  def enrichOn(fact: DataFrame, dim: DataFrame, cond: Column,
               dropCols: Seq[String] = Nil): DataFrame = {
    val joined = fact.join(dim, cond, "left_outer")
    dropCols.foldLeft(joined)(_.drop(_))
  }

  /** As-of join: for each fact row, the latest `dim` row with
    * `dimTs <= factTs` for the same key (SCD-style point-in-time
    * enrichment — the brief's marquee "operator Spark lacks").
    *
    * Spark-first formulation — compose, don't hand-schedule: tag and
    * union both sides, then one window per key ordered by (ts, side)
    * carries the last dim payload forward onto each fact
    * (`last(..., ignoreNulls)`). Cost: ONE shuffle + sort over
    * facts+dims — the same budget as a sort-merge join, with none of
    * the range-join fan-out; skew handling falls out of the normal
    * window machinery. Dims at equal ts sort before facts (inclusive
    * as-of). `dimCols` are the dim payload columns to carry. */
  def asOfJoin(facts: DataFrame, factTs: String, dims: DataFrame,
               dimTs: String, key: String, dimCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val factCols = facts.columns.toSeq
    val f = facts.withColumn("_ts", col(factTs)).withColumn("_side", lit(1))
    val d = dims.select(
      (col(key) +: col(dimTs).as("_ts") +: lit(0).as("_side") +:
        dimCols.map(c => col(c).as(s"_dim_$c"))): _*)
    val unioned = f.unionByName(d, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = dimCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"_dim_$c", last(col(s"_dim_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1)
      .select(factCols.map(col) ++ dimCols.map(c => col(s"_dim_$c").as(c)): _*)
  }

  /** Keyless range join: match each event to every interval
    * [startCol, endCol] containing it. Spark's planner would run the
    * raw theta join as a broadcast-nested-loop (O(N·M) compares);
    * bucketizing both sides onto `bucketSec`-wide time buckets turns it
    * into an equi hash join on the bucket id — each interval explodes
    * to the buckets it covers (choose bucketSec ≈ typical interval so
    * the fan-out is 1-2 buckets), events map to exactly one bucket, and
    * the exact predicate filters bucket-mates. Cost: one shuffle on the
    * bucket id, fan-out bounded by interval/bucketSec. */
  def rangeJoin(events: DataFrame, tsCol: String,
                intervals: DataFrame, startCol: String, endCol: String,
                bucketSec: Long): DataFrame = {
    val evB = events.withColumn("_bucket",
      floor(unix_timestamp(col(tsCol)) / bucketSec))
    val intB = intervals.withColumn("_bucket",
      explode(sequence(
        floor(unix_timestamp(col(startCol)) / bucketSec),
        floor(unix_timestamp(col(endCol)) / bucketSec))))
    evB.join(intB, Seq("_bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_bucket")
  }

  /** Skew-safe equi join for two LARGE sides (neither broadcastable):
    * hot join keys are detected exactly (a map-side-combinable count —
    * cheap precisely when the data is skewed, because the distinct-key
    * set is small relative to the rows), then fact rows on hot keys
    * scatter across `saltFactor` sub-keys while the other side
    * replicates `saltFactor`× FOR THE HOT KEYS ONLY. Cold keys join
    * 1:1, so the replication cost is bounded by hot-key dim rows ×
    * saltFactor, not by the table.
    *
    * Complements AQE's skew-join splitting (which only rewrites
    * sort-merge joins after a shuffle materializes): salting holds for
    * any join type the shape supports and keeps working when the plan
    * is a shuffled-hash join or the skew is in-flight.
    *
    * Salt source: `saltBy` (e.g. a unique row id — cheap to hash,
    * reproducibly scattered, and the preferred choice when one
    * exists). Without it, a seeded `rand()` spreads rows uniformly —
    * including exact duplicate rows, which a row-content hash would
    * pile onto ONE salt and re-create the very straggler being fixed
    * (duplicate-laden crawl data is the normal case here). The JOIN
    * RESULT is identical for any salt assignment (the other side
    * replicates every salt); only the partition balance depends on
    * it. On task retry, rand is nondeterministic per row — Spark
    * marks such map stages indeterminate and the scheduler re-runs
    * downstream stages wholesale rather than consuming a mix of old
    * and new shuffle output (the same machinery that makes
    * round-robin `repartition()` retry-safe); pass `saltBy` where
    * bit-stable retries matter.
    *
    * `joinType`: inner or left_outer (right/full would emit unmatched
    * right rows once per replica).
    *
    * `censusFraction` < 1 detects hot keys on a seeded sample instead
    * of the full fact — at lake scale the exact census is itself a
    * full aggregation of the fact; a 1% sample finds every key hot
    * enough to matter (a key missed by a 1% sample was not a skew
    * problem). The threshold is scaled by the fraction. */
  def saltedJoin(fact: DataFrame, other: DataFrame, keys: Seq[String],
                 saltFactor: Int, hotThreshold: Long,
                 joinType: String = "inner",
                 censusFraction: Double = 1.0,
                 saltBy: Option[Column] = None): DataFrame = {
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left_outer, got $joinType")
    require(saltFactor > 1, "saltFactor must be > 1")
    require(censusFraction > 0 && censusFraction <= 1.0,
      "censusFraction must be in (0, 1]")
    val censusSource =
      if (censusFraction >= 1.0) fact
      else fact.sample(withReplacement = false, censusFraction, seed = 7L)
    val scaledThreshold = math.max(1L, (hotThreshold * censusFraction).toLong)
    val hot = censusSource.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("_k_cnt"))
      .filter(col("_k_cnt") > scaledThreshold)
      .select(keys.map(col): _*)
      .withColumn("_hot", lit(true))
    val saltExpr = saltBy match {
      case Some(c) => pmod(xxhash64(c), lit(saltFactor)).cast("int")
      case None => (rand(7L) * saltFactor).cast("int")
    }
    val f = fact.join(broadcast(hot), keys, "left_outer")
      .withColumn("_salt", when(col("_hot"), saltExpr).otherwise(lit(0)))
      .drop("_hot")
    val o = other.join(broadcast(hot), keys, "left_outer")
      .withColumn("_salt",
        explode(when(col("_hot"), sequence(lit(0), lit(saltFactor - 1)))
          .otherwise(array(lit(0)))))
      .drop("_hot")
    f.join(o, keys :+ "_salt", joinType).drop("_salt")
  }

  /** J3: parent-child self-join of a hierarchy dim (category → parent
    * category in the reference). Returns one row per child with both
    * levels' id/name, ready to broadcast into fact enrichment. */
  def hierarchySelfJoin(dim: DataFrame, idCol: String, parentCol: String,
                        nameCol: String): DataFrame = {
    val a = dim.as("a") // child level
    val b = dim.as("b") // parent level
    a.join(broadcast(b), col(s"a.$parentCol") === col(s"b.$idCol"), "inner")
      .select(
        col(s"b.$idCol").as("first_id"),
        col(s"b.$nameCol").as("first_name"),
        col(s"a.$idCol").as("second_id"),
        col(s"a.$nameCol").as("second_name"))
  }
}
