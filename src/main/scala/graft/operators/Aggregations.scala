package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.Cleanse

/** Aggregations — SURVEY §2.6.
  *
  * A1 (dm/ProcessBrowseLogInfoToDM.scala:71-96): 10s tumbling-window
  * grouped counts. Reference keys on a `$`-concatenated composite and
  * counts by materializing the window's elements into a list; here it is
  * a hash aggregate over (window, keys) with partial (map-side) combine —
  * no per-window buffering, so a hot window never accumulates rows.
  *
  * A2 (offlineanls/ProcessUserPoints.scala:35-44): grouped SUM with
  * string→int cast, consumed as a retract stream. Batch Spark needs no
  * retraction; streaming parity is outputMode("update").
  *
  * Money/points sums go through DECIMAL so the result is exact and
  * independent of partitioning/merge order — required both for the
  * DuckDB oracle hash and for reproducible results on a 1000-executor
  * shuffle.
  */
object Aggregations {

  /** Exact order-independent sum: cast to DECIMAL(38,2), sum exactly,
    * return as double. Precision 38 (not 18): under non-ANSI eval an
    * out-of-precision value casts to NULL and silently VANISHES from a
    * sum documented as exact — 38 digits covers any plausible input,
    * and in-range values produce bit-identical doubles either way. */
  def exactSum(c: Column): Column =
    sum(c.cast(DecimalType(38, 2))).cast("double")

  /** A1: tumbling-window grouped count over an event-time column.
    * Emits window_start as a formatted string (reference emits formatted
    * date/window strings, ProcessBrowseLogInfoToDM.scala:77-89). */
  def windowedCount(df: DataFrame, ts: String, seconds: Int,
                    keys: Seq[String], valueCol: Option[String] = None): DataFrame = {
    val grouped = df.groupBy(
      window(col(ts), s"$seconds seconds").as("w") +: keys.map(col): _*)
    val agged = valueCol match {
      case Some(v) => grouped.agg(count(lit(1)).as("cnt"), exactSum(col(v)).as("val_sum"))
      case None    => grouped.agg(count(lit(1)).as("cnt"))
    }
    agged.select(
      (Cleanse.formatDateTime(col("w.start")).as("window_start") +:
        keys.map(col)) ++
        (col("cnt") +: valueCol.map(_ => col("val_sum")).toSeq): _*)
  }

  /** Skew-safe grouped aggregation: two-phase over a salted key.
    *
    * For decomposable aggregates (count/sum) on a key with hot values,
    * phase 1 aggregates (key, salt) — spreading a hot key over
    * `saltBuckets` reducers — and phase 2 merges the partials per key.
    * Use when one key holds a large share of all rows (bot users,
    * template documents); AQE's skew handling covers joins but not
    * aggregations. Cost: one extra (tiny) shuffle of partials. */
  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: Column,
                     saltBuckets: Int = 64): DataFrame = {
    // monotonically_increasing_id = partitionId*2^33 + offset, so its
    // low bits alone cycle uniformly within every partition — adding
    // spark_partition_id on top was redundant
    val salted = df.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_pc"), sum(valueCol.cast(DecimalType(38, 2))).as("_ps"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_pc")).as("cnt"), sum(col("_ps")).cast("double").as("val_sum"))
  }

  /** Skew-safe gap sessionization (SCALING debt #1): the direct form
    * sorts ALL of a user's events in one partition — a hot user (bot)
    * makes that partition unbounded. Here stage 1 sessionizes within
    * (user, day) — partitions bounded by events/user/day — and stage 2
    * merges sub-sessions across day boundaries on a frame with one row
    * per sub-session (≈ sessions, not events). Output is provably
    * identical to the direct form: within-day splits carry the same gap
    * rule, and a cross-boundary pair merges iff its gap ≤ gapSec,
    * exactly the direct criterion (asserted equal in the spec). */
  def sessionizeScalable(df: DataFrame, tsCol: String, userCol: String,
                         orderCol: String, gapSec: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val day = graft.functions.Cleanse.formatDate(col(tsCol))
    val w1 = Window.partitionBy(col(userCol), day)
      .orderBy(col(tsCol), col(orderCol))
    val gap1 = unix_timestamp(col(tsCol)) - unix_timestamp(lag(col(tsCol), 1).over(w1))
    val sub = df
      .withColumn("_new", when(gap1.isNull || gap1 > gapSec, 1).otherwise(0))
      .withColumn("_sub", sum(col("_new")).over(
        w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), day.as("_day"), col("_sub"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("_min_ts"), max(col(tsCol)).as("_max_ts"))
    val w2 = Window.partitionBy(col(userCol)).orderBy(col("_min_ts"))
    val gap2 = unix_timestamp(col("_min_ts")) -
      unix_timestamp(lag(col("_max_ts"), 1).over(w2))
    sub
      .withColumn("_new2", when(gap2.isNull || gap2 > gapSec, 1).otherwise(0))
      .withColumn("session_id", sum(col("_new2")).over(
        w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_id"))
      .agg(sum(col("n_events")).as("n_events"),
        graft.functions.Cleanse.formatDateTime(min(col("_min_ts"))).as("s_start"),
        graft.functions.Cleanse.formatDateTime(max(col("_max_ts"))).as("s_end"))
  }

  /** A2: grouped exact sum of a (possibly string-typed) points column,
    * keyed by day + entity columns. */
  def groupedPoints(df: DataFrame, dayCol: Column, keys: Seq[String],
                    pointsCol: String): DataFrame =
    df.groupBy(dayCol.as("log_date") +: keys.map(col): _*)
      .agg(exactSum(col(pointsCol)).as("total_points"), count(lit(1)).as("cnt"))
}
