package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, StructField, StructType}

/** Distribution-drift audit between two corpus states — the QC step
  * that answers "what did my filter / new crawl / re-curation do to
  * the data distribution?" (the per-feature histogram comparison that
  * data-validation layers run on every pipeline iteration; the PSI /
  * chi-square family reduced to its integer-exact core).
  *
  * The audit is exact at ANY size: per-bucket counts are BIGINT
  * aggregates, and the drift flag compares shares by EXACT
  * cross-multiplication — `|c_a/n_a − c_b/n_b| > num/denom` tested as
  * `|c_a·n_b − c_b·n_a| · denom > num · n_a·n_b` over arbitrary-
  * precision integers on the driver (matching the oracle engine's
  * int128 promotion), so there is no overflow envelope to document
  * and no float division anywhere.
  *
  * Scale shape: one map-side-combinable count per side keyed by the
  * (small) bucket domain, one full outer join over |buckets| rows —
  * then the O(buckets) report is COLLECTED (bounded by `maxBuckets`,
  * loud failure past it — same stance as the centroid/manifest
  * collects) so each input executes exactly once: totals derive from
  * the collected counts instead of separate `count()` jobs that would
  * re-run the (possibly expensive) input plans.
  */
object Drift {

  /** Per-bucket counts of `bucket` in A vs B plus a drift flag:
    * (bucket, cnt_a, cnt_b, drifted) — `drifted` iff the bucket's
    * SHARE differs by strictly more than `num/denom` between sides. */
  def bucketShift(a: DataFrame, b: DataFrame, bucket: Column,
                  num: Long = 1, denom: Long = 100,
                  maxBuckets: Int = 100000): DataFrame = {
    require(num > 0 && denom > num, s"need 0 < num < denom, got $num/$denom")
    val ca = a.select(bucket.as("bucket")).groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt_a"))
    val cb = b.select(bucket.as("bucket")).groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt_b"))
    val joined = ca.join(cb, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
    val rows = joined.limit(maxBuckets + 1).collect()
    require(rows.length <= maxBuckets,
      s"bucketShift saw > $maxBuckets buckets — coarsen the bucket " +
        "expression or raise maxBuckets; a drift report is a summary, " +
        "not a corpus")
    val na = BigInt(rows.iterator.map(_.getLong(1)).sum)
    val nb = BigInt(rows.iterator.map(_.getLong(2)).sum)
    require(na > 0 && nb > 0, s"both sides need rows, got a=$na b=$nb")
    val out = rows.map { r =>
      val cntA = BigInt(r.getLong(1))
      val cntB = BigInt(r.getLong(2))
      Row(r.get(0), r.getLong(1), r.getLong(2),
        (cntA * nb - cntB * na).abs * denom > BigInt(num) * na * nb)
    }
    val schema = StructType(joined.schema.fields :+
      StructField("drifted", BooleanType, nullable = false))
    a.sparkSession.createDataFrame(out.toSeq.asJava, schema)
  }

  /** STREAMING DISTRIBUTION MONITOR — the unbounded complement of
    * [[bucketShift]]: per event-time tumbling window, a KLL quantile
    * sketch of `valueCol` plus the row count, emitted append-mode
    * once the watermark closes the window. Downstream reads any rank
    * with the scalar surface (`kll_quantile(sketch, 0.95)`,
    * `kll_rank(sketch, 512)`) or diffs adjacent windows' sketches —
    * "did this hour's doc-length distribution drift from the last" as
    * one row per window. State per open window is O(k) (the sketch IS
    * the aggregation buffer — [[graft.expressions.KllSketchAgg]]
    * serializes into the state store), never O(rows): the property
    * that makes a distribution monitor viable on an unbounded stream
    * where retaining rows for exact percentiles cannot be. */
  def streamingQuantiles(stream: DataFrame, tsCol: String,
                         valueCol: String, windowLen: String,
                         watermark: String): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    val sk = ColumnBridge.column(graft.expressions.KllSketchAgg(
      ColumnBridge.catalystExpression(col(valueCol).cast("double")))
      .toAggregateExpression())
    stream.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen))
      .agg(sk.as("sketch"), count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"), col("sketch"), col("n"))
  }
}
