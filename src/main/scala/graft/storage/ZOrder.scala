package graft.storage

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expressions.ZOrderKey

/** Multi-column Z-order clustering for the shard-layout store — the
  * engine's analog of Delta's `OPTIMIZE ZORDER BY` / Iceberg's z-curve
  * sort orders (public docs only; re-derived on the Spark primitives).
  *
  * The problem it solves: [[graft.sinks.Sinks.writeShards]]' zone maps
  * prune only when the shard assignment CLUSTERS the zone column, and
  * a single-column range binning (`writeSorted`, or `shardCol` = a
  * date bucket) clusters exactly one dimension — a corpus laid out by
  * time answers time-range scans from a sliver of shards but must open
  * every shard for a user-range scan. Z-ordering range-bins the corpus
  * on an INTERLEAVED quantile-bucket key, so every interleaved
  * dimension's per-shard min/max envelope is narrow at once: with d
  * dimensions and S shards, a predicate selecting fraction f of one
  * dimension opens ≈ S · f^(1/d) shards instead of all of them —
  * sub-linear pruning on EVERY queried dimension rather than perfect
  * pruning on one and none on the rest.
  *
  * Write-time cost, and why it holds at 100 TB:
  *  - two sampling passes (`approxQuantile` — a treeAggregate of
  *    bounded Greenwald–Khanna sketches, never a sort): one over the
  *    z columns for the per-dimension bucket boundaries, one over the
  *    derived key for balanced shard bins. Both are column-pruned
  *    scans producing driver arrays bounded by (2^bits−1)·dims and
  *    nShards−1 doubles — KBs, independent of corpus size;
  *  - the publish itself is the SAME one shuffle writeShards always
  *    does (repartition on the shard id); the z-key is a codegen'd
  *    per-row expression, not a join or extra shuffle.
  *
  * Quantile bucketing (not min/max linear scaling) is load-bearing:
  * with Zipfian values a linear Morton code collapses most rows into
  * a few interleaved prefixes and the range binning degenerates to a
  * handful of giant shards; equi-depth buckets keep the key space
  * uniformly occupied, so the shard bins stay balanced no matter the
  * value distribution (ZOrderSpec measures both properties).
  */
object ZOrder {

  /** Published clustering-key column (kept in the layout: it is the
    * sort key of every shard file, and republishing/rebinning can
    * reuse it without recomputing boundaries). */
  val KeyCol = "zorder_key"
  /** Internal shard-bin column handed to writeShards as `shardCol`. */
  val BinCol = "zorder_bin"

  /** Per-dimension equi-depth bucket boundaries: 2^bits − 1 cut points
    * per column, from one bounded-sketch sampling pass over the (cast)
    * columns. Non-numeric orderable types ride their double cast
    * (date/timestamp → epoch seconds). */
  def boundaries(df: DataFrame, cols: Seq[String], bitsPerDim: Int,
                 relErr: Double = 1e-3): Seq[Array[Double]] = {
    require(cols.nonEmpty, "zorder needs at least one column")
    val nCuts = (1 << bitsPerDim) - 1
    val probs = (1 to nCuts).map(_.toDouble / (1 << bitsPerDim)).toArray
    val castNames = cols.indices.map(i => s"_zb_$i")
    val cast = df.select(cols.zip(castNames).map {
      case (c, n) => col(c).cast("double").as(n)
    }: _*)
    cast.stat.approxQuantile(castNames.toArray, probs, relErr).toSeq
  }

  /** The z-key as a column expression over precomputed boundaries. */
  def zkeyCol(cols: Seq[Column], bnds: Seq[Array[Double]],
              bitsPerDim: Int): Column =
    ZOrderKey.column(cols, bnds, bitsPerDim)

  /** Input + [[KeyCol]] + [[BinCol]]: the z-key from a fresh boundary
    * sample, then balanced range bins of the key (second quantile pass
    * over the key itself — equal-WEIGHT bins even where the joint
    * distribution clusters, which per-dimension bucketing alone cannot
    * guarantee). Bin values land in [0, nShards) by construction:
    * nShards−1 cut points make at most nShards buckets. */
  def withZOrder(df: DataFrame, cols: Seq[String], nShards: Int,
                 bitsPerDim: Int = 8): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    Seq(KeyCol, BinCol).foreach(n =>
      require(!df.columns.exists(_.equalsIgnoreCase(n)),
        s"zorder derives its own `$n` column; rename the input's"))
    val bnds = boundaries(df, cols, bitsPerDim)
    val keyed = df.withColumn(KeyCol,
      zkeyCol(cols.map(col), bnds, bitsPerDim))
    val binBits = math.max(1,
      64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, nShards - 1L)).toInt)
    val binCuts =
      if (nShards == 1) Array.empty[Double]
      else keyed.select(col(KeyCol).cast("double").as("_zk"))
        .stat.approxQuantile("_zk",
          (1 until nShards).map(_.toDouble / nShards).toArray, 1e-3)
    keyed.withColumn(BinCol,
      zkeyCol(Seq(col(KeyCol)), Seq(binCuts), binBits))
  }

  /** Publish `df` as a z-ordered shard layout: shard bins from the
    * interleaved key, within-shard sort on the key (tight parquet
    * row-group stats on top of the shard-level zones), zone maps on
    * every z column (+ any `extraZoneCols`), optional blooms. The
    * published schema carries [[KeyCol]] and [[BinCol]] — deterministic
    * functions of the row given the sampled boundaries, and the handle
    * a later rebin/compaction reuses. All atomicity/recovery semantics
    * are writeShards' own. */
  def publish(df: DataFrame, path: String, idCol: String,
              zCols: Seq[String], nShards: Int, bitsPerDim: Int = 8,
              extraZoneCols: Seq[String] = Nil,
              bloomCols: Seq[String] = Nil): DataFrame = {
    val keyed = withZOrder(df, zCols, nShards, bitsPerDim)
    graft.sinks.Sinks.writeShards(keyed, path, idCol, nShards,
      zoneCols = (zCols ++ extraZoneCols).distinct,
      shardCol = Some(BinCol),
      sortCols = Seq(KeyCol),
      bloomCols = bloomCols)
  }

  /** Re-cluster an EXISTING published layout by z-order (the OPTIMIZE
    * ZORDER maintenance door): read the live generation, drop any
    * stale clustering columns from a previous layout, republish
    * z-ordered. One read + one publish; the atomic stage-then-promote
    * path means readers never observe a half-clustered corpus. */
  def recluster(spark: SparkSession, path: String, idCol: String,
                zCols: Seq[String], nShards: Int,
                bitsPerDim: Int = 8,
                bloomCols: Seq[String] = Nil): DataFrame = {
    val live = spark.read.parquet(s"$path/data")
      .drop("shard").drop(KeyCol).drop(BinCol)
    publish(live, path, idCol, zCols, nShards, bitsPerDim,
      bloomCols = bloomCols)
  }
}
