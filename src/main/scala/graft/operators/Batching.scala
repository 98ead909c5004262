package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Length-bucketed batch assignment — the sequence-bucketing step of a
  * training dataloader (fairseq/T5 style): group documents of similar
  * token length so each fixed-size batch pads to its bucket's ceiling
  * instead of the global maximum, then assign deterministic batch ids.
  *
  * Bucket = token count rounded UP to a multiple of `bucketQuantum` —
  * pure integer arithmetic (a log2-based power-of-2 bucket would hang
  * engine-portability on libm rounding at exact powers). Within a
  * bucket, docs are ordered (toks desc, id asc) and sliced into
  * batches of `batchSize`; the batch id is `(rank-1) div batchSize`.
  *
  * Scale shape: the per-bucket rank is [[Ranks.globalRowNumbers]] —
  * range-partitioned order statistics, NOT a per-bucket window sort
  * (bucket cardinality is bounded ≈ max_len/quantum, so a window would
  * sort the whole corpus on |buckets| tasks: exactly the q43-shape
  * anti-pattern PlanSpec guards). Every partition holds ~|input|/P
  * rows regardless of bucket skew.
  */
object Batching {

  /** Assign (bucket, batch_id) per row; returns the input columns in
    * `keepCols` plus toks, bucket, batch_id. `toks` is any integer
    * token-count column expression. */
  def lengthBucketBatches(df: DataFrame, toks: Column, idCol: String,
                          batchSize: Int, bucketQuantum: Int,
                          keepCols: Seq[String]): DataFrame = {
    require(batchSize > 0 && bucketQuantum > 0,
      s"need positive batchSize/bucketQuantum, got $batchSize/$bucketQuantum")
    // derived + internal rank columns must not collide with (or
    // case-insensitively shadow) a kept input column — same hazard
    // class writeShards guards for `shard`
    val derived = Seq("toks", "bucket", "batch_id", "_g", "_n")
    require(!keepCols.exists(k => derived.exists(_.equalsIgnoreCase(k))),
      s"lengthBucketBatches derives ${derived.mkString("/")}; " +
        "rename the colliding keepCols")
    val base = df.select(keepCols.map(col) :+ toks.cast("long").as("toks"): _*)
      .withColumn("bucket",
        expr(s"((toks + ${bucketQuantum - 1}) div $bucketQuantum) * $bucketQuantum"))
    Ranks.globalRowNumbers(base, Seq("bucket"),
        Seq(col("toks").desc, col(idCol).asc), rankCol = "_g", sizeCol = "_n")
      .withColumn("batch_id", expr(s"(_g - 1) div $batchSize"))
      .select(keepCols.map(col) ++
        Seq(col("toks"), col("bucket"), col("batch_id")): _*)
  }
}
