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
    // keepCols beyond the id ride as trailing order keys — (toks, id)
    // is already total, and the reuse contract (Ranks) requires every
    // carried column to be a range key
    Ranks.globalRowNumbers(base, Seq("bucket"),
        Seq(col("toks").desc, col(idCol).asc) ++
          keepCols.filterNot(_ == idCol).map(c => col(c).asc),
        rankCol = "_g", sizeCol = "_n")
      .withColumn("batch_id", expr(s"(_g - 1) div $batchSize"))
      .select(keepCols.map(col) ++
        Seq(col("toks"), col("bucket"), col("batch_id")): _*)
  }

  /** FULL epoch→batch assignment — the reproducible-dataloader door:
    * every row of epoch `epoch` gets its global position in the
    * epoch's deterministic permutation (`epoch_pos`, 1-based, ordered
    * by [[Sampling.epochShuffleKey]]) and its training batch
    * `batch_id = (epoch_pos − 1) div batchSize`. With this, "step N's
    * batch" is a pure function of (corpus, epoch, batchSize) — the
    * resumable/auditable-training property q118 proved only for the
    * FIRST batch (bounded top-k); this door assigns every batch.
    *
    * `copyIdxCol` (pass it for corpora out of [[Sampling
    * .upsampleByRate]] / [[Sampling.mixByTemperatureUpsample]])
    * switches to the replica-aware 3-arg key so the ⌈rate⌉ copies of
    * an upsampled doc disperse across the epoch instead of seating
    * adjacent in every batch.
    *
    * Scale shape: the position is [[Ranks.globalRowNumbers]] — ONE
    * full-data range exchange on (key, id[, copy]) + a broadcast of
    * the tiny slice-offset histogram, never a global sort and never a
    * single-partition window (PlanSpec pins one exchange). At 100 TB
    * this is exactly the shuffle a dataloader must pay to materialize
    * a permuted epoch; nothing here pays a second one. */
  def epochBatches(df: DataFrame, idCol: String, epoch: Int,
                   batchSize: Int, copyIdxCol: String = null,
                   keepCols: Seq[String] = Seq.empty): DataFrame = {
    require(batchSize > 0, s"need positive batchSize, got $batchSize")
    val copy = Option(copyIdxCol)
    val carried = (idCol +: copy.toSeq) ++ keepCols
    val derived = Seq("_skey", "epoch_pos", "batch_id", "_g", "_n")
    require(!carried.exists(k => derived.exists(_.equalsIgnoreCase(k))),
      s"epochBatches derives ${derived.mkString("/")}; " +
        "rename the colliding input columns")
    val skey = copy match {
      case Some(c) => Sampling.epochShuffleKey(col(idCol), epoch, col(c))
      case None    => Sampling.epochShuffleKey(col(idCol), epoch)
    }
    val base = df.select(carried.map(col) :+ skey.as("_skey"): _*)
    // (id, copy) tie-breaks make the permutation total: distinct rows
    // can share a 32-bit key, never a position. keepCols ride as
    // TRAILING order keys — after a total order they change nothing
    // semantically, but making every carried column a range key is
    // what keeps the two exchange consumers canonically equal
    // (Ranks' reuse contract: a payload column the histogram side
    // can prune would fork the exchange — the guard below Ranks
    // rejects it loudly)
    val order = (col("_skey").asc +: col(idCol).asc +:
      copy.map(c => col(c).asc).toSeq) ++ keepCols.map(c => col(c).asc)
    Ranks.globalRowNumbers(base, Seq.empty, order,
        rankCol = "_g", sizeCol = "_n")
      .withColumn("epoch_pos", col("_g"))
      .withColumn("batch_id", expr(s"(_g - 1) div $batchSize"))
      .select(carried.map(col) ++
        Seq(col("epoch_pos"), col("batch_id")): _*)
  }
}
