package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Verbatim-span excision AT INGEST — the incremental form of
  * [[graft.operators.Dedup.exciseSharedSpans]] (Lee et al. 2022's
  * removal policy), following the [[IncrementalDedup]] store
  * conventions.
  *
  * SEMANTICS — the documented deviation from the batch door: batch
  * excision's remove-everywhere policy is CORPUS-GLOBAL — a gram's
  * hotness (df ≥ minDf) depends on documents that arrive LATER, so no
  * ingest-time pass can reproduce it exactly. This operator computes
  * the MONOTONE APPROXIMATION: each document is excised against the
  * grams hot AS OF ITS ARRIVAL (accumulated store + its own batch).
  * Hotness only grows, so every span the ingest cuts would also be
  * cut by the batch door over the same corpus — ingest excision never
  * over-cuts, it only LAGS: the first minDf−1 carriers of a template
  * pass through uncleaned and stay uncleaned until a periodic global
  * re-excision (the batch door over the accumulated corpus — the q63
  * incremental family's reconcile convention) retires the debt. The
  * lag is bounded by minDf−1 documents per template, by construction.
  *
  * Per micro-batch (`foreachBatch`):
  *   1. tokenize + gram-fingerprint the batch (the batch door's exact
  *      frames — [[Dedup.spanBase]]/[[Dedup.spanGrams]]);
  *   2. count the batch's own df per distinct gram, probe the store
  *      for those grams only (semi join on the 128-bit fingerprint —
  *      the probe RESULT scales with the batch, not the corpus), and
  *      sum prior + batch df: hot = df ≥ minDf;
  *   3. excise the batch against its hot starts
  *      ([[Dedup.exciseAgainst]] — the native linear kernel) and
  *      append (id, clean_text, n_tokens, n_removed) to `outDir`;
  *   4. append the batch's (batch_id, fingerprint, df) PARTIALS to
  *      the store — one row per distinct gram of the batch.
  *
  * STORE COST — stated, not hidden: exact df needs one row per
  * distinct (gram, batch) — round 16 moved the store from
  * per-(gram, doc) POSTINGS (measured 15–17 B/token at 1×–100×,
  * SCALING.md) to per-(gram, batch) df PARTIALS, dividing rows (and
  * every later batch's probe scan) by the within-batch duplication
  * factor; the store remains corpus-vocabulary-sized, the price of
  * EXACT hotness at ingest (Lee et al.'s suffix array is likewise
  * corpus-sized; a count sketch would shrink it at the cost of
  * probabilistic df, a trade this engine's q82 exactness stance
  * declines by default). Batch-keyed partials + max-dedup + the
  * strictly-before model read make at-least-once replays re-emit
  * bit-identical rows (the [[IncrementalDsir]] discipline); the
  * store compacts on the same cadence
  * ([[IncrementalDedup.maybeCompact]]). */
object IncrementalExcision {

  /** Accumulated df per gram AS OF batch `batchId`: replay-deduped
    * (max per (batch_id, gram) — a replayed append re-writes
    * identical deterministic partials), restricted to generations
    * strictly BEFORE the batch, summed. One row per distinct gram. */
  private def dfAsOf(raw: DataFrame, batchId: Long): DataFrame =
    raw.filter(col("batch_id") < lit(batchId))
      .groupBy(col("batch_id"), col("_f1"), col("_f2"))
      .agg(max(col("_df")).as("_df"))
      .groupBy(col("_f1"), col("_f2"))
      .agg(sum(col("_df")).as("_df"))

  def processBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                   storeDir: String,
                   outDir: String, textCol: String, idCol: String,
                   k: Int, minDf: Long): Unit = {
    require(k >= 1, s"k-gram length must be >= 1, got $k")
    require(minDf >= 2, s"minDf < 2 would excise every position, got $minDf")
    val base = Dedup.spanBase(batch, textCol, idCol).persist()
    try {
      val grams = Dedup.spanGrams(base, k).persist()
      try {
        // df PARTIALS, not postings (round 16): one row per DISTINCT
        // gram of the batch instead of one per (gram, doc) — exact
        // under the ingest invariant that a document arrives in
        // exactly ONE batch (replays of that same batch are handled
        // by the batch key + max-dedup, the IncrementalDsir
        // discipline), and it divides the store's row count (hence
        // every later batch's probe SCAN — the measured linear term,
        // SCALING.md round-16) by the within-batch duplication
        // factor, which is largest precisely on the template-heavy
        // corpora this operator exists for.
        val batchDf = grams.groupBy(col("_f1"), col("_f2"))
          .agg(countDistinct(col("id")).as("_df"))
        // store probe: only grams the batch carries matter — a
        // genuinely absent store means "first batch"; a read failure
        // must propagate (the IncrementalDedup stance)
        val storePath = new org.apache.hadoop.fs.Path(storeDir)
        val fs = storePath.getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val touched = batchDf.select(col("_f1"), col("_f2"))
        // model read is AS OF this batch (batch_id < batchId): a
        // replay finds its own first-attempt partials in the store
        // and must NOT count them on top of its own recount — with
        // the filter, replayed output rows are bit-identical
        val prior =
          if (fs.exists(storePath))
            Some(dfAsOf(spark.read.parquet(storeDir)
              .join(broadcast(touched), Seq("_f1", "_f2"), "left_semi"),
              batchId))
          else None
        val total = prior match {
          case Some(p) => p.unionByName(batchDf)
            .groupBy(col("_f1"), col("_f2"))
            .agg(sum(col("_df")).as("_df"))
          case None => batchDf
        }
        val hot = total.filter(col("_df") >= minDf)
          .select(col("_f1"), col("_f2"))
        val hotStarts = grams.join(hot, Seq("_f1", "_f2"))
          .groupBy(col("id")).agg(collect_list(col("_i")).as("_starts"))
        Dedup.exciseAgainst(base, hotStarts, k)
          .write.mode("append").parquet(outDir)
        batchDf.select(lit(batchId).as("batch_id"), col("_f1"),
            col("_f2"), col("_df"))
          .write.mode("append").parquet(storeDir)
      } finally { grams.unpersist(); () }
    } finally { base.unpersist(); () }
  }

  /** Wire over a streaming (idCol, textCol) frame: cleaned docs land
    * in `outDir`, batch-keyed df partials accumulate in `storeDir`
    * (one row per distinct gram per batch).
    *
    * CONTRACT: each document id arrives in exactly ONE batch (the
    * standard append-only ingest shape). A doc re-arriving in a
    * LATER batch would add its df again — the old postings store
    * deduped that case at countDistinct cost; this store trades it
    * for a df-fold smaller probe scan. At-least-once REPLAYS of the
    * same batch remain exact (batch key + max-dedup + the
    * strictly-before model read).
    *
    * No history collapse here, deliberately: the DSIR store's
    * sentinel trick rides on an ATOMIC single-file append, which
    * holds for a ≤ nBuckets model but not for a vocabulary-sized
    * gram store (a partial multi-file sentinel would silently
    * under-count) — the file-merge compactor below handles file
    * count, and the row count is already one per (batch, distinct
    * gram). */
  def run(spark: SparkSession, docs: DataFrame, storeDir: String,
          outDir: String, checkpoint: String,
          textCol: String = "text", idCol: String = "doc_id",
          k: Int = 8, minDf: Long = 2L,
          compactEvery: Int = 0,
          compactTargetBytes: Long = 128L * 1024 * 1024): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(spark, batch.toDF(), batchId, storeDir, outDir,
          textCol, idCol, k, minDf)
        IncrementalDedup.maybeCompact(spark, batchId, compactEvery,
          Seq(storeDir, outDir), compactTargetBytes)
      }
      .start()
}
