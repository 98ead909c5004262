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
  *   2. probe the postings store for the batch's grams only (semi
  *      join on the 128-bit fingerprint — the probe scales with the
  *      batch, not the corpus), union the batch's own postings, and
  *      count distinct docs per gram: hot = df ≥ minDf;
  *   3. excise the batch against its hot starts
  *      ([[Dedup.exciseAgainst]] — the native linear kernel) and
  *      append (id, clean_text, n_tokens, n_removed) to `outDir`;
  *   4. append the batch's DISTINCT (fingerprint, id) postings to the
  *      store.
  *
  * STORE COST — stated, not hidden: exact df needs one posting per
  * distinct (gram, doc), ≈ one 128-bit fingerprint + id per text
  * token (~24 B/token, the same order as the text itself; Lee et
  * al.'s suffix array is likewise corpus-sized). This is the price of
  * EXACT hotness at ingest; a count sketch would shrink the store at
  * the cost of probabilistic df, a trade this engine's q82 exactness
  * stance declines by default. `distinct()` postings +
  * `countDistinct` probes make at-least-once replays harmless (the
  * [[IncrementalDedup]] contract), and the store compacts on the same
  * cadence ([[IncrementalDedup.maybeCompact]]). */
object IncrementalExcision {

  def processBatch(spark: SparkSession, batch: DataFrame, storeDir: String,
                   outDir: String, textCol: String, idCol: String,
                   k: Int, minDf: Long): Unit = {
    require(k >= 1, s"k-gram length must be >= 1, got $k")
    require(minDf >= 2, s"minDf < 2 would excise every position, got $minDf")
    val base = Dedup.spanBase(batch, textCol, idCol).persist()
    try {
      val grams = Dedup.spanGrams(base, k).persist()
      try {
        val batchPostings = grams.select(col("_f1"), col("_f2"), col("id"))
          .distinct()
        // store probe: only grams the batch carries matter — a
        // genuinely absent store means "first batch"; a read failure
        // must propagate (the IncrementalDedup stance)
        val storePath = new org.apache.hadoop.fs.Path(storeDir)
        val fs = storePath.getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val touched = batchPostings.select(col("_f1"), col("_f2")).distinct()
        val accumulated =
          if (fs.exists(storePath))
            spark.read.parquet(storeDir)
              .join(broadcast(touched), Seq("_f1", "_f2"), "left_semi")
              .unionByName(batchPostings)
          else batchPostings
        val hot = accumulated.groupBy(col("_f1"), col("_f2"))
          .agg(countDistinct(col("id")).as("_df"))
          .filter(col("_df") >= minDf)
          .select(col("_f1"), col("_f2"))
        val hotStarts = grams.join(hot, Seq("_f1", "_f2"))
          .groupBy(col("id")).agg(collect_list(col("_i")).as("_starts"))
        Dedup.exciseAgainst(base, hotStarts, k)
          .write.mode("append").parquet(outDir)
        batchPostings.write.mode("append").parquet(storeDir)
      } finally { grams.unpersist(); () }
    } finally { base.unpersist(); () }
  }

  /** Wire over a streaming (idCol, textCol) frame: cleaned docs land
    * in `outDir`, gram postings accumulate in `storeDir`. */
  def run(spark: SparkSession, docs: DataFrame, storeDir: String,
          outDir: String, checkpoint: String,
          textCol: String = "text", idCol: String = "doc_id",
          k: Int = 8, minDf: Long = 2L,
          compactEvery: Int = 0,
          compactTargetBytes: Long = 128L * 1024 * 1024): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(spark, batch.toDF(), storeDir, outDir,
          textCol, idCol, k, minDf)
        IncrementalDedup.maybeCompact(spark, batchId, compactEvery,
          Seq(storeDir, outDir), compactTargetBytes)
      }
      .start()
}
