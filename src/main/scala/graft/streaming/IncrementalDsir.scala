package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.Text
import graft.operators.Dsir

/** DSIR importance weighting AT INGEST — the incremental form of
  * [[graft.operators.Dsir.importanceWeightsWhen]] (Xie et al. 2023),
  * closing the batch-only gap the round-14 verdict named alongside
  * excision's.
  *
  * SEMANTICS — the documented deviation from the batch door: a DSIR
  * weight depends on BOTH unigram models over the WHOLE corpus, so no
  * ingest-time pass can weigh a document under counts it hasn't seen.
  * This operator weighs each micro-batch under the models AS OF ITS
  * ARRIVAL (accumulated counts ⊕ the batch's own counts). Early
  * batches carry noisier weights (small models); the models converge
  * as the stream accumulates, and by construction the LAST batch's
  * weights equal the batch door's weights for those documents over
  * the same corpus (IncrementalDsirSpec pins this exactly). A
  * periodic global re-weight (the batch door over the accumulated
  * corpus — the excision/q63 reconcile convention) retires early-doc
  * noise when selection needs one consistent model.
  *
  * BOUNDED MODEL, REQUIRED: the incremental form demands
  * `nBuckets > 0` (the paper's hashed 10⁴-bucket setup). With raw
  * vocabulary the count store would grow with corpus vocabulary —
  * exactly the unbounded-driver-adjacent structure this engine
  * refuses — while the bucketed store is ≤ nBuckets rows per batch
  * generation, broadcastable forever.
  *
  * REPLAY SAFETY — counts are NOT set-semantics (the dedup/excision
  * postings trick doesn't apply: a replayed batch would double-count
  * every token). The store therefore keys partial counts by
  * `batch_id`: a foreachBatch replay re-writes the IDENTICAL
  * deterministic rows for its batch id, and the model reader
  * collapses duplicates with `max` per (batch_id, bucket) BEFORE
  * summing across batches — max of identical values is idempotent,
  * so at-least-once delivery cannot inflate a count. */
object IncrementalDsir {

  /** The accumulated model as of the store's current contents:
    * (w, c_r, c_t), duplicates from replays collapsed per batch. */
  private def storeModel(spark: SparkSession, storeDir: String)
      : Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(storeDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(spark.read.parquet(storeDir)
      .groupBy(col("batch_id"), col("w"))
      .agg(max(col("c_r")).as("c_r"), max(col("c_t")).as("c_t"))
      .groupBy(col("w"))
      .agg(sum(col("c_r")).as("c_r"), sum(col("c_t")).as("c_t")))
  }

  def processBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                   storeDir: String, outDir: String,
                   isTarget: org.apache.spark.sql.Column,
                   textCol: String, idCol: String,
                   nBuckets: Int, cjkAware: Boolean = false): Unit = {
    require(nBuckets > 0,
      "incremental DSIR requires a bounded bucketed model " +
        "(nBuckets > 0) — a raw-vocabulary count store would grow " +
        "with corpus vocabulary")
    val tokenize: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      if (cjkAware) Text.tokensCjk else Text.tokens
    val tok = batch.select(col(idCol), isTarget.as("_t"),
        explode(tokenize(col(textCol))).as("_w0"))
      .select(col(idCol), col("_t"),
        Dsir.keyOf(col("_w0"), nBuckets).as("w"))
      .persist()
    try {
      val batchCounts = tok.groupBy("w").agg(
        count(lit(1)).as("c_r"),
        sum(when(col("_t"), 1L).otherwise(0L)).as("c_t"))
      val model = storeModel(spark, storeDir) match {
        case Some(prev) => prev.unionByName(batchCounts)
          .groupBy(col("w"))
          .agg(sum(col("c_r")).as("c_r"), sum(col("c_t")).as("c_t"))
        case None => batchCounts
      }
      Dsir.weightsFromModel(tok.select(col(idCol), col("w")), model, idCol)
        .write.mode("append").parquet(outDir)
      batchCounts.select(lit(batchId).as("batch_id"), col("w"),
          col("c_r"), col("c_t"))
        .write.mode("append").parquet(storeDir)
    } finally { tok.unpersist(); () }
  }

  /** Wire over a streaming (idCol, textCol) frame: per-batch weights
    * land in `outDir` (id, n_tokens, weight_micro — weighed under the
    * models as of arrival), batch-keyed count partials accumulate in
    * `storeDir` (≤ nBuckets rows per batch). */
  def run(spark: SparkSession, docs: DataFrame, storeDir: String,
          outDir: String, checkpoint: String,
          isTarget: org.apache.spark.sql.Column,
          textCol: String = "text", idCol: String = "doc_id",
          nBuckets: Int = 10000, cjkAware: Boolean = false,
          compactEvery: Int = 0,
          compactTargetBytes: Long = 128L * 1024 * 1024): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(spark, batch.toDF(), batchId, storeDir, outDir,
          isTarget, textCol, idCol, nBuckets, cjkAware)
        IncrementalDedup.maybeCompact(spark, batchId, compactEvery,
          Seq(storeDir, outDir), compactTargetBytes)
      }
      .start()
}
