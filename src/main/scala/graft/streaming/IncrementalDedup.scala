package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.maintenance.Compaction
import graft.operators.Dedup

/** Incremental near-dup detection: dedup newly arriving documents
  * against the accumulated corpus — the shape a crawl-ingest pipeline
  * actually needs (batch dedup answers "is this corpus internally
  * unique"; ingest needs "is this NEW doc a dup of anything we already
  * kept").
  *
  * Per micro-batch (`foreachBatch`):
  *   1. band the batch's minhash signatures (one codegen'd projection);
  *   2. join against the persisted band store — only matching buckets
  *      are compared, so the probe cost scales with the batch, not the
  *      corpus;
  *   3. emit (new_id, corpus_id, est_jaccard) dup pairs plus
  *      batch-internal pairs;
  *   4. append the batch's bands to the store.
  *
  * The store is a parquet dir here (bands-partitionable; Iceberg
  * drop-in); its size is ~bands×8B per doc, a tiny fraction of text.
  *
  * Store maintenance: every micro-batch appends one parquet generation
  * to the store and pairs dirs — a 200 ms trigger makes thousands of
  * tiny files, and every probe join then pays their open/footer cost.
  * `compactEvery = N` runs [[graft.maintenance.Compaction
  * .rewriteDataFiles]] over both dirs after every Nth batch.
  * `foreachBatch` bodies are serialized per query, so the compactor is
  * the sole writer during its window (the single-writer contract).
  * Compaction uses `promoteFirst = true` because every store consumer
  * deduplicates postings before thresholding (`distinct()` /
  * `countDistinct`): a crash mid-swap can only surface transient
  * duplicates, never drop postings. For the PAIRS dir the same
  * ordering is right for a different reason: `foreachBatch` is
  * at-least-once, so a replayed batch already re-appends its pairs —
  * the pairs output is an at-least-once product whose consumers must
  * apply set semantics regardless, and a mid-swap crash (which can
  * persist both generations into the next rewrite) adds no failure
  * mode that delivery hasn't already imposed. Snapshots are expired
  * immediately after a successful swap — both dirs are derivative of
  * the stream, so retaining generation history would just double disk
  * per cycle. */
object IncrementalDedup {

  /** Compact `dirs` after every `every`-th batch (no-op if `every` ≤ 0
    * or a dir doesn't exist yet). Shared with the other incremental
    * ingest doors ([[IncrementalExcision]]). */
  private[streaming] def maybeCompact(spark: SparkSession, batchId: Long, every: Int,
                           dirs: Seq[String], targetBytes: Long): Unit =
    if (every > 0 && batchId % every == every - 1) dirs.foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      if (p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)) {
        Compaction.rewriteDataFiles(spark, d, targetBytes, promoteFirst = true)
        Compaction.expireSnapshots(spark, d, System.currentTimeMillis() + 1)
      }
    }

  def processBatch(spark: SparkSession, batch: DataFrame, storeDir: String,
                   pairsDir: String, textCol: String, idCol: String,
                   numHashes: Int, bands: Int, estThreshold: Double,
                   maxBucket: Int = 10000): Unit = {
    val banded = Dedup.bandFrame(batch, textCol, idCol, numHashes, bands)
      .persist()
    try {
      val newSide = banded.select(col("band"), col("band_key"),
        col("id").as("new_id"), col("sig").as("new_sig"))

      // new-vs-corpus pairs. Only a genuinely absent store means "first
      // batch"; a transient read failure must propagate, not silently
      // skip the corpus comparison and let dups through. The existence
      // probe resolves the PATH's filesystem so scheme-qualified stores
      // (s3a://…) work.
      // Hot-bucket guard on the STORE side (same concession as
      // minHashLsh's): a boilerplate band_key accumulated over a long
      // stream would fan every later batch out by its store bucket
      // size. Census = the store's postings restricted to buckets the
      // batch actually touches (semi join first — the aggregation
      // stays proportional to fingerprint collisions, not corpus
      // size), census fraction exactly 1.0 on that slice.
      val storePath = new org.apache.hadoop.fs.Path(storeDir)
      val fs = storePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val store =
        if (fs.exists(storePath)) Some(spark.read.parquet(storeDir))
        else None
      // batch-side guard: exact census over the persisted banded frame
      // (one cheap aggregation; a replayed or oversized micro-batch
      // with boilerplate text is the intra-join's own O(L²) hazard)
      val guardedNew = Dedup.hotBucketGuard(newSide, banded, maxBucket, 1.0)
      val crossPairs = store.map { st =>
        val touched = banded.select(col("band"), col("band_key")).distinct()
        val matching = st.join(broadcast(touched), Seq("band", "band_key"),
          "left_semi")
        val guarded = Dedup.hotBucketGuard(matching, matching, maxBucket, 1.0)
        guardedNew.join(
            guarded.select(col("band"), col("band_key"),
              col("id").as("corpus_id"), col("sig").as("corpus_sig")),
            Seq("band", "band_key"))
          .select(col("new_id"), col("corpus_id"),
            Dedup.estJaccard(col("new_sig"), col("corpus_sig"), numHashes)
              .as("est_jaccard"))
          .distinct()
          .filter(col("est_jaccard") >= estThreshold)
      }

      // batch-internal pairs
      val intra = guardedNew
        .join(guardedNew.select(col("band"), col("band_key"),
          col("new_id").as("corpus_id"), col("new_sig").as("corpus_sig")),
          Seq("band", "band_key"))
        .filter(col("new_id") < col("corpus_id"))
        .select(col("new_id"), col("corpus_id"),
          Dedup.estJaccard(col("new_sig"), col("corpus_sig"), numHashes)
            .as("est_jaccard"))
        .distinct()
        .filter(col("est_jaccard") >= estThreshold)

      val pairs = crossPairs.map(_.unionByName(intra)).getOrElse(intra)
      pairs.write.mode("append").parquet(pairsDir)
      banded.write.mode("append").parquet(storeDir)
    } finally { banded.unpersist(); () }
  }

  /** Wire over a streaming (idCol, textCol) frame. */
  def run(spark: SparkSession, docs: DataFrame, storeDir: String,
          pairsDir: String, checkpoint: String,
          textCol: String = "text", idCol: String = "doc_id",
          numHashes: Int = 64, bands: Int = 16,
          estThreshold: Double = 0.5,
          compactEvery: Int = 0,
          compactTargetBytes: Long = 128L * 1024 * 1024,
          maxBucket: Int = 10000): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(spark, batch.toDF(), storeDir, pairsDir,
          textCol, idCol, numHashes, bands, estThreshold, maxBucket)
        maybeCompact(spark, batchId, compactEvery,
          Seq(storeDir, pairsDir), compactTargetBytes)
      }
      .start()

  /** C4-at-ingest: chunk each micro-batch
    * ([[graft.operators.Chunking.chunk]]) and dedup the CHUNKS
    * incrementally across batches — the grain C4 dedups at (q73 is
    * this shape in batch), composed from the existing chunker and the
    * [[processBatch]] band store. Each chunk rides the machinery as
    * its own document with id `<doc id>#<chunk idx>`; exact duplicate
    * chunks always agree on their whole signature, so the default
    * `estThreshold = 1.0` flags every exact C4-style duplicate —
    * ONE-SIDED, like the bloom decontaminator: est_jaccard = 1.0
    * means all `numHashes` minhashes collide, which a DISTINCT
    * near-identical pair also achieves with probability ~J^numHashes
    * (≈0.1% at J=0.9, 64 hashes), so a consumer needing guaranteed
    * textual equality must compare the flagged pair's chunk texts (or
    * fingerprints, the batch-side q73 shape) before deleting; lower
    * thresholds flag near-dup chunks too. Store/pairs
    * layout, compaction, single-writer and at-least-once contracts
    * are exactly [[run]]'s — the store just holds chunk-grain bands
    * (chunks per doc × bands × ~8 B, still a sliver of the text). */
  def runChunks(spark: SparkSession, docs: DataFrame, storeDir: String,
                pairsDir: String, checkpoint: String,
                textCol: String = "text", idCol: String = "doc_id",
                size: Int = 512, step: Int = 512,
                numHashes: Int = 64, bands: Int = 16,
                estThreshold: Double = 1.0,
                compactEvery: Int = 0,
                compactTargetBytes: Long = 128L * 1024 * 1024): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val chunks = graft.operators.Chunking
          .chunk(batch.toDF(), textCol, size, step, Seq(idCol))
          .withColumn("chunk_id",
            concat(col(idCol).cast("string"), lit("#"), col("chunk_idx")))
        processBatch(spark, chunks, storeDir, pairsDir,
          "chunk_text", "chunk_id", numHashes, bands, estThreshold)
        maybeCompact(spark, batchId, compactEvery,
          Seq(storeDir, pairsDir), compactTargetBytes)
      }
      .start()

  /** Publish the current chunk-grain survivor set as an atomic shard
    * generation — the step that turns the incremental dedup VERDICT
    * into the thing an ingest actually ships: a versioned, verifiable
    * corpus (`Sinks.publishDelta`: only shards whose membership
    * changed since the previous generation are rewritten; the rest
    * hard-link forward, so a steady-state flush costs the new batch,
    * not the corpus).
    *
    * Survivor rule: for every flagged pair, the chunk with the GREATER
    * chunk_id loses (self-pairs from at-least-once replays are
    * ignored). At the exact-dup default (`estThreshold = 1.0`)
    * identical chunks form a pairwise CLIQUE across batches — every
    * later arrival pairs with every earlier occurrence — so exactly
    * the minimum chunk_id survives, replay-stably (the rule is a pure
    * function of the accumulated pair set, and replays only re-append
    * existing pairs). At near-dup thresholds this is the standard
    * greedy over-drop: a chain A~B~C drops B and C even though A~C was
    * never flagged — the conservative direction for dedup.
    *
    * Returns the new live manifest. */
  def flushChunks(spark: SparkSession, chunksDir: String, pairsDir: String,
                  pubDir: String, nShards: Int,
                  retainPrevious: Boolean = false): DataFrame = {
    val pairsPath = new org.apache.hadoop.fs.Path(pairsDir)
    val fs = pairsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // distinct(): foreachBatch is at-least-once, replays re-append
    val chunks = spark.read.parquet(chunksDir).distinct()
    val survivors =
      if (fs.exists(pairsPath)) {
        val losers = spark.read.parquet(pairsDir)
          .filter(col("new_id") =!= col("corpus_id"))
          .select(greatest(col("new_id"), col("corpus_id")).as("chunk_id"))
          .distinct()
        chunks.join(losers, Seq("chunk_id"), "left_anti")
      } else chunks
    graft.sinks.Sinks.publishDelta(survivors, pubDir, "chunk_id", nShards,
      retainPrevious = retainPrevious)
  }

  /** [[runChunks]] composed with the publisher: chunk each batch,
    * dedup incrementally, AND keep the chunk texts in `$workDir/chunks`
    * so every `publishEvery`-th batch can flush the survivor set to
    * `$workDir/pub` as an atomic generation ([[flushChunks]]). Layout
    * under `workDir`: `store` (bands), `pairs` (dup verdicts),
    * `chunks` (chunk texts — the only copy the publisher needs),
    * `pub` (the live shard generation + manifest). The foreachBatch
    * body is serialized per query, so the flush holds the publish
    * lease uncontended; an EXTERNAL publisher racing the stream is
    * refused by the lease, loudly. */
  def runChunksPublishing(spark: SparkSession, docs: DataFrame,
                          workDir: String, checkpoint: String,
                          textCol: String = "text", idCol: String = "doc_id",
                          size: Int = 512, step: Int = 512,
                          numHashes: Int = 64, bands: Int = 16,
                          estThreshold: Double = 1.0,
                          publishEvery: Int = 1, nShards: Int = 16,
                          compactEvery: Int = 0,
                          compactTargetBytes: Long = 128L * 1024 * 1024,
                          retainPrevious: Boolean = false): StreamingQuery = {
    val (storeDir, pairsDir) = (s"$workDir/store", s"$workDir/pairs")
    val (chunksDir, pubDir) = (s"$workDir/chunks", s"$workDir/pub")
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val chunks = graft.operators.Chunking
          .chunk(batch.toDF(), textCol, size, step, Seq(idCol))
          .withColumn("chunk_id",
            concat(col(idCol).cast("string"), lit("#"), col("chunk_idx")))
          .persist()
        try {
          chunks.select(col("chunk_id"), col(idCol), col("chunk_idx"),
            col("chunk_text")).write.mode("append").parquet(chunksDir)
          processBatch(spark, chunks, storeDir, pairsDir,
            "chunk_text", "chunk_id", numHashes, bands, estThreshold)
        } finally { chunks.unpersist(); () }
        maybeCompact(spark, batchId, compactEvery,
          Seq(storeDir, pairsDir, chunksDir), compactTargetBytes)
        if (publishEvery > 0 && batchId % publishEvery == publishEvery - 1) {
          flushChunks(spark, chunksDir, pairsDir, pubDir, nShards,
            retainPrevious)
          ()
        }
      }
      .start()
  }

  /** Embedding twin of [[processBatch]]: incremental near-dup over
    * vectors with banded sign-RP blocking (operators.Dedup
    * .embeddingNearDup's blocking, applied new-vs-corpus). The store
    * persists (band, band_key, id, v, nrm) — the vector rides the
    * store because candidate verification needs the exact cosine, and
    * the probe join broadcasts the (small) batch side so store vectors
    * stream through the scan rather than shuffling.
    *
    * SIZING (the q16 scale law applies here too): with fixed planes
    * the expected store bucket is corpus/2^planes, so per-batch probe
    * cost grows linearly with the ACCUMULATED corpus. Choose planes
    * for the corpus you expect at steady state —
    * [[graft.operators.Dedup.srpParams]] gives the balanced
    * (planes, bands) for a target bucket and recall floor. The knobs
    * are deliberately NOT adaptive per batch: band keys depend on the
    * hyperplanes, so changing planes mid-stream would require
    * re-banding the whole store (a full rebuild) — fix them at stream
    * start from the projected corpus size. */
  def processEmbeddingBatch(spark: SparkSession, batch: DataFrame,
                            storeDir: String, pairsDir: String,
                            vecCol: String, idCol: String,
                            planes: Int, bands: Int,
                            threshold: Double): Unit = {
    import graft.functions.Vectors
    val banded = batch.select(col(idCol).as("id"), col(vecCol).as("v"),
        Vectors.norm(col(vecCol)).as("nrm"),
        posexplode(Vectors.rpBands(col(vecCol), planes, bands)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_key")
      .persist()
    try {
      def cosPairs(left: DataFrame, right: DataFrame): DataFrame =
        left.join(right, Seq("band", "band_key"))
          .select(col("new_id"), col("corpus_id"),
            Vectors.cosineWithNorms(Vectors.dot(col("v_n"), col("v_c")),
              col("n_n"), col("n_c")).as("cosine"))
          .distinct()
          .filter(col("cosine") >= threshold)
      val newSide = banded.select(col("band"), col("band_key"),
        col("id").as("new_id"), col("v").as("v_n"), col("nrm").as("n_n"))
      val storePath = new org.apache.hadoop.fs.Path(storeDir)
      val fs = storePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val cross =
        if (fs.exists(storePath))
          Some(cosPairs(newSide, spark.read.parquet(storeDir)
            .select(col("band"), col("band_key"), col("id").as("corpus_id"),
              col("v").as("v_c"), col("nrm").as("n_c"))))
        else None
      val intra = cosPairs(newSide,
        banded.select(col("band"), col("band_key"), col("id").as("corpus_id"),
          col("v").as("v_c"), col("nrm").as("n_c")))
        .filter(col("new_id") < col("corpus_id"))
      val pairs = cross.map(_.unionByName(intra)).getOrElse(intra)
      pairs.write.mode("append").parquet(pairsDir)
      banded.write.mode("append").parquet(storeDir)
    } finally { banded.unpersist(); () }
  }

  /** Span twin of [[processBatch]]: incremental VERBATIM-SPAN
    * detection (Dedup.spanFingerprints' winnowing scheme applied
    * new-vs-corpus). The store persists (fp, id) postings — ~1/w of
    * the batch's gram hashes, no text; the probe joins the batch's
    * fingerprints against matching store postings only, so cost scales
    * with fingerprint collisions, not corpus size. Emits
    * (new_id, corpus_id, n_shared) for pairs sharing ≥ `minShared`
    * fingerprints, plus batch-internal pairs via the same posting-list
    * combination expansion as [[graft.operators.Dedup.sharedSpans]] —
    * including its hot-fingerprint guard: batch-internal posting lists
    * over `maxPostings` and store fingerprints held by more than
    * `maxPostings` corpus docs are dropped loudly (observed metric +
    * driver WARN) before any expansion/join, so one boilerplate fp
    * accumulated across a long stream cannot fan a later batch out to
    * df² pair rows. */
  def processSpanBatch(spark: SparkSession, batch: DataFrame,
                       storeDir: String, pairsDir: String,
                       textCol: String, idCol: String,
                       k: Int, w: Int, minShared: Long,
                       maxPostings: Int = 10000): Unit = {
    val fps = Dedup.spanFingerprints(batch, textCol, idCol, k, w).persist()
    try {
      val storePath = new org.apache.hadoop.fs.Path(storeDir)
      val fs = storePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // countDistinct(fp), not count(1): foreachBatch is at-least-once
      // and the store is append-only, so a replayed batch appends its
      // (fp, id) postings twice — a plain count would then double every
      // later batch's shared-fingerprint tally against those docs
      // (2 shared fps reading as 4 ≥ minShared). Distinct fps per pair
      // is the quantity the threshold is defined over.
      // The store-side guard reuses the same grouped-postings shape:
      // group the store's matching postings per fp, drop hot lists,
      // re-explode. Only fps PRESENT IN THE BATCH are grouped (the
      // semi join keeps the aggregation proportional to fingerprint
      // collisions, not corpus size — the same cost contract as the
      // probe join itself).
      val cross =
        if (fs.exists(storePath)) {
          val batchFps = fps.select(col("fp")).distinct()
          val matching = spark.read.parquet(storeDir)
            .select(col("fp"), col("id").as("corpus_id"))
            .join(broadcast(batchFps), Seq("fp"), "left_semi")
          val guarded = Dedup.dropHotPostings(
              matching.groupBy(col("fp"))
                .agg(collect_list(col("corpus_id")).as("_cids")),
              "_cids", maxPostings)
            .select(col("fp"), explode(col("_cids")).as("corpus_id"))
          Some(fps.select(col("fp"), col("id").as("new_id"))
            .join(guarded, Seq("fp"))
            .groupBy(col("new_id"), col("corpus_id"))
            .agg(countDistinct(col("fp")).as("n_shared"))
            .filter(col("n_shared") >= minShared))
        } else None
      val intraAll = fps.groupBy(col("fp")).agg(collect_list(col("id")).as("_ids"))
      val intra = Dedup.pairCombos(
        Dedup.dropHotPostings(intraAll, "_ids", maxPostings), "_ids")
        .groupBy(col("_a").as("new_id"), col("_b").as("corpus_id"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= minShared)
      val pairs = cross.map(_.unionByName(intra)).getOrElse(intra)
      pairs.write.mode("append").parquet(pairsDir)
      fps.write.mode("append").parquet(storeDir)
    } finally { fps.unpersist(); () }
  }

  /** Wire the span variant over a streaming (idCol, textCol) frame. */
  def runSpans(spark: SparkSession, docs: DataFrame, storeDir: String,
               pairsDir: String, checkpoint: String,
               textCol: String = "text", idCol: String = "doc_id",
               k: Int = 8, w: Int = 4, minShared: Long = 3L,
               compactEvery: Int = 0,
               compactTargetBytes: Long = 128L * 1024 * 1024,
               maxPostings: Int = 10000): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processSpanBatch(spark, batch.toDF(), storeDir, pairsDir,
          textCol, idCol, k, w, minShared, maxPostings)
        maybeCompact(spark, batchId, compactEvery,
          Seq(storeDir, pairsDir), compactTargetBytes)
      }
      .start()

  /** Wire the embedding variant over a streaming (idCol, vecCol) frame. */
  def runEmbeddings(spark: SparkSession, vecs: DataFrame, storeDir: String,
                    pairsDir: String, checkpoint: String,
                    vecCol: String = "embedding", idCol: String = "vec_id",
                    planes: Int = 8, bands: Int = 3,
                    threshold: Double = 0.95,
                    compactEvery: Int = 0,
                    compactTargetBytes: Long = 128L * 1024 * 1024): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processEmbeddingBatch(spark, batch.toDF(), storeDir, pairsDir,
          vecCol, idCol, planes, bands, threshold)
        maybeCompact(spark, batchId, compactEvery,
          Seq(storeDir, pairsDir), compactTargetBytes)
      }
      .start()
}
