package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
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
  *      append (id, clean_text, n_tokens, n_removed, batch_id) to
  *      `outDir`;
  *   4. append the batch's (batch_id, fingerprint, df) PARTIALS to
  *      the store — one row per distinct gram of the batch.
  *
  * STORE COST — stated, not hidden: exact df needs one row per
  * distinct gram (Lee et al.'s suffix array is likewise
  * corpus-sized; a count sketch would shrink it at the cost of
  * probabilistic df, a trade this engine's q82 exactness stance
  * declines by default). Round 16 moved the store from per-(gram,
  * doc) POSTINGS to per-(gram, batch) df PARTIALS; round 17 bounds
  * the GENERATION term: [[collapseStore]] folds all partials up to a
  * watermark into ONE summed sentinel generation, so the steady-state
  * probe scans O(distinct grams + batches since last collapse) rows
  * instead of O(Σ per-batch distinct grams) — on corpora with
  * cross-batch gram repetition (exactly the template-heavy feeds this
  * operator exists for) that removes the linear-in-history scan term
  * the round-16 SCALING.md measured (4.9 s → 9.2 s per batch as the
  * store grew 229 MB → 911 MB).
  *
  * Batch-keyed partials + max-dedup + the strictly-before model read
  * make at-least-once replays re-emit bit-identical rows (the
  * [[IncrementalDsir]] discipline); [[readCleaned]] is the canonical
  * set-semantics consumer that folds replayed duplicates back out.
  */
object IncrementalExcision {

  /** Sentinel generation directory name for watermark `thru` — lives
    * INSIDE the store dir with a `_` prefix, so naive
    * `spark.read.parquet(storeDir)` readers never see half a
    * collapse (Spark hides `_`/`.`-prefixed paths); all reads go
    * through [[readStore]], which resolves the newest SEALED
    * sentinel explicitly. */
  private def sentinelDirName(thru: Long): String = s"_collapse_$thru"

  private val SentinelRe = "_collapse_(\\d+)".r

  private def fsOf(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** One listing of the store: flat per-batch generation files, plus
    * the newest SEALED sentinel (sealed = Spark's own `_SUCCESS` job
    * marker, written only after every part file committed — the
    * multi-file seal the DSIR store's single-file atomic append
    * couldn't give us), plus any stale sentinel dirs (older sealed
    * ones a crashed cleanup left, or unsealed crashed stages). */
  private case class StoreListing(flatFiles: Seq[Path],
                                  sealedNewest: Option[(Long, Path)],
                                  stale: Seq[Path])

  private def listStore(fs: FileSystem, p: Path): StoreListing = {
    val entries = fs.listStatus(p)
    val flat = entries.filter(st => st.isFile &&
      st.getPath.getName.endsWith(".parquet")).map(_.getPath).toSeq
    val sentinels = entries.filter(_.isDirectory).flatMap { st =>
      st.getPath.getName match {
        case SentinelRe(t) =>
          val sealedOk = fs.exists(new Path(st.getPath, "_SUCCESS"))
          Some((t.toLong, st.getPath, sealedOk))
        case _ => None
      }
    }.toSeq
    val sealedNewest = sentinels.filter(_._3) match {
      case Seq() => None
      case s => Some(s.maxBy(_._1)).map(x => (x._1, x._2))
    }
    val stale = sentinels.collect {
      case (t, path, ok) if !(ok && sealedNewest.exists(_._1 == t)) => path
    }
    StoreListing(flat, sealedNewest, stale)
  }

  /** The RESOLVED store: (batch_id, _f1, _f2, _df) with sentinel
    * supersession applied at the listing level. Only the newest
    * sealed sentinel is read; flat rows at or below its watermark are
    * dropped (they are summed inside it), flat rows above it pass.
    * This one definition makes every collapse crash window read
    * identically: an unsealed stage dir is invisible (no `_SUCCESS`),
    * superseded flat files a crashed delete left behind fail the
    * `batch_id > thru` gate, a replayed collapse reuses the sealed
    * dir it finds, and in-flight rows the sentinel carried forward
    * duplicate their flat originals — which the reader's
    * max-per-(batch, gram) dedup folds back to one. */
  def readStore(spark: SparkSession, storeDir: String): Option[DataFrame] = {
    val (fs, p) = fsOf(spark, storeDir)
    if (!fs.exists(p)) return None
    val l = listStore(fs, p)
    l.sealedNewest match {
      case None =>
        if (l.flatFiles.isEmpty) None
        else Some(spark.read.parquet(l.flatFiles.map(_.toString): _*))
      case Some((thru, dir)) =>
        // pass the sentinel's PART FILES, not the `_`-prefixed dir:
        // an explicitly-passed hidden-named path can be dropped by
        // the reader's listing (silently under-counting df); plain
        // file paths are never filtered
        val sentFiles = fs.listStatus(dir).filter(st => st.isFile &&
          st.getPath.getName.endsWith(".parquet"))
          .map(_.getPath.toString).toSeq
        val paths = sentFiles ++ l.flatFiles.map(_.toString)
        Some(spark.read.parquet(paths: _*)
          .filter(col("batch_id") === lit(-(thru + 1)) ||
            col("batch_id") > lit(thru)))
    }
  }

  /** Accumulated df per gram AS OF batch `batchId`: replay-deduped
    * (max per (batch_id, gram) — a replayed append re-writes
    * identical deterministic partials), restricted to generations
    * strictly BEFORE the batch, summed. The sentinel generation's
    * negative batch id passes the strictly-before gate for every
    * later batch AND for a replay of the collapse-boundary batch
    * itself (sentinel `−(B)` covers ≤ B−1, strictly before B).
    * One row per distinct gram. */
  private def dfAsOf(resolved: DataFrame, batchId: Long): DataFrame =
    resolved.filter(col("batch_id") < lit(batchId))
      .groupBy(col("batch_id"), col("_f1"), col("_f2"))
      .agg(max(col("_df")).as("_df"))
      .groupBy(col("_f1"), col("_f2"))
      .agg(sum(col("_df")).as("_df"))

  /** COLLAPSE the df store's history into one summed sentinel
    * generation, bounding the per-batch probe scan at O(distinct
    * grams + batches since last collapse) rows. The watermark
    * `thru = batchId − 1` covers exactly the generations every later
    * batch (and a replay of `batchId` itself) is allowed to see;
    * generations ≥ `batchId` (replay leftovers of an in-flight
    * batch) are carried forward verbatim under their own batch ids,
    * so the call is safe at any point — [[run]] wires it at the
    * batch boundary, before the batch's own append. Batches STRICTLY
    * BELOW the watermark are no longer exactly replayable (their
    * counts are folded into the sentinel, which the strictly-before
    * read would then include) — sound because their checkpoints are
    * committed: Structured Streaming never re-delivers them.
    *
    * The multi-file publish envelope (the storage engine's
    * stage/seal/supersede discipline — a vocabulary-sized sentinel
    * cannot be the DSIR store's one atomic file append):
    *   1. STAGE: write sentinel + carried-forward rows into
    *      `storeDir/_collapse_<thru>` — hidden from naive readers,
    *      ignored by [[readStore]] until sealed;
    *   2. SEAL: Spark's `_SUCCESS` marker, committed only after every
    *      part file — the reader flips to the sentinel atomically
    *      with this one-file create;
    *   3. SUPERSEDE: delete the flat files listed at stage time and
    *      any older/stale sentinel dirs — every one holds only rows
    *      the sealed reader already ignores or max-dedups away.
    * Crash windows: before seal → store unchanged (stale stage
    * swept by the next collapse); between seal and deletes →
    * superseded files linger, reader output identical, next collapse
    * retries; a REPLAYED collapse finds the sealed dir and skips
    * straight to the deletes.
    *
    * PRECONDITION (why [[run]] excludes the store from file-merge
    * compaction): supersession deletes at file granularity, which
    * requires per-batch appends to stay in their own files — a
    * row-preserving merge would mix superseded and live generations.
    * The collapse IS the store's file-count control: steady-state =
    * one sentinel dir + one small file per batch since last collapse.
    *
    * Returns (storeRows before, after) — the SCALING.md evidence. */
  def collapseStore(spark: SparkSession, storeDir: String,
                    batchId: Long): (Long, Long) = {
    val thru = batchId - 1
    val (fs, p) = fsOf(spark, storeDir)
    if (thru < 0 || !fs.exists(p)) return (0L, 0L)
    val listing = listStore(fs, p)
    val resolved = readStore(spark, storeDir).getOrElse(return (0L, 0L))
    val before = resolved.count()
    // a sealed watermark NEWER than this one means history is already
    // collapsed past `thru` (out-of-order call) — writing a lower
    // sentinel from a view that includes the higher one would fold
    // generations ≥ batchId into a ≤ thru watermark; refuse, no-op
    if (listing.sealedNewest.exists(_._1 > thru)) return (before, before)
    val target = new Path(p, sentinelDirName(thru))
    val alreadySealed =
      listing.sealedNewest.exists(_._1 == thru) && fs.exists(target)
    if (!alreadySealed) {
      // the sentinel = the reader's own view as of batch `batchId` —
      // one definition, so collapse can never diverge from what
      // uncollapsed reads computed (the spec pins ≡ exactly)
      val sentinel = dfAsOf(resolved, batchId)
        .select(lit(-(thru + 1)).as("batch_id"), col("_f1"),
          col("_f2"), col("_df"))
      // generations AT or AFTER batchId (replay leftovers of an
      // in-flight batch) are NOT superseded — carry them forward
      // (replay-deduped) under their own ids so collapse is safe at
      // any call point, not just the run() boundary
      val live = resolved.filter(col("batch_id") >= lit(batchId))
        .groupBy(col("batch_id"), col("_f1"), col("_f2"))
        .agg(max(col("_df")).as("_df"))
        .select(col("batch_id"), col("_f1"), col("_f2"), col("_df"))
      // overwrite clears a crashed unsealed stage at the same
      // watermark; _SUCCESS lands only after every part commits
      sentinel.unionByName(live)
        .write.mode("overwrite").parquet(target.toString)
    }
    // SUPERSEDE — all listed flat files hold only generations the
    // sealed sentinel covers or carries forward; files appended
    // after the listing are untouched by construction
    listing.flatFiles.foreach(f => fs.delete(f, false))
    // the stale sweep must not touch the sentinel just sealed above —
    // a crashed-before-seal stage at the SAME watermark appears in
    // `stale` but was overwritten into the live sentinel
    listing.stale.filter(_.getName != sentinelDirName(thru))
      .foreach(d => fs.delete(d, true))
    listing.sealedNewest.foreach { case (t, dir) =>
      if (t != thru) fs.delete(dir, true) }
    val after = readStore(spark, storeDir).map(_.count()).getOrElse(0L)
    (before, after)
  }

  def processBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                   storeDir: String,
                   outDir: String, textCol: String, idCol: String,
                   k: Int, minDf: Long,
                   selfCheckDocIds: Boolean = false): Unit = {
    require(k >= 1, s"k-gram length must be >= 1, got $k")
    require(minDf >= 2, s"minDf < 2 would excise every position, got $minDf")
    val base = Dedup.spanBase(batch, textCol, idCol).persist()
    try {
      // ONE-BATCH-PER-DOC CONTRACT, probed on request: df partials
      // are exact only if each document id arrives in a single batch
      // (replays of that batch are handled by the batch key); a doc
      // RE-ARRIVING in a later batch would add its df again, silently
      // over-excising. The probe reads outDir ids under STRICTLY
      // EARLIER batch ids — a replay's own first-attempt rows carry
      // batch_id == batchId and are excluded, so there are no false
      // positives on the at-least-once window. Opt-in because the
      // probe scans outDir's id column every batch.
      if (selfCheckDocIds) {
        val (ofs, op) = fsOf(spark, outDir)
        if (ofs.exists(op)) {
          val dup = spark.read.parquet(outDir)
            .filter(col("batch_id") < lit(batchId))
            .join(broadcast(base.select(col("id"))), Seq("id"),
              "left_semi")
            .limit(5).collect()
          require(dup.isEmpty,
            s"IncrementalExcision: document id(s) " +
              s"[${dup.map(_.get(0)).mkString(", ")}] of batch $batchId " +
              "already ingested under an earlier batch — the " +
              "one-batch-per-doc contract is violated and df would " +
              "silently over-count. Dedup the feed upstream, or run " +
              "periodic global re-excision over the deduped corpus")
        }
      }
      val grams = Dedup.spanGrams(base, k).persist()
      try {
        // df PARTIALS, not postings (round 16): one row per DISTINCT
        // gram of the batch instead of one per (gram, doc) — exact
        // under the one-batch-per-doc contract above, and it divides
        // the store's row count by the within-batch duplication
        // factor, largest precisely on the template-heavy corpora
        // this operator exists for.
        val batchDf = grams.groupBy(col("_f1"), col("_f2"))
          .agg(countDistinct(col("id")).as("_df"))
        // store probe: only grams the batch carries matter — a
        // genuinely absent store means "first batch"; a read failure
        // must propagate (the IncrementalDedup stance)
        val touched = batchDf.select(col("_f1"), col("_f2"))
        // model read is AS OF this batch (batch_id < batchId): a
        // replay finds its own first-attempt partials in the store
        // and must NOT count them on top of its own recount — with
        // the filter, replayed output rows are bit-identical
        val prior = readStore(spark, storeDir).map(raw =>
          dfAsOf(raw.join(broadcast(touched), Seq("_f1", "_f2"),
            "left_semi"), batchId))
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
        // batch_id rides along (trailing column): it is what lets
        // readCleaned and the self-check distinguish a bit-identical
        // REPLAY (same batch id) from a contract-violating
        // re-arrival (different batch id)
        Dedup.exciseAgainst(base, hotStarts, k)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outDir)
        batchDf.select(lit(batchId).as("batch_id"), col("_f1"),
            col("_f2"), col("_df"))
          .write.mode("append").parquet(storeDir)
      } finally { grams.unpersist(); () }
    } finally { base.unpersist(); () }
  }

  /** The canonical SET-SEMANTICS consumer of `outDir` — the
    * at-least-once contract made executable: replayed batches append
    * bit-identical (id, clean_text, n_tokens, n_removed, batch_id)
    * rows (same batch id, same deterministic excision), so
    * `distinct` restores exactly-once delivery. Downstream readers
    * go through this door, not a raw parquet read. */
  def readCleaned(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir).distinct()

  /** Wire over a streaming (idCol, textCol) frame: cleaned docs land
    * in `outDir` ((id, clean_text, n_tokens, n_removed, batch_id) —
    * read them back through [[readCleaned]]), batch-keyed df partials
    * accumulate in `storeDir` (one row per distinct gram per batch,
    * rolled up by [[collapseStore]]).
    *
    * CONTRACT: each document id arrives in exactly ONE batch (the
    * standard append-only ingest shape) — acknowledged at runtime by
    * `selfCheckDocIds` (opt-in probe; see [[processBatch]]).
    * At-least-once REPLAYS of the same batch remain exact (batch key
    * + max-dedup + the strictly-before model read) and are folded
    * out by [[readCleaned]].
    *
    * `collapseEvery` (default: follow `compactEvery`) rolls the
    * store up into one sealed sentinel generation every N batches,
    * at the batch BOUNDARY (before the batch's own append — the
    * replay-safe point). File-merge compaction applies to `outDir`
    * only: the store's file count is the collapse's job, and merging
    * store files would break its file-precise supersession (see
    * [[collapseStore]]). */
  def run(spark: SparkSession, docs: DataFrame, storeDir: String,
          outDir: String, checkpoint: String,
          textCol: String = "text", idCol: String = "doc_id",
          k: Int = 8, minDf: Long = 2L,
          compactEvery: Int = 0,
          compactTargetBytes: Long = 128L * 1024 * 1024,
          collapseEvery: Int = -1,
          selfCheckDocIds: Boolean = false): StreamingQuery = {
    val collapseN = if (collapseEvery < 0) compactEvery else collapseEvery
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (collapseN > 0 && batchId > 0 && batchId % collapseN == 0) {
          collapseStore(spark, storeDir, batchId); ()
        }
        processBatch(spark, batch.toDF(), batchId, storeDir, outDir,
          textCol, idCol, k, minDf, selfCheckDocIds)
        IncrementalDedup.maybeCompact(spark, batchId, compactEvery,
          Seq(outDir), compactTargetBytes)
      }
      .start()
  }
}
