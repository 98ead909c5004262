package graft

import org.apache.spark.sql.functions._

/** Measures the [[graft.streaming.IncrementalExcision]] df store AT
  * SCALE — round 16 measured the postings→partials rewrite
  * (15–17 B/token flat) but also exposed the remaining term: the
  * probe scans the WHOLE store every batch, linear in store size per
  * batch = quadratic over a stream's lifetime (the round-16 verdict's
  * What's-wrong #1). Round 17 adds [[graft.streaming
  * .IncrementalExcision.collapseStore]]; this harness is the evidence
  * that the history term is gone: with collapse on, late-batch wall
  * must sit at early-batch wall instead of climbing.
  *
  * `runMain graft.ProfileIngestExcision <sfDir> <nBatches> [k] [minDf]
  * [collapseEvery] [mode]`
  * mode `split` (default) partitions the documents table into
  * `nBatches` deterministic micro-batches (`doc_id % nBatches`) —
  * pass a LARGE nBatches for the trickle regime (many small batches,
  * the streaming-production shape). Mode `repeat` feeds the WHOLE
  * corpus every batch under fresh doc ids (ids offset per batch) —
  * the template-heavy / re-crawl shape where every batch re-carries
  * the same grams: without collapse the store grows one generation
  * per batch over a FIXED vocabulary (the pure history term); with
  * collapse it folds back to one vocabulary-sized sentinel, which is
  * exactly the regime the history collapse exists for. Drives the
  * ingest path batch by batch with the run() wiring's collapse
  * cadence, and prints one JSON line per batch:
  * {batch, sec, store_bytes, cum_tokens, bytes_per_token} — `sec` is
  * the full processBatch wall time (probe + hot set + excision +
  * appends), token accounting runs OUTSIDE the timer; collapse
  * batches additionally print {collapse_at, rows_before, rows_after,
  * collapse_sec} (collapse time is NOT in the batch's `sec` — it is
  * amortized cadence work, priced separately like q122's publish).
  * Feed it the 10×/100× fixtures for the SCALING.md table. */
object ProfileIngestExcision {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nBatches = if (args.length > 1) args(1).toInt else 20
    val k = if (args.length > 2) args(2).toInt else 8
    val minDf = if (args.length > 3) args(3).toLong else 2L
    val collapseEvery = if (args.length > 4) args(4).toInt else 0
    val mode = if (args.length > 5) args(5) else "split"
    require(mode == "split" || mode == "repeat", s"unknown mode $mode")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus.toInt)
    val work = java.nio.file.Files
      .createTempDirectory("graft_pix_").toString
    val store = s"$work/store"
    val out = s"$work/out"
    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text"))

    def dirBytes(dir: String): Long = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) 0L
      else fs.getContentSummary(p).getLength
    }

    var cumTokens = 0L
    for (b <- 0 until nBatches) {
      if (collapseEvery > 0 && b > 0 && b % collapseEvery == 0) {
        val t0 = System.nanoTime()
        val (before, after) = graft.streaming.IncrementalExcision
          .collapseStore(spark, store, b.toLong)
        val cSec = (System.nanoTime() - t0) / 1e9
        println(f"""{"collapse_at":$b,"rows_before":$before,""" +
          f""""rows_after":$after,"collapse_sec":$cSec%.3f}""")
      }
      val batch =
        if (mode == "split")
          docs.filter(pmod(col("doc_id"), lit(nBatches.toLong))
            === b.toLong)
        else // repeat: same corpus, fresh ids per batch (offset keeps
             // the one-batch-per-doc contract while every gram repeats)
          docs.select((col("doc_id") + lit(b * 100000000L)).as("doc_id"),
            col("text"))
      val t0 = System.nanoTime()
      graft.streaming.IncrementalExcision.processBatch(
        spark, batch, b.toLong, store, out, "text", "doc_id", k, minDf)
      val sec = (System.nanoTime() - t0) / 1e9
      // token accounting outside the timer (same tokenizer as the door)
      cumTokens += batch.select(
          sum(size(split(trim(regexp_replace(col("text"), "\\s+", " ")),
            " "))))
        .head.getLong(0)
      val bytes = dirBytes(store)
      println(f"""{"batch":$b,"sec":$sec%.3f,"store_bytes":$bytes,""" +
        f""""cum_tokens":$cumTokens,""" +
        f""""bytes_per_token":${bytes.toDouble / math.max(1L, cumTokens)}%.2f}""")
    }
    val storeRows = graft.streaming.IncrementalExcision
      .readStore(spark, store).map(_.count()).getOrElse(0L)
    println(s"""{"store_rows":$storeRows,"sf":"$sfDir","batches":$nBatches,""" +
      s""""k":$k,"min_df":$minDf,"collapse_every":$collapseEvery}""")
    spark.stop()
  }
}
