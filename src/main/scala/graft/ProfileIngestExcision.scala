package graft

import org.apache.spark.sql.functions._

/** Measures the [[graft.streaming.IncrementalExcision]] postings
  * store AT SCALE — the round-15 verdict's task 5: the ~24 B/token
  * store cost is STATED in the operator's scaladoc but was never
  * measured, and probe latency as the store accumulates is the
  * operator's only scale unknown (the probe is a semi join on the
  * batch's fingerprints, so it SHOULD track batch size, not store
  * size).
  *
  * `runMain graft.ProfileIngestExcision <sfDir> <nBatches> [k] [minDf]`
  * splits the documents table into `nBatches` deterministic
  * micro-batches (`doc_id % nBatches`), drives the ingest path batch
  * by batch, and prints one JSON line per batch:
  * {batch, sec, store_bytes, cum_tokens, bytes_per_token} — `sec` is
  * the full processBatch wall time (probe + hot set + excision +
  * appends), token accounting runs OUTSIDE the timer. Feed it the
  * 10×/100× fixtures for the SCALING.md table. */
object ProfileIngestExcision {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nBatches = if (args.length > 1) args(1).toInt else 20
    val k = if (args.length > 2) args(2).toInt else 8
    val minDf = if (args.length > 3) args(3).toLong else 2L
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
      val batch = docs.filter(pmod(col("doc_id"), lit(nBatches.toLong))
        === b.toLong)
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
    val storeRows = spark.read.parquet(store).count()
    println(s"""{"store_rows":$storeRows,"sf":"$sfDir","batches":$nBatches,"k":$k,"min_df":$minDf}""")
    spark.stop()
  }
}
