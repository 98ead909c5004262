package graft

import org.apache.spark.sql.functions._

/** Measures [[graft.streaming.IncrementalDsir]]'s count-store growth
  * and the round-16 collapse — the r15 verdict's What's-wrong #2
  * evidence: store rows and per-batch latency BEFORE vs AFTER
  * `collapseStore`, over a long synthetic stream.
  *
  * `runMain graft.ProfileDsirStore <sfDir> <nBatches> [nBuckets]`
  * drives processBatch over `nBatches` micro-batches (documents split
  * by doc_id mod), printing per-batch seconds and store rows; at the
  * end it collapses and re-runs one batch so the O(batches·nBuckets)
  * vs O(nBuckets) model-read difference is a measured number. */
object ProfileDsirStore {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nBatches = if (args.length > 1) args(1).toInt else 40
    val nBuckets = if (args.length > 2) args(2).toInt else 4096
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus.toInt)
    val work = java.nio.file.Files
      .createTempDirectory("graft_pds_").toString
    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("lang"), col("text"))

    def batchOf(b: Int) = docs.filter(
      pmod(col("doc_id"), lit(nBatches.toLong)) === b.toLong)
    def step(b: Long, batch: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      graft.streaming.IncrementalDsir.processBatch(spark, batch, b,
        s"$work/store", s"$work/out", col("lang") === "en",
        "text", "doc_id", nBuckets)
      (System.nanoTime() - t0) / 1e9
    }
    var first = 0.0
    var last = 0.0
    for (b <- 0 until nBatches) {
      val sec = step(b.toLong, batchOf(b))
      if (b == 0) first = sec
      if (b == nBatches - 1) last = sec
      if (b % 10 == 9 || b == 0) {
        val rows = spark.read.parquet(s"$work/store").count()
        println(f"""{"batch":$b,"sec":$sec%.3f,"store_rows":$rows}""")
      }
    }
    val (before, after) = graft.streaming.IncrementalDsir
      .collapseStore(spark, s"$work/store", nBatches.toLong)
    // measure the collapsed-store model read with a FRESH batch id
    // (nBatches): the sentinel's watermark is thru = nBatches−1, so
    // re-running batch nBatches−1 would read a model that ALREADY
    // contains that batch's counts and then add them again — an
    // inflated model and non-identical out rows (round-16 advisor).
    // batch id nBatches keeps the sentinel strictly before, so this
    // measures exactly the steady-state O(nBuckets) read.
    val freshSec = step(nBatches.toLong, batchOf(nBatches - 1))
    println(f"""{"collapse_rows_before":$before,"collapse_rows_after":$after,""" +
      f""""first_batch_sec":$first%.3f,"last_batch_sec":$last%.3f,""" +
      f""""fresh_batch_after_collapse_sec":$freshSec%.3f,""" +
      f""""n_batches":$nBatches,"n_buckets":$nBuckets,"sf":"$sfDir"}""")
    spark.stop()
  }
}
