package graft

import org.apache.spark.sql.SparkSession

/** Rewrites a testdata scale dir into a multi-file layout so the bench
  * can exercise parallel scans.
  *
  * Motivation (BASELINE.md floor note): every driver-generated sf0.1
  * table is ONE parquet file with ONE row group, and a parquet scan
  * cannot split inside a row group — so every scan+partial-agg stage in
  * the stock bench runs on one core no matter the core count, hiding
  * the parallelism the plans are designed for. Production tables write
  * many row groups; this tool produces that layout at the same SF:
  * each table re-written as `nFiles` parquet files (values untouched —
  * a round-robin repartition only changes file layout, and every
  * catalog query is order-insensitive).
  *
  * Output mirrors the testdata layout (`<dst>/<table>.parquet` as a
  * DIRECTORY of part files — `spark.read.parquet` treats file and dir
  * the same), so `SPARK_GRAFT_SF_DIR=<dst> sbt "runMain graft.Bench"`
  * is the multi-file bench mode with zero bench changes.
  *
  * Usage: runMain graft.FixtureGen [srcDir] [dstDir] [nFiles]
  */
object FixtureGen {
  val tables: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "fixtures/sf0.1x24"
    val nFiles = if (args.length > 2) args(2).toInt else 24
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    tables.foreach { t =>
      // tiny dims stay single-file: splitting a 5-row table into 24
      // files only adds task overhead
      val df = spark.read.parquet(s"$src/$t.parquet")
      val n = if (df.count() < 10000L) 1 else nFiles
      df.repartition(n).write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[fixturegen] $t -> $n file(s)")
    }
    spark.stop()
  }
}
