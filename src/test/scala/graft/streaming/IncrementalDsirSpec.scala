package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[IncrementalDsir]] — DSIR weights at ingest. Pins (a) the
  * model-as-of-arrival law (early weights differ, the LAST batch's
  * weights equal the batch door's over the same corpus — exactly),
  * (b) count-store replay idempotence (the batch-keyed max-collapse),
  * (c) the nBuckets > 0 requirement. */
class IncrementalDsirSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_idsir_").toString

  test("model accumulates across batches; the last batch's weights " +
    "equal the batch door's (model-as-of-arrival, exact at the tail)") {
    implicit val sc = spark.sqlContext
    val work = tmp()
    val in = MemoryStream[(Long, String, String)]
    val q = IncrementalDsir.run(spark,
      in.toDF().toDF("doc_id", "lang", "text"),
      s"$work/store", s"$work/out", s"$work/ckpt",
      isTarget = col("lang") === "en", nBuckets = 64)
    val rows = Seq(
      (1L, "en", "alpha beta gamma alpha"),
      (2L, "de", "delta epsilon beta"),
      (3L, "en", "alpha zeta zeta"),
      (4L, "de", "gamma gamma eta theta"))
    try {
      in.addData(rows(0), rows(1))
      q.processAllAvailable()
      in.addData(rows(2), rows(3))
      q.processAllAvailable()
    } finally q.stop()

    val inc = spark.read.parquet(s"$work/out").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(inc.keySet == Set(1L, 2L, 3L, 4L))
    // the batch door over the full corpus, same buckets
    val full = graft.operators.Dsir.importanceWeightsWhen(
        rows.toDF("doc_id", "lang", "text"), col("lang") === "en",
        nBuckets = 64)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // last batch (docs 3, 4): model-as-of-arrival IS the full model
    assert(inc(3L) == full(3L), s"doc3 inc=${inc(3L)} full=${full(3L)}")
    assert(inc(4L) == full(4L), s"doc4 inc=${inc(4L)} full=${full(4L)}")
    // n_tokens agree everywhere (model-independent)
    inc.foreach { case (id, (n, _)) => assert(n == full(id)._1) }
    // the early batch was weighed under a SMALLER model — the
    // documented deviation (doc 1 saw only batch-1 counts)
    assert(inc(1L)._2 != full(1L)._2,
      "early-batch weights reflect the model as of arrival, " +
        "not the final model")
  }

  test("replayed batch cannot inflate the count store (batch-keyed " +
    "max-collapse); nBuckets = 0 is refused") {
    val work = tmp()
    val b = Seq((1L, "en", "alpha alpha beta")).toDF("doc_id", "lang", "text")
    IncrementalDsir.processBatch(spark, b, 0L, s"$work/store",
      s"$work/out", col("lang") === "en", "text", "doc_id", nBuckets = 64)
    // replay batch 0 (at-least-once): identical rows re-append
    IncrementalDsir.processBatch(spark, b, 0L, s"$work/store",
      s"$work/out", col("lang") === "en", "text", "doc_id", nBuckets = 64)
    // a new batch weighed now must see c_r(alpha-bucket) = 2, not 4
    IncrementalDsir.processBatch(spark,
      Seq((2L, "de", "alpha")).toDF("doc_id", "lang", "text"),
      1L, s"$work/store", s"$work/out",
      col("lang") === "en", "text", "doc_id", nBuckets = 64)
    val w2 = spark.read.parquet(s"$work/out")
      .filter(col("doc_id") === 2L).collect().head.getLong(2)
    // replicate by hand: counts alpha=3 (2+1), beta=1; targets 2/1;
    // doc2 = 1 token of alpha-bucket
    val expect = graft.operators.Dsir.importanceWeightsWhen(
        Seq((1L, "en", "alpha alpha beta"), (2L, "de", "alpha"))
          .toDF("doc_id", "lang", "text"),
        col("lang") === "en", nBuckets = 64)
      .filter(col("doc_id") === 2L).collect().head.getLong(2)
    assert(w2 == expect,
      s"replay inflated the model: got $w2, uninflated law says $expect")
    intercept[IllegalArgumentException] {
      IncrementalDsir.processBatch(spark, b, 9L, s"$work/store",
        s"$work/out", col("lang") === "en", "text", "doc_id", nBuckets = 0)
    }
  }
}
