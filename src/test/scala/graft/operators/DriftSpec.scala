package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Histogram drift audit (q85): integer-exact share comparison. */
class DriftSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketShift: hand-built shares land exactly on the threshold arithmetic") {
    // A: 100 rows, bucket 1 = 50%; B: 50 rows, bucket 1 = 60% -> 10% shift
    val a = ((1 to 50).map(_ => 1) ++ (1 to 50).map(_ => 2)).toDF("v")
    val b = ((1 to 30).map(_ => 1) ++ (1 to 20).map(_ => 2)).toDF("v")
    // threshold 1/10: |50/100 - 30/50| = 0.10 is NOT strictly above
    val at = Drift.bucketShift(a, b, $"v", num = 1, denom = 10)
      .as[(Int, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(at.toSeq == Seq((1, 50L, 30L, false), (2, 50L, 20L, false)))
    // threshold 1/11: 0.10 > 1/11 -> both buckets drift (shares mirror)
    val over = Drift.bucketShift(a, b, $"v", num = 1, denom = 11)
      .as[(Int, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(over.forall(_._4), s"expected drift at 1/11: ${over.toSeq}")
  }

  test("bucketShift: buckets on one side only appear with a zero count") {
    val a = Seq(1, 1, 2).toDF("v")
    val b = Seq(2, 3).toDF("v")
    val out = Drift.bucketShift(a, b, $"v")
      .as[(Int, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1, 2L, 0L), (2, 1L, 1L), (3, 0L, 1L)))
    // a bucket present on one side with 2/3 share is a drift at 1%
    assert(out.head._4 && out.last._4)
  }

  test("streaming: per-batch drift reports against a static reference via foreachBatch") {
    // the monitoring shape: a static reference histogram audited
    // against every micro-batch — drift flags arrive per batch id
    implicit val sc = spark.sqlContext
    val ref = Seq(1, 1, 2, 2).toDF("v") // reference: 50/50
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
    val reports = scala.collection.mutable.ArrayBuffer[(Long, Int, Boolean)]()
    val q = in.toDF().toDF("v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        Drift.bucketShift(ref, batch, col("v"), num = 1, denom = 10)
          .collect().foreach(r =>
            reports.synchronized {
              reports += ((id, r.getInt(0), r.getBoolean(3)))
            })
      }
      .start()
    in.addData(1, 1, 1, 1, 2) // 80/20 vs 50/50 -> both buckets drift
    q.processAllAvailable()
    in.addData(1, 1, 2, 2)    // exactly the reference mix -> no drift
    q.processAllAvailable(); q.stop()
    val byBatch = reports.groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    assert(byBatch(0L) == Map(1 -> true, 2 -> true), s"batch 0: ${byBatch(0L)}")
    assert(byBatch(1L) == Map(1 -> false, 2 -> false), s"batch 1: ${byBatch(1L)}")
  }

  test("bucketShift: identical frames never drift; empty side refused") {
    val a = Seq(1, 2, 2, 3).toDF("v")
    val out = Drift.bucketShift(a, a, $"v").as[(Int, Long, Long, Boolean)].collect()
    assert(out.forall(r => r._2 == r._3 && !r._4))
    intercept[IllegalArgumentException] {
      Drift.bucketShift(a, a.limit(0), $"v")
    }
  }
}
