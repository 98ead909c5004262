package graft.operators

import graft.{SparkTestBase, Tables}

/** Per-label centroid outlier QC (q84): integer-exact fixed-point
  * distances, cross-multiplied outlier flag. */
class EmbeddingQCSpec extends SparkTestBase {
  import spark.implicits._

  test("a planted far vector is the outlier; tight cluster is not") {
    val tight = Seq.fill(9)(Array(0.1f, 0.2f, 0.3f))
    val far = Array(0.9f, -0.9f, 0.9f)
    val emb = (tight :+ far).zipWithIndex
      .map { case (v, i) => (i.toLong, v, "A") }
      .toDF("vec_id", "embedding", "label")
    val out = EmbeddingQC.centroidOutliers(emb)
      .as[(Long, String, Long, Boolean)].collect().sortBy(_._1)
    assert(out.length == 10)
    assert(out.count(_._4) == 1 && out.last._1 == 9L && out.last._4,
      s"expected only the planted vector flagged: ${out.toSeq}")
    // tight members share one dist2 (identical vectors, same label)
    assert(out.dropRight(1).map(_._3).distinct.length == 1)
  }

  test("identical vectors: zero distances, nobody an outlier (strict inequality)") {
    val emb = (0 until 5).map(i => (i.toLong, Array(0.5f, -0.25f), "B"))
      .toDF("vec_id", "embedding", "label")
    val out = EmbeddingQC.centroidOutliers(emb)
      .as[(Long, String, Long, Boolean)].collect()
    assert(out.forall(r => r._3 == 0L && !r._4))
  }

  test("a label past the int64-exact bound raises instead of silently wrapping") {
    // at scale=10^9 the safe per-label bound is 0 for any dim >= 2,
    // so the guard must fire on the very first label group
    val emb = (0 until 5).map(i => (i.toLong, Array(0.5f, -0.25f), "C"))
      .toDF("vec_id", "embedding", "label")
    val e = intercept[Exception] {
      EmbeddingQC.centroidOutliers(emb, scale = 1000000000).collect()
    }
    assert(e.getMessage.contains("int64-exact bound"),
      s"expected the loud guard, got: ${e.getMessage}")
  }

  test("dist2 matches a driver-side exact recomputation on the fixture") {
    val emb = Tables(spark, sf).embeddings
    val got = EmbeddingQC.centroidOutliers(emb)
      .as[(Long, String, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val rows = emb.as[(Long, Array[Float], String)].collect()
    val byLabel = rows.groupBy(_._3)
    val want = byLabel.flatMap { case (label, vs) =>
      val sv = vs.map { case (id, v, _) =>
        id -> v.map(x => math.floor(x.toDouble * 1000).toLong)
      }
      val n = vs.length.toLong
      val dim = sv.head._2.length
      val s = Array.tabulate(dim)(i => sv.map(_._2(i)).sum)
      val d2 = sv.map { case (id, x) =>
        id -> (0 until dim).map { i =>
          val diff = n * x(i) - s(i); diff * diff
        }.sum
      }
      val tot = d2.map(_._2).sum
      d2.map { case (id, d) => (id, label) -> ((d, d * n > 4L * tot)) }.toSeq
    }.toMap
    assert(got == want)
    // labels are distinguishable: at least one label has an outlier
    assert(got.values.exists(_._2) || want.values.forall(!_._2))
  }
}
