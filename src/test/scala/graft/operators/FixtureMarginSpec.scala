package graft.operators

import graft.{SparkTestBase, Tables}

/** q66's value oracle compares Spark and DuckDB on decisions made AT
  * floating-point boundaries: a pair is in iff cos >= 0.35, and the
  * survivor is a per-cluster cent_cos argmax. Both engines compute the
  * cosines as sequential double folds, so the values agree to the last
  * ulp on one platform — but a different platform/libm can drift a
  * final sqrt by an ulp, and a fixture cosine sitting ON the boundary
  * would then flip pair membership (or the survivor) and fail the
  * oracle even though both answers are "right". This spec pins the
  * FIXTURE property that makes that impossible: every within-cell
  * cosine clears the threshold by >= 1e-5 and every multi-member
  * cluster's argmax wins by >= 1e-4 — boundary drift now fails HERE,
  * as a fixture problem, not in CORRECTNESS as a phantom engine bug.
  * (Measured at round 7 on sf0.01: min |cos-0.35| = 1.10e-4, min
  * top1-top2 cent_cos gap = 2.67e-3 over 63 multi-member clusters.)
  *
  * Computed locally in plain Scala (500 embedding rows) with the same
  * sequential-fold arithmetic as `Vectors.dot`/`Vectors.norm`, at the
  * driver's oracle gate SF (sf0.01), independent of either engine.
  */
class FixtureMarginSpec extends SparkTestBase {

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def cos(a: Array[Double], b: Array[Double]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  test("q66 fixture: sf0.01 cosines clear the 0.35 threshold and the survivor argmax by safe margins") {
    val rows = Tables(spark, "/root/testdata/sf0.01").embeddings
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Any](1).map(_.asInstanceOf[Number].doubleValue).toArray)
      .sortBy(_._1)
    val vecs = rows.toMap
    val cents = rows.filter(_._1 < 4) // q66's fixed data-defined centroids

    // nearest-centroid assignment: squared L2, ties to the lower cell id
    // (the NearestCentroids expression's contract)
    val cell = rows.map { case (id, v) =>
      id -> cents.minBy { case (cid, cv) =>
        (v.zip(cv).map(p => (p._1 - p._2) * (p._1 - p._2)).sum, cid)
      }._1
    }.toMap

    // within-cell pair cosines — margin from the 0.35 pair threshold
    val ids = rows.map(_._1)
    val pairs = for {
      a <- ids; b <- ids
      if a < b && cell(a) == cell(b)
    } yield (a, b, cos(vecs(a), vecs(b)))
    val minMargin = pairs.map(p => math.abs(p._3 - 0.35)).min
    info(f"min |cos - 0.35| over ${pairs.length} within-cell pairs: $minMargin%.3e")
    assert(minMargin >= 1e-5,
      f"a fixture cosine sits $minMargin%.3e from the 0.35 threshold — " +
        "regenerate or re-threshold before trusting the q66 oracle cross-platform")

    // transitive clusters over pairs >= 0.35 (tiny union-find), then the
    // per-cluster cent_cos argmax gap
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.filter(_._3 >= 0.35).foreach { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val centCos = ids.map(i => i -> cos(vecs(i), cents.toMap.apply(cell(i)))).toMap
    val gaps = ids.groupBy(find).values.filter(_.length > 1).map { members =>
      val sorted = members.map(centCos).sorted(Ordering[Double].reverse)
      sorted(0) - sorted(1)
    }
    assert(gaps.nonEmpty, "fixture no longer produces multi-member clusters")
    val minGap = gaps.min
    info(f"min top1-top2 cent_cos gap over ${gaps.size} multi-member clusters: $minGap%.3e")
    assert(minGap >= 1e-4,
      f"a cluster's survivor argmax is decided by $minGap%.3e — near-tie " +
        "could flip the q66 survivor across platforms; regenerate the fixture")
  }
}
