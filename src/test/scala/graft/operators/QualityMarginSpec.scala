package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Round-16 verdict task 6 (updated round 17 for the adopted
  * multiprobe): q12's QUALITY floor passed with thin headroom, so an
  * innocuous fixture or banding change could flip the driver gate
  * red without a real regression. This spec pins the MARGIN
  * STRUCTURE at the driver's quality-gate SF (sf0.01, the
  * FixtureMarginSpec convention): how many additional pair-misses the
  * floor tolerates, and that no counted pair sits ON the hamming
  * decision boundary where one bit of signature drift flips it.
  * Candidacy is the PROBED form q12 now ships (probeBits = 1: a pair
  * is a candidate when some 16-bit quarter differs by <= 1 bit);
  * the floor is the raised 0.90. Fixture drift now fails HERE —
  * named as a fixture/margin problem — instead of flapping
  * QUALITY.json. */
class QualityMarginSpec extends SparkTestBase {

  private val MaxH = 10      // the shipped q12/Quality maxHamming
  private val Floor = 0.90   // raised with the probeBits=1 adoption

  test("q12 margin at sf0.01: the 0.90 floor survives >=2 extra " +
    "misses and all boundary-hamming losses") {
    val docs = Tables(spark, "/root/testdata/sf0.01").documents
    // exact truth — Quality.jaccardTruth's definition, replicated
    val sh = docs.select(col("doc_id").as("id"),
      array_distinct(graft.expressions.TextSignatures
        .shingles(col("text"), 3)).as("sh"))
    val truth = sh.as("a").join(sh.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh"))).cast("double"))
          .as("j"))
      .filter(col("j") >= 0.7)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "quality fixture lost its near-dup pairs")

    // per-truth-pair simhash geometry: hamming distance + band sharing
    val sigs = docs.select(col("doc_id"),
        graft.expressions.TextSignatures.simHashSig(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long): Int =
      java.lang.Long.bitCount(a ^ b)
    // probed candidacy (probeBits = 1): some quarter differs by <= 1
    // bit — the one-bit flip on the probe side reaches it
    def sharesProbedBand(a: Long, b: Long): Boolean =
      (0 until 4).exists { q =>
        java.lang.Long.bitCount(
          ((a >>> (q * 16)) & 0xFFFFL) ^ ((b >>> (q * 16)) & 0xFFFFL)) <= 1
      }
    val counted = truth.filter { case (a, b) =>
      sharesProbedBand(sigs(a), sigs(b)) && hamming(sigs(a), sigs(b)) <= MaxH
    }
    truth.diff(counted).toSeq.sortBy(identity).foreach { case (a, b) =>
      info(s"missed pair ($a,$b): hamming ${hamming(sigs(a), sigs(b))}, " +
        s"sharesProbedBand ${sharesProbedBand(sigs(a), sigs(b))}")
    }
    val recall = counted.size.toDouble / truth.size
    info(f"truth pairs ${truth.size}, counted ${counted.size}, " +
      f"recall $recall%.3f vs floor $Floor%.2f")
    assert(recall >= Floor, "the QUALITY gate itself would be red")

    // margin pin 1: >=2 additional misses before the floor breaks —
    // a single borderline pair can never flip the driver gate
    val slack = counted.size - math.ceil(Floor * truth.size).toInt
    info(s"pair slack above the floor: $slack")
    assert(slack >= 2,
      s"only $slack pair(s) of slack above the $Floor floor — the gate " +
        "flips on one borderline pair; regenerate the fixture or " +
        "retune the door")

    // margin pin 2: even if EVERY counted pair sitting on the hamming
    // boundary (== MaxH, one bit of drift from exclusion) were lost, the
    // floor still holds — recall can't flip from signature-level
    // drift alone
    val boundary = counted.count { case (a, b) =>
      hamming(sigs(a), sigs(b)) == MaxH
    }
    val worstCase = (counted.size - boundary).toDouble / truth.size
    info(f"boundary(hamming=$MaxH%d) counted pairs: $boundary, " +
      f"worst-case recall $worstCase%.3f")
    assert(worstCase >= Floor,
      f"losing the $boundary boundary pair(s) breaches the floor " +
        f"($worstCase%.3f < $Floor%.2f) — the gate is one ulp of " +
        "hashing drift from red")
  }
}
