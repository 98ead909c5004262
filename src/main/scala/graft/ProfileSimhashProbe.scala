package graft

import org.apache.spark.sql.functions._

import graft.expressions.TextSignatures
import graft.operators.Dedup

/** Adjudicates MULTIPROBE banding for the shipped q12 defaults (the
  * round-16 verdict's task 4): `probeBits = 1` landed opt-in with a
  * known 17× one-side band-frame cost and a known recall win on the
  * hamming-4/5 pigeonhole pairs — this harness turns "known cure"
  * prose into the decision numbers.
  *
  * `runMain graft.ProfileSimhashProbe <sfDir> [maxHamming]`
  * prints, for probeBits 0 and 1 at the shipped maxHamming: wall
  * time (best of two — first run pays codegen), candidate-pair
  * count (the fan-out cost the probe side actually adds), pair
  * count at the threshold, and recall against the exact all-pairs
  * word-3-gram Jaccard ≥ 0.7 truth (the QUALITY.json protocol —
  * affordable because the documents fixture is 500 rows at every
  * SF). */
object ProfileSimhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val maxHamming = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus.toInt)
    val docs = Tables(spark, sfDir).documents

    // exact truth, the Quality protocol
    val sh = docs.select(col("doc_id").as("id"),
      array_distinct(TextSignatures.shingles(col("text"), 3)).as("sh"))
    val truth = sh.as("a").join(sh.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh"))).cast("double")).as("j"))
      .filter(col("j") >= 0.7)
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    for (probeBits <- Seq(0, 1)) {
      var best = Double.MaxValue
      var pairs = Set.empty[(Long, Long)]
      for (_ <- 0 until 2) {
        val t0 = System.nanoTime()
        pairs = Dedup.simHashDup(docs, "text", "doc_id",
            maxHamming = maxHamming, probeBits = probeBits)
          .select(col("id_a").cast("long"), col("id_b").cast("long"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      // candidate volume BEFORE the hamming filter: the number the
      // probe explode actually multiplies (measured, not the 17×
      // worst case) — maxHamming 64 disables the filter
      val cands = Dedup.simHashDup(docs, "text", "doc_id",
        maxHamming = 64, probeBits = probeBits).count()
      val recall =
        if (truth.isEmpty) 1.0
        else pairs.intersect(truth).size.toDouble / truth.size
      println(f"""{"probe_bits":$probeBits,"sec":$best%.3f,""" +
        f""""candidates":$cands,"pairs":${pairs.size},""" +
        f""""truth":${truth.size},"recall":$recall%.4f,""" +
        f""""max_hamming":$maxHamming,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
