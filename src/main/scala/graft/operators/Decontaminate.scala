package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.expressions.{BloomOps, TextSignatures}

/** Benchmark decontamination beyond broadcast reach.
  *
  * q54's form (corpus shingles ⋈ broadcast bench-shingle table) is the
  * right plan while the eval suite is small. When the eval corpus
  * grows past the broadcast threshold, the join either flips to a
  * corpus-wide shuffle (the thing decontamination must never do) or
  * OOMs the build side. This variant compresses the bench-shingle SET
  * into a bloom filter: fixed `m` bits at false-positive rate `eps`,
  * carried as a literal model parameter in a native probe expression —
  * the corpus still scans exactly once, still no shuffle of it, and
  * the memory bound is `m/8` bytes regardless of eval-set cardinality
  * (~1.2 MB per million shingles at eps=0.01; size `eps` to taste for
  * suites up to ~10⁷ shingles, beyond which ship the bits as a
  * broadcast variable instead of a literal).
  *
  * One-sided error, safe direction: every truly shared shingle is
  * flagged (bloom guarantees no false negatives — spec-pinned against
  * the exact q54 join); `eps` of clean shingles over-flag, which for
  * hygiene filtering means at worst dropping an extra `eps` of clean
  * docs, never keeping a contaminated one.
  */
object Decontaminate {

  /** Build the bench-shingle bloom once: two tiny jobs over the BENCH
    * side only — size the filter, then the OR-fold aggregate (map-side
    * combinable; the shuffle carries one m-bit array per map task,
    * never the shingles). Returns (bits, k) — the reusable model a
    * batch probe inlines or a streaming probe holds across
    * micro-batches. */
  def bloomBits(bench: DataFrame, textCol: String, n: Int = 3,
                eps: Double = 0.01): (Array[Long], Int) = {
    val benchSh = bench.select(explode(array_distinct(
        TextSignatures.shingles(col(textCol), n))).as("sh"))
      .distinct()
    val nItems = math.max(1L, benchSh.count())
    val mBits = BloomOps.sizeFor(nItems, eps)
    val k = BloomOps.hashesFor(nItems, mBits)
    val bits = benchSh.agg(BloomOps.bloomAgg(col("sh"), mBits, k).as("b"))
      .head.getSeq[Long](0).toArray
    (bits, k)
  }

  /** THE shingle→probe→count pipeline both probe variants share. */
  private def hitsPipeline(corpus: DataFrame, textCol: String,
                           idCol: String, n: Int,
                           probeFilter: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame =
    corpus.select(col(idCol), explode(array_distinct(
        TextSignatures.shingles(col(textCol), n))).as("sh"))
      .filter(probeFilter(col("sh")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))

  /** Per-doc count of corpus shingles that (might) hit the bench set.
    * Returns (idCol, n_hits); `n_hits ≥` the exact join's count for
    * every doc, and every doc the exact join flags appears here. */
  def bloomHits(corpus: DataFrame, bench: DataFrame, textCol: String,
                idCol: String, n: Int = 3, eps: Double = 0.01): DataFrame = {
    val (bits, k) = bloomBits(bench, textCol, n, eps)
    hitsPipeline(corpus, textCol, idCol, n,
      BloomOps.mightContain(_, bits, k))
  }

  /** [[bloomHits]] with the bits shipped as a BROADCAST VARIABLE
    * instead of an expression literal — the large-eval-set escape
    * hatch (SCALING debt #6, now closed): a literal's words serialize
    * into every task closure, so a 128 MB filter would re-ship with
    * each task; the broadcast handle ships bytes-per-executor once.
    * Identical answers to [[bloomHits]] for the same (bench, n, eps) —
    * same build, same probe kernel — pinned by DecontaminateSpec.
    *
    * Broadcast lifecycle: the variable must outlive every action on
    * the returned (lazy) frame, so this convenience form leaves it
    * alive for the session; for a long-lived session publishing many
    * filters, build the bits once, broadcast them yourself, probe via
    * [[bloomHitsWith]], and `destroy()` after the final action. */
  def bloomHitsBroadcast(corpus: DataFrame, bench: DataFrame,
                         textCol: String, idCol: String, n: Int = 3,
                         eps: Double = 0.01): DataFrame = {
    val (bits, k) = bloomBits(bench, textCol, n, eps)
    val bcast = corpus.sparkSession.sparkContext.broadcast(bits)
    bloomHitsWith(corpus, bcast, k, textCol, idCol, n)
  }

  /** Probe against caller-managed broadcast bits (lifecycle stays with
    * the caller — see [[bloomHitsBroadcast]]). */
  def bloomHitsWith(corpus: DataFrame,
                    bits: org.apache.spark.broadcast.Broadcast[Array[Long]],
                    k: Int, textCol: String, idCol: String,
                    n: Int = 3): DataFrame =
    hitsPipeline(corpus, textCol, idCol, n,
      BloomOps.mightContainBroadcast(_, bits, k))

  /** Streaming-safe contamination flag: adds boolean `contaminated`
    * (any shingle bloom-hits the prebuilt bench bits). A STATELESS
    * row-local projection — no shuffle, no state store, no watermark —
    * so it drops into any `readStream` pipeline as ingest-time
    * hygiene; build the bits once with [[bloomBits]] before starting
    * the stream. One-sided like the batch form: a truly contaminated
    * doc always flags. */
  def flagContaminated(docs: DataFrame, textCol: String,
                       bits: Array[Long], k: Int, n: Int = 3): DataFrame =
    // no array_distinct: exists short-circuits on the first hit and
    // duplicates cannot change the answer — dedup would be pure
    // per-row overhead on the ingest hot path. coalesce: a null text
    // has no shingles to share, so it is CLEAN (false), matching the
    // batch form (zero hits), not a three-valued column.
    docs.withColumn("contaminated",
      coalesce(
        exists(TextSignatures.shingles(col(textCol), n),
          sh => BloomOps.mightContain(sh, bits, k)),
        lit(false)))
}
