package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift audit between two corpus states — the QC step
  * that answers "what did my filter / new crawl / re-curation do to
  * the data distribution?" (the per-feature histogram comparison that
  * data-validation layers run on every pipeline iteration; the PSI /
  * chi-square family reduced to its integer-exact core).
  *
  * Everything is exact BIGINT arithmetic so the audit value-oracles:
  * per-bucket counts on both sides, and a drift flag from the
  * cross-multiplied share difference — `|c_a/n_a − c_b/n_b| >
  * num/denom` tested as `|c_a·n_b − c_b·n_a| · denom > num · n_a·n_b`
  * with no float division anywhere.
  *
  * Scale shape: one map-side-combinable count per side keyed by the
  * (small) bucket domain, a full outer join over |buckets| rows, and
  * two scalar totals — output is O(buckets) no matter the corpus
  * size, the shuffles carry bucket keys only.
  */
object Drift {

  /** Per-bucket counts of `bucket` in A vs B plus a drift flag:
    * (bucket, cnt_a, cnt_b, drifted) — `drifted` iff the bucket's
    * SHARE differs by strictly more than `num/denom` between sides.
    * Overflow bound: `c·n` products need c·n < 2^63 / denom — holds
    * to ~10^9 rows per side at denom 100; past that, pre-divide the
    * counts (the shares, not the verdicts, lose precision). */
  def bucketShift(a: DataFrame, b: DataFrame, bucket: Column,
                  num: Long = 1, denom: Long = 100): DataFrame = {
    require(num > 0 && denom > num, s"need 0 < num < denom, got $num/$denom")
    val ca = a.select(bucket.as("bucket")).groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt_a"))
    val cb = b.select(bucket.as("bucket")).groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt_b"))
    val joined = ca.join(cb, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
    val na = a.count()
    val nb = b.count()
    require(na > 0 && nb > 0, s"both sides need rows, got a=$na b=$nb")
    joined.select(col("bucket"), col("cnt_a"), col("cnt_b"),
      (abs(col("cnt_a") * nb - col("cnt_b") * na) * denom >
        lit(num) * na * nb).as("drifted"))
  }
}
