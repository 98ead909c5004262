package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quality control: per-label centroid outlier scoring — the
  * screening step a pretraining pipeline runs before trusting an
  * embedding column for semantic dedup / ANN indexing (corrupt rows,
  * mislabeled vectors, encoder failures all show up as far-from-
  * centroid points; cf. the SemDeDup-family pruning literature, which
  * ranks points by distance-to-centroid the same way).
  *
  * INTEGER-EXACT formulation so the whole operator value-oracles:
  * elements are fixed-point quantized (`floor(v·scale)` — floor, not
  * round: round's half-even/half-up disagreement across engines is a
  * parity hazard; floor is unambiguous), the centroid is carried as
  * the per-label element SUM vector `S` (never a float mean), and the
  * squared distance to the mean is computed scaled by n²:
  * `dist2 = Σ_i (n·x_i − S_i)²` — exact BIGINT arithmetic, identical
  * in any evaluation order. A vector is an outlier iff its dist2 is
  * strictly above `factor`× the label mean dist2, tested as the
  * cross-multiplication `dist2 · n > factor · Σ dist2`.
  *
  * Scale shape: ONE shuffle of exploded (label, i, x) elements for the
  * sum vectors — map-side combinable down to |labels|·dim rows per map
  * task; the sum table (|labels| rows after re-packing) broadcasts
  * back (AQE decides), and the distance is a per-row `zip_with` fold —
  * no second explode, no window.
  *
  * Exactness bound: dist2 = Σ_i (n·x_i − S_i)² must fit int64, and
  * |n·x_i − S_i| ≤ 2·n·scale (for |v| ≤ 1), so the per-label row
  * count is bounded by n ≤ √(2⁶² / (4·scale²·dim)) — ≈ 1.3·10⁵ at
  * scale=1000, dim=64, growing as 1/scale. This is the ORACLE-GRADE
  * formulation: verification-exact where a float mean is not. Past
  * the bound, lower `scale` (a coarser fixed-point grid, same
  * semantics) — and the plan GUARDS the bound at runtime with an
  * in-plan `raise_error` on any label exceeding it, so a silent
  * int64 wrap cannot mislabel outliers.
  */
object EmbeddingQC {

  /** (idCol, labelCol, dist2, outlier) — one row per input vector;
    * `dist2` the n²-scaled fixed-point squared distance to the label
    * centroid, `outlier` = dist2 strictly above factor× label mean. */
  def centroidOutliers(emb: DataFrame, vecCol: String = "embedding",
                       idCol: String = "vec_id", labelCol: String = "label",
                       scale: Int = 1000, factor: Int = 4): DataFrame = {
    require(scale > 0 && factor > 0, s"need scale/factor > 0, got $scale/$factor")
    val scaled = emb.select(col(idCol), col(labelCol),
      transform(col(vecCol), v => floor(v.cast("double") * scale)).as("sv"))
    // per-label element sums: the one corpus shuffle, map-side combined
    val sums = scaled
      .select(col(labelCol), posexplode(col("sv")).as(Seq("i", "x")))
      .groupBy(col(labelCol), col("i"))
      .agg(sum(col("x")).as("s"), count(lit(1)).as("nl"))
      .groupBy(col(labelCol))
      .agg(
        transform(array_sort(collect_list(struct(col("i"), col("s")))),
          x => x.getField("s")).as("sarr"),
        max(col("nl")).as("nl"))
    // int64-exactness guard: 4·n²·scale²·dim ≤ 2⁶² (see scaladoc) —
    // raise loudly instead of wrapping silently under non-ANSI eval
    val maxSafeN = floor(sqrt(lit(4.611686018427388e18) /
      (lit(4.0 * scale.toDouble * scale.toDouble) * size(col("sarr")).cast("double"))))
    val dist = scaled.join(sums, Seq(labelCol))
      .select(col(idCol), col(labelCol),
        when(col("nl") > maxSafeN, raise_error(concat(
          lit(s"EmbeddingQC: label group exceeds the int64-exact bound at scale=$scale ("),
          col("nl"), lit(" rows > "), maxSafeN,
          lit(") — lower scale for a coarser exact grid"))))
          .otherwise(
            aggregate(
              zip_with(col("sv"), col("sarr"),
                (x, sm) => (col("nl") * x - sm) * (col("nl") * x - sm)),
              lit(0L), (acc, v) => acc + v)).as("dist2"))
    val tot = dist.groupBy(col(labelCol))
      .agg(sum(col("dist2")).as("tot"), count(lit(1)).as("n"))
    dist.join(tot, Seq(labelCol))
      .select(col(idCol), col(labelCol), col("dist2"),
        (col("dist2") * col("n") > lit(factor.toLong) * col("tot")).as("outlier"))
  }
}
