package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` embedding columns.
  *
  * Built from codegen'd higher-order functions (`zip_with` +
  * `aggregate`), not UDFs, so Catalyst keeps the whole pipeline in
  * whole-stage codegen and the scan stays columnar.
  *
  * Numerics contract: every element is cast to double BEFORE any
  * arithmetic and folds run sequentially left-to-right — this makes the
  * result bit-identical to a reference double-precision sequential loop
  * (and to DuckDB's `list_cosine_similarity(CAST(x AS DOUBLE[]), …)`),
  * which is what the correctness oracle hashes.
  */
object Vectors {

  /** Sequential-fold dot product in double precision (native expression;
    * bit-identical to [[hofDot]] and to the DuckDB oracle). */
  def dot(a: Column, b: Column): Column =
    graft.expressions.VectorOps.arrayDot(a, b)

  /** HOF formulation of [[dot]] — kept as the portable reference
    * implementation (tests assert it matches the native one). */
  def hofDot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2 norm, double. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity = dot/(|a|*|b|), double. Zero-norm vectors
    * (padding / failed encodes) score 0.0 — the raw division would be
    * 0/0 = NaN, which Spark's descending sort ranks ABOVE every finite
    * score, so one all-zero corpus row would top every query's
    * neighbors. Nonzero inputs take the identical single division
    * (oracle parity is untouched). */
  def cosine(a: Column, b: Column): Column =
    cosineWithNorms(dot(a, b), norm(a), norm(b))

  /** Cosine given precomputed norms (per-row, so an N×Q similarity join
    * computes each norm once instead of per pair); zero-norm-safe. */
  def cosineWithNorms(dotAb: Column, normA: Column, normB: Column): Column = {
    val p = normA * normB
    when(p === 0.0, lit(0.0)).otherwise(dotAb / p)
  }

  /** Euclidean distance, double. */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, v) => acc + v))

  /** Symmetric int8 quantization: struct(q: array<tinyint>, scale:
    * double) with x ≈ q * scale, scale = max|x|/127. Cuts embedding
    * storage and ANN shuffle bytes 4× vs float32; pair with
    * [[dotQuantized]] for the candidate-scoring pass and re-rank the
    * top candidates with exact [[dot]]. */
  def quantizeInt8(v: Column): Column = {
    val scale = greatest(array_max(transform(v, x => abs(x.cast("double")))), lit(1e-30)) / lit(127.0)
    struct(
      transform(v, x => round(x.cast("double") / scale).cast("byte")).as("q"),
      scale.as("scale"))
  }

  /** Approximate dot product of two int8-quantized vectors. */
  def dotQuantized(a: Column, b: Column): Column =
    graft.expressions.VectorOps.arrayDot(
      a.getField("q"), b.getField("q")) * a.getField("scale") * b.getField("scale")

  /** Sign-random-projection (SimHash-for-vectors) LSH bucket id.
    *
    * `planes` pseudo-random hyperplanes are derived deterministically
    * from (planeIdx, dim) via a 64-bit avalanche hash — no stored model,
    * so every executor computes identical planes with zero shuffle.
    * Returns a long whose bit j is sign(v · plane_j).
    *
    * Evaluated by the native [[graft.expressions.RpBands]] (one
    * traversal, cached plane weights); [[hofRpBucket]] is the portable
    * HOF reference the spec pins it against. */
  def rpBucket(v: Column, numPlanes: Int, seed: Long = 42L): Column =
    element_at(rpBands(v, numPlanes, bands = 1, seed), 1)

  /** `bands` independent sign-RP band keys (band b uses seed+b) in one
    * native pass — the blocking signature for banded vector LSH
    * (operators.Dedup.embeddingNearDup). */
  def rpBands(v: Column, numPlanes: Int, bands: Int, seed: Long = 42L): Column =
    graft.expressions.RpBands.rpBands(v, numPlanes, bands, seed)

  /** HOF reference formulation of [[rpBucket]] — kept (like [[hofDot]])
    * as the executable spec of the hash/weight/fold semantics. */
  def hofRpBucket(v: Column, numPlanes: Int, seed: Long = 42L): Column = {
    require(numPlanes <= 63, "bucket fits in one long")
    val bits = (0 until numPlanes).map { j =>
      // plane_j[i] = centered hash in [-0.5, 0.5), derived from (seed,j,i)
      val proj = aggregate(
        transform(v, (x, i) => {
          val h = xxhash64(lit(seed), lit(j), i)
          x.cast("double") * (pmod(h, lit(100000L)).cast("double") / lit(100000.0) - lit(0.5))
        }),
        lit(0.0),
        (acc, x) => acc + x)
      when(proj > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }
}
