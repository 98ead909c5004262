package graft.expressions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** KLL quantile sketches (Karnin, Lang & Liberty 2016, "Optimal
  * Quantile Approximation in Streams" — public paper; implementation
  * from Apache DataSketches, on Spark's own classpath): a mergeable
  * summary answering "what value sits at rank q" within a normalized
  * rank error of ~1.65% at the default k=200, in ~O(k·log n) bytes.
  *
  * The manifest role mirrors the HLL distinct sketch
  * (graft.sinks.Sinks shardSummary `zhll_*`): DISTINCT was the one
  * aggregate per-shard scalars cannot make exact; QUANTILES are the
  * one DISTRIBUTION question they cannot answer at all — min/max/sum
  * say nothing about a median. A per-shard KLL published as
  * `zkll_<col>` makes "p50/p95/p99 doc length of this corpus — or any
  * retained generation" a manifest read: KLL merge is error-preserving
  * across any merge tree (Agarwal et al. 2013, "Mergeable Summaries"),
  * so the union of shard sketches carries the same rank-error bound
  * as one sketch over the whole corpus.
  *
  * Unlike HLL, KLL compaction flips random coins: two publishes of the
  * same rows can serialize different bytes and answer ±ε apart. That
  * is the documented trade (rank error is bounded either way) — the
  * quantile doors are floored in QUALITY.json, not value-oracled.
  *
  * Nulls and NaNs are skipped (a missing length is not a length —
  * the same totality stance as min/max zone stats, which a quantile
  * generalizes). */
object KllOps {
  /** Fixed k (not a knob) so sketches from every generation merge
    * with one accuracy contract; 200 ≈ 1.6% rank error, <1 KB/shard
    * at corpus-shard row counts. */
  val K = 200

  def quantile(bytes: Array[Byte], rank: Double): Double = {
    val s = KllDoublesSketch.heapify(Memory.wrap(bytes))
    s.getQuantile(rank, QuantileSearchCriteria.INCLUSIVE)
  }

  def rank(bytes: Array[Byte], value: Double): Double = {
    val s = KllDoublesSketch.heapify(Memory.wrap(bytes))
    s.getRank(value, QuantileSearchCriteria.INCLUSIVE)
  }
}

/** `kll_sketch_agg(x)` — aggregate a DOUBLE column into a serialized
  * KLL quantile sketch (binary). Empty input → empty sketch bytes
  * (quantile reads on it throw loudly downstream — an empty corpus
  * has no median). */
case class KllSketchAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"kll_sketch_agg needs a DOUBLE input, got " +
          s"${child.dataType.sql} — cast it")
    else TypeCheckResult.TypeCheckSuccess
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_sketch_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(KllOps.K)

  override def update(b: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (!java.lang.Double.isNaN(d)) b.update(d)
    }
    b
  }

  override def merge(b: KllDoublesSketch, o: KllDoublesSketch): KllDoublesSketch = {
    b.merge(o); b
  }

  override def eval(b: KllDoublesSketch): Any = b.toByteArray

  override def serialize(b: KllDoublesSketch): Array[Byte] = b.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    // heapify returns a read-only view for compact images; re-merge
    // into a writable heap sketch so update() keeps working
    val w = KllDoublesSketch.newHeapInstance(KllOps.K)
    w.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
    w
  }

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** `kll_merge_agg(sketch)` — union serialized KLL sketches (the
  * manifest-side merge: one row per shard in, one corpus sketch out).
  * NULL inputs are skipped — callers that must not silently drop a
  * legacy carry (a shard with rows but no sketch) gate on null BEFORE
  * aggregating, exactly like the HLL distinct door. */
case class KllMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"kll_merge_agg needs a BINARY sketch, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_merge_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(KllOps.K)

  override def update(b: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      b.merge(KllDoublesSketch.heapify(
        Memory.wrap(v.asInstanceOf[Array[Byte]])))
    b
  }

  override def merge(b: KllDoublesSketch, o: KllDoublesSketch): KllDoublesSketch = {
    b.merge(o); b
  }

  override def eval(b: KllDoublesSketch): Any = b.toByteArray

  override def serialize(b: KllDoublesSketch): Array[Byte] = b.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    val w = KllDoublesSketch.newHeapInstance(KllOps.K)
    w.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
    w
  }

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** `kll_quantile(sketch, rank)` — the value at normalized rank
  * `rank` ∈ [0,1] (INCLUSIVE search: the smallest value whose rank is
  * ≥ the target — DataSketches' default and the one matching SQL
  * percentile_disc). NULL on NULL sketch; throws on an EMPTY sketch
  * (an empty corpus has no quantiles — silence would fabricate one). */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"kll_quantile needs a BINARY sketch, got ${left.dataType.sql}")
    else if (right.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"kll_quantile needs a DOUBLE rank, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kll_quantile"

  override protected def nullSafeEval(sketch: Any, rank: Any): Any = {
    val r = rank.asInstanceOf[Double]
    require(r >= 0.0 && r <= 1.0, s"kll_quantile rank must be in [0,1], got $r")
    KllOps.quantile(sketch.asInstanceOf[Array[Byte]], r)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}

/** `kll_rank(sketch, value)` — the INVERSE of [[KllQuantile]]: the
  * normalized rank of `value` (fraction of sketched values ≤ it,
  * INCLUSIVE). The token-budget planning question — "what share of
  * documents fit in 512 chars" — as one manifest read when composed
  * with the TVF surface:
  * `SELECT kll_rank(kll_merge_agg(zkll_n_chars), 512.0)
  *    FROM shard_stats('<path>')`.
  * NULL on NULL sketch; throws on an EMPTY sketch, like the forward
  * door. */
case class KllRank(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"kll_rank needs a BINARY sketch, got ${left.dataType.sql}")
    else if (right.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"kll_rank needs a DOUBLE value, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kll_rank"

  override protected def nullSafeEval(sketch: Any, value: Any): Any =
    KllOps.rank(sketch.asInstanceOf[Array[Byte]],
      value.asInstanceOf[Double])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllRank =
    copy(left = newLeft, right = newRight)
}
