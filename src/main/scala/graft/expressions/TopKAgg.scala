package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k holder shared by the aggregate's buffer and the
  * algorithm's property tests: parallel arrays sorted best-first by
  * (score desc, id asc), `n` live entries, capacity `k`. Hot path:
  * constant-time reject against the current worst entry once full
  * (the common case on a large corpus), else one binary search +
  * `System.arraycopy` shift. Score order uses
  * `java.lang.Double.compare` — the same total order (NaN greatest,
  * so ranked first under desc) Spark's sort uses. Inserts are
  * associative+commutative across any grouping (PropertySpec), which
  * is what lets Spark run the aggregate map-side partial.
  */
final class TopKHeap(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  // (score desc, id asc) — true iff entry 1 outranks entry 2
  private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1 < i2)
  }

  def insert(score: Double, id: Long): Unit = {
    if (n == k && !better(score, id, scores(k - 1), ids(k - 1))) return
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (better(scores(mid), ids(mid), score, id)) lo = mid + 1 else hi = mid
    }
    val lastKept = math.min(n, k - 1) // entry at k-1 falls off when full
    System.arraycopy(scores, lo, scores, lo + 1, lastKept - lo)
    System.arraycopy(ids, lo, ids, lo + 1, lastKept - lo)
    scores(lo) = score
    ids(lo) = id
    if (n < k) n += 1
  }

  def mergeFrom(other: TopKHeap): Unit = {
    var i = 0
    while (i < other.n) { insert(other.scores(i), other.ids(i)); i += 1 }
  }
}

/** `top_k_by_score(score, id, k)` — the k best (id, score) structs by
  * (score desc, id asc), in rank order: the ANN tail aggregate as a
  * native `TypedImperativeAggregate`.
  *
  * Replaces the round-7 `Aggregator`+`udaf` wrapper on profiling
  * evidence (debt #7): JFR on 40M pairs showed 43% of the aggregate's
  * execution samples inside the udaf's `ExpressionEncoder` round trip
  * (InternalRow → boxed `(Double, Long)` → buffer case-class serde).
  * This form reads the input row directly (one `eval` per argument),
  * keeps the [[TopKHeap]] as a plain object in the aggregation map,
  * and serializes it as `[n][score,id]*` bytes (k·16 B) only at
  * spill/shuffle boundaries — same O(k)-through-the-shuffle
  * map-side-partial contract, same plan shape (ObjectHashAggregate),
  * ~2× the pairs/s.
  *
  * Null score or id rows are ignored: "no similarity" is not a
  * neighbor (the udaf needed a caller-side filter because its
  * primitive input encoder crashed on nulls; the native form makes
  * the same semantics total).
  */
case class TopKByScoreAgg(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with BinaryLike[Expression] {
  require(k > 0, s"top_k_by_score needs k > 0, got $k")

  override def left: Expression = scoreExpr
  override def right: Expression = idExpr
  // exact primitive types so a mistyped caller fails at ANALYSIS, not
  // as a per-task ClassCastException (same stance as BloomOps)
  override def checkInputDataTypes(): TypeCheckResult =
    if (scoreExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"top_k_by_score needs a DOUBLE score, got ${scoreExpr.dataType.sql}" +
          " — cast it")
    else if (idExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"top_k_by_score needs a BIGINT id, got ${idExpr.dataType.sql}" +
          " — cast it")
    else TypeCheckResult.TypeCheckSuccess
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "top_k_by_score"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(b: TopKHeap, input: InternalRow): TopKHeap = {
    val s = scoreExpr.eval(input)
    if (s != null) {
      val i = idExpr.eval(input)
      if (i != null) b.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    b
  }

  override def merge(b: TopKHeap, o: TopKHeap): TopKHeap = { b.mergeFrom(o); b }

  override def eval(b: TopKHeap): Any = {
    val out = new Array[Any](b.n)
    var i = 0
    while (i < b.n) { out(i) = InternalRow(b.ids(i), b.scores(i)); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(b: TopKHeap): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 16 * b.n)
    buf.putInt(b.n)
    var i = 0
    while (i < b.n) { buf.putDouble(b.scores(i)); buf.putLong(b.ids(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val buf = ByteBuffer.wrap(bytes)
    val b = new TopKHeap(k)
    val n = buf.getInt
    // entries arrive already rank-sorted, so inserts append in order
    var i = 0
    while (i < n) { b.insert(buf.getDouble, buf.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScoreAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScoreAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScoreAgg =
    copy(scoreExpr = newLeft, idExpr = newRight)
}
