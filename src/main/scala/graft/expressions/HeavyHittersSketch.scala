package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary (Misra & Gries 1982; merge rule
  * from Agarwal et al. 2013, "Mergeable Summaries" — public papers):
  * at most `k` counters; any item with true count > n/(k+1) is
  * guaranteed to hold a counter, and every retained counter is a lower
  * bound undercounting by at most n/(k+1).
  *
  * This is the CANDIDATE pass of the two-pass exact heavy-hitters
  * pattern ([[graft.operators.HeavyHitters]]): at 100 TB the token
  * vocabulary is billions of keys, so a plain `groupBy(token)` shuffles
  * the whole vocabulary to find the handful of frequent ones; this
  * summary carries at most k counters per map task through the shuffle
  * and the exact recount afterwards touches only the ≤k candidates.
  *
  * Buffer ops: a hit is one hash probe; a miss with spare capacity
  * inserts; a miss at capacity decrements every counter by one and
  * drops zeros — O(k) but amortized O(1) (each decrement is paid for by
  * a prior increment). Merge adds counters pointwise, then restores the
  * capacity bound by subtracting the (k+1)-th largest count from all
  * (the mergeable-summaries rule, which preserves the n/(k+1) error
  * bound across any merge tree — what lets Spark run this map-side
  * partial).
  *
  * Null items are skipped entirely (not counted in `n`): "no token" is
  * not a frequent token — same totality stance as [[TopKByScoreAgg]].
  */
final class MGSummary(val k: Int) {
  final class Counter(var n: Long)
  val counts = new java.util.HashMap[String, Counter](k * 2)
  var total: Long = 0L

  def add(item: String): Unit = {
    total += 1
    val c = counts.get(item)
    if (c != null) c.n += 1
    else if (counts.size < k) counts.put(item, new Counter(1))
    else {
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        e.getValue.n -= 1
        if (e.getValue.n == 0L) it.remove()
      }
    }
  }

  def addCount(item: String, n: Long): Unit = {
    val c = counts.get(item)
    if (c != null) c.n += n else counts.put(item, new Counter(n))
  }

  def mergeFrom(o: MGSummary): Unit = {
    total += o.total
    o.counts.forEach((w, c) => addCount(w, c.n))
    if (counts.size > k) {
      val vals = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next().n; i += 1 }
      java.util.Arrays.sort(vals)
      val m = vals(vals.length - k - 1) // (k+1)-th largest
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        e.getValue.n -= m
        if (e.getValue.n <= 0L) it.remove()
      }
    }
  }

  /** Entries as (item, lower-bound) sorted (lb desc, item asc) — a
    * deterministic order so the aggregate's output value is stable. */
  def sortedEntries: Array[(String, Long)] = {
    val out = new Array[(String, Long)](counts.size)
    var i = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); out(i) = (e.getKey, e.getValue.n); i += 1 }
    java.util.Arrays.sort(out, { (a: (String, Long), b: (String, Long)) =>
      val c = java.lang.Long.compare(b._2, a._2)
      if (c != 0) c else a._1.compareTo(b._1)
    })
    out
  }
}

/** `heavy_hitters_sketch(item, k)` — global/grouped aggregate returning
  * `struct<n: bigint, items: array<struct<item: string, lb: bigint>>>`:
  * the processed-row count and the ≤k Misra–Gries candidates with their
  * lower-bound counts, sorted (lb desc, item asc). Guarantee: `items`
  * is a superset of every item whose true count exceeds `n/(k+1)`.
  */
case class MisraGriesAgg(
    itemExpr: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGSummary] with UnaryLike[Expression] {
  require(k > 0 && k <= (1 << 20),
    s"heavy_hitters_sketch needs 0 < k <= 2^20, got $k")

  override def child: Expression = itemExpr
  override def checkInputDataTypes(): TypeCheckResult =
    if (itemExpr.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"heavy_hitters_sketch needs a STRING item, got " +
          s"${itemExpr.dataType.sql} — cast it")
    else TypeCheckResult.TypeCheckSuccess
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("items", ArrayType(
      StructType(Seq(
        StructField("item", StringType, nullable = false),
        StructField("lb", LongType, nullable = false))),
      containsNull = false), nullable = false)))
  override def prettyName: String = "heavy_hitters_sketch"

  override def createAggregationBuffer(): MGSummary = new MGSummary(k)

  override def update(b: MGSummary, input: InternalRow): MGSummary = {
    val v = itemExpr.eval(input)
    // UTF8String may alias a reused page buffer; toString copies
    if (v != null) b.add(v.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: MGSummary, o: MGSummary): MGSummary = {
    b.mergeFrom(o); b
  }

  override def eval(b: MGSummary): Any = {
    val entries = b.sortedEntries
    val arr = new Array[Any](entries.length)
    var i = 0
    while (i < entries.length) {
      arr(i) = InternalRow(UTF8String.fromString(entries(i)._1), entries(i)._2)
      i += 1
    }
    InternalRow(b.total, new GenericArrayData(arr))
  }

  override def serialize(b: MGSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(b.total)
    out.writeInt(b.counts.size)
    // explicit length+bytes (not writeUTF) so items >64 KiB round-trip
    b.counts.forEach { (w, c) =>
      val bytes = w.getBytes("UTF-8")
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c.n)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new MGSummary(k)
    b.total = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val wb = new Array[Byte](len)
      in.readFully(wb)
      b.addCount(new String(wb, "UTF-8"), in.readLong())
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(itemExpr = newChild)
}
